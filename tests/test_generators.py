"""Property tests for the fixture generator families (M6, AMS:611-639)."""
import numpy as np

from maus_tpu.problems import generators as gen


def test_hilbert():
    H = gen.hilbert(4)
    assert np.isclose(H[0, 0], 1.0) and np.isclose(H[1, 2], 0.25)
    assert np.allclose(H, H.T)


def test_dynamic_system_shapes_and_structure():
    A, b = gen.dynamic_solve_system(5, t_step=3)
    assert A.shape == (5, 5) and b.shape == (5,)
    assert A.dtype == np.complex128
    # diagonal boost present
    assert np.all(np.abs(np.diag(A).real) > 0.4)


def test_laplace_like_hermitian_flag():
    A = gen.laplace_like_complex(8, make_hermitian=True)
    assert np.allclose(A, A.conj().T)
    B = gen.laplace_like_complex(8, make_hermitian=False)
    assert not np.allclose(B, B.conj().T)
    # stencil structure: −2 diagonal dominates
    assert np.all(np.abs(np.diag(B).real + 2) < 0.2)


def test_low_rank_spectrum():
    A = gen.low_rank_svd_matrix(12, 6, target_rank=2, seed=0)
    s = np.linalg.svd(A, compute_uv=False)
    assert abs(s[0] - 5.0) < 0.01 and abs(s[1] - 2.5) < 0.01
    assert np.all(s[2:] < 1e-2)


def test_ill_conditioned_controlled_kappa():
    A, _ = gen.ill_conditioned_system(64, cond=1e5, seed=0)
    s = np.linalg.svd(A, compute_uv=False)
    kappa = s[0] / s[-1]
    assert 3e4 < kappa < 3e5


def test_well_conditioned_kappa():
    A, _ = gen.well_conditioned_system(64, seed=0)
    assert np.linalg.cond(A) < 100


def test_generators_deterministic():
    A1, b1 = gen.dynamic_solve_system(5, t_step=3, seed=7)
    A2, b2 = gen.dynamic_solve_system(5, t_step=3, seed=7)
    np.testing.assert_array_equal(A1, A2)
    np.testing.assert_array_equal(b1, b2)
