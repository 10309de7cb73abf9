"""Distributed (column-sharded) SVD on the 8-device CPU mesh — the SVD-path
counterpart of test_dist_qr.py / test_dist_hessenberg.py (STATUS.md round-2
gap: "Distributed SVD not yet built").

Checks: Ritz σ against the LAPACK spectrum, two-sided triplet residuals
(M4g, AMS:301) against the dense operand, rectangular operands both ways,
sharded-equals-single-device, and the ``maus_tpu.svd(mesh=)`` router.
"""
import numpy as np
import pytest

import jax

import maus_tpu
from maus_tpu.parallel import mesh as mesh_mod
from maus_tpu.parallel.dist_svd import svd_distributed

M_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < M_DEV:
        pytest.skip("needs 8 devices")
    return mesh_mod.make_mesh(replica=1, model=M_DEV)


def _low_rank(m, n, s_true, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    r = len(s_true)
    U0, _ = np.linalg.qr(rng.standard_normal((m, r)) +
                         1j * rng.standard_normal((m, r)))
    V0, _ = np.linalg.qr(rng.standard_normal((n, r)) +
                         1j * rng.standard_normal((n, r)))
    A = (U0 * np.asarray(s_true)) @ V0.conj().T
    if noise:
        A = A + noise * rng.standard_normal((m, n))
    return A


def test_sigma_matches_lapack(mesh):
    s_true = [5.0, 2.5, 1.2, 0.6, 0.3]
    A = _low_rank(96, 64, s_true, seed=0, noise=1e-9)
    sig, U, V, res = svd_distributed(mesh, A, num_candidates=6,
                                     iterations=40, seed=1)
    sv = np.linalg.svd(A, compute_uv=False)[:6]
    assert np.max(np.abs(sig - sv)) < 1e-8
    assert np.all(res[:5] < 1e-10)


def test_triplet_residuals_two_sided(mesh):
    A = _low_rank(96, 64, [5.0, 2.5, 1.2, 0.6, 0.3], seed=0, noise=1e-9)
    sig, U, V, res = svd_distributed(mesh, A, num_candidates=5,
                                     iterations=40, seed=1)
    for i in range(5):
        r = (np.linalg.norm(A @ V[i] - sig[i] * U[:, i]) +
             np.linalg.norm(A.conj().T @ U[:, i] - sig[i] * V[i]))
        assert r < 1e-10
        # reported residual is the same two-sided quantity
        assert abs(r - res[i]) < 1e-10


def test_wide_operand(mesh):
    # M < N (the reference's 5×4 scenario orientation transposed)
    A = _low_rank(48, 96, [3.0, 1.0, 0.25], seed=3, noise=1e-10)
    sig, U, V, res = svd_distributed(mesh, A, num_candidates=3,
                                     iterations=40, seed=2)
    assert np.allclose(sig, [3.0, 1.0, 0.25], atol=1e-8)
    assert np.all(res < 1e-9)


def test_matches_single_device(mesh):
    A = _low_rank(64, 64, [4.0, 2.0, 1.0, 0.5], seed=5, noise=1e-3)
    sig, _, _, _ = svd_distributed(mesh, A, num_candidates=4,
                                   iterations=40, seed=3)
    mesh1 = mesh_mod.make_mesh(replica=1, model=1)
    sig1, _, _, _ = svd_distributed(mesh1, A, num_candidates=4,
                                    iterations=40, seed=3)
    assert np.max(np.abs(sig - sig1)) < 1e-10


def test_nondivisible_n_raises(mesh):
    A = _low_rank(32, 60, [1.0], seed=1)
    with pytest.raises(ValueError, match="divide"):
        svd_distributed(mesh, A, num_candidates=2, iterations=5)


def test_api_mesh_router(mesh):
    s_true = [5.0, 2.5, 1e-9]
    A = _low_rank(96, 64, s_true, seed=7, noise=1e-10)
    rep = maus_tpu.svd(A, tol=1e-6, mesh=mesh, seed=0)
    assert rep.num_distinct >= 2
    assert rep.converged          # rank-2 detected, both triplets found
    assert rep.knowledge.effective_rank == 2
    sigmas = sorted((s[0] for s in rep.solutions), reverse=True)
    assert abs(sigmas[0] - 5.0) < 1e-6 and abs(sigmas[1] - 2.5) < 1e-6
    for (s, u, v), r in zip(rep.solutions, rep.residuals):
        assert (np.linalg.norm(A @ v - s * u) +
                np.linalg.norm(A.conj().T @ u - s * v)) < 1e-6
