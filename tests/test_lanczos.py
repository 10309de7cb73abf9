"""Batched Lanczos vs dense eigh oracle (the ARPACK-eigsh equivalent, M4b)."""
import jax
import jax.numpy as jnp
import numpy as np

from maus_tpu.ops.lanczos import lanczos_batched
from maus_tpu.problems import generators as gen


def test_lanczos_finds_dominant_eigenpairs():
    A_h = gen.hermitian_matrix(64, seed=0)
    A = jnp.asarray(A_h, jnp.complex128)
    rng = np.random.default_rng(1)
    V0 = jnp.asarray(rng.standard_normal((4, 64))
                     + 1j * rng.standard_normal((4, 64)))
    res = lanczos_batched(A, V0, k=6, m=40)
    w_true = np.linalg.eigvalsh(A_h)
    dominant = w_true[np.argsort(-np.abs(w_true))[:6]]
    for b in range(4):
        got = np.sort(np.asarray(res.eigenvalues[b]))
        want = np.sort(dominant)
        # extremal pairs converge to ~eps; the 6th pair is limited by the
        # Krylov dimension (ARPACK behaves the same at fixed m)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
        # Ritz residuals small for converged extremal pairs
        assert float(jnp.min(res.residuals[b])) < 1e-6


def test_lanczos_ritz_vectors_are_eigenvectors():
    A_h = gen.hermitian_matrix(32, seed=2)
    A = jnp.asarray(A_h, jnp.complex128)
    rng = np.random.default_rng(3)
    V0 = jnp.asarray(rng.standard_normal((2, 32))
                     + 1j * rng.standard_normal((2, 32)))
    res = lanczos_batched(A, V0, k=4, m=32)   # full subspace: exact
    for b in range(2):
        for i in range(4):
            y = np.asarray(res.eigenvectors[b, i])
            th = float(np.asarray(res.eigenvalues[b, i]))
            assert np.linalg.norm(A_h @ y - th * y) < 1e-5
