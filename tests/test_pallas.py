"""Pallas kernel tests (interpreter mode on CPU; real-hardware runs happen in
the bench harness)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maus_tpu.ops.pallas.cgemm import cgemm


def _rand_c64(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)) \
        .astype(np.complex64)


@pytest.mark.parametrize("m,k,n", [(8, 128, 128), (16, 256, 64), (100, 130, 50)])
def test_cgemm_matches_xla(m, k, n):
    rng = np.random.default_rng(0)
    a = _rand_c64(rng, m, k)
    b = _rand_c64(rng, k, n)
    got = cgemm(jnp.asarray(a), jnp.asarray(b), bm=8, bn=128, bk=128,
                interpret=True)
    want = a @ b
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_cgemm_bad_shapes():
    a = jnp.zeros((4, 5), jnp.complex64)
    b = jnp.zeros((6, 4), jnp.complex64)
    with pytest.raises(ValueError, match="bad shapes"):
        cgemm(a, b, interpret=True)


class TestPallasLU:
    def test_lu_matches_scipy_contract(self):
        import jax.scipy.linalg as jsla
        from maus_tpu.ops.pallas.lu import lu_factor_batched
        rng = np.random.default_rng(0)
        K, n = 3, 16
        A = _rand_c64(rng, K, n, n) + 2 * np.eye(n, dtype=np.complex64)
        lu, piv = lu_factor_batched(jnp.asarray(A), interpret=True)
        b = _rand_c64(rng, K, n)
        x = jax.vmap(lambda l, p, bb: jsla.lu_solve((l, p), bb))(
            lu, piv, jnp.asarray(b))
        for k in range(K):
            resid = np.linalg.norm(A[k] @ np.asarray(x[k]) - b[k]) \
                / np.linalg.norm(b[k])
            assert resid < 5e-5, resid

    def test_lu_pivoting_handles_zero_leading_diagonal(self):
        import jax.scipy.linalg as jsla
        from maus_tpu.ops.pallas.lu import lu_factor_batched
        A = np.array([[[0.0, 1.0], [1.0, 0.0]]], np.complex64)  # needs pivoting
        lu, piv = lu_factor_batched(jnp.asarray(A), interpret=True)
        b = jnp.asarray(np.array([[1.0, 2.0]], np.complex64))
        x = jax.vmap(lambda l, p, bb: jsla.lu_solve((l, p), bb))(lu, piv, b)
        np.testing.assert_allclose(np.asarray(x[0]), [2.0, 1.0], atol=1e-6)


class TestPallasBlockedLU:
    def test_blocked_lu_matches_solve_oracle(self):
        import jax.scipy.linalg as jsla
        from maus_tpu.ops.pallas.lu_blocked import lu_factor_batched_blocked
        rng = np.random.default_rng(3)
        K, n = 2, 256
        A = _rand_c64(rng, K, n, n) + 4 * np.eye(n, dtype=np.complex64)
        lu, piv = lu_factor_batched_blocked(jnp.asarray(A), interpret=True)
        b = _rand_c64(rng, K, n)
        x = jax.vmap(lambda l, p, bb: jsla.lu_solve((l, p), bb))(
            lu, piv, jnp.asarray(b))
        for k in range(K):
            resid = np.linalg.norm(A[k] @ np.asarray(x[k]) - b[k]) \
                / np.linalg.norm(b[k])
            assert resid < 1e-4, resid

    def test_blocked_lu_rejects_unaligned(self):
        from maus_tpu.ops.pallas.lu_blocked import lu_factor_batched_blocked
        with pytest.raises(ValueError, match="128"):
            lu_factor_batched_blocked(jnp.zeros((1, 100, 100), jnp.complex64),
                                      interpret=True)


class TestPallasHessSolve:
    def test_matches_oracle_on_reduced_h(self):
        """Batched shifted-Hessenberg Givens solve (interpret mode) against the
        dense oracle, on an H from a real reduction (random triangular test
        matrices are exponentially ill-conditioned — useless as fixtures)."""
        import numpy as np
        import jax.numpy as jnp

        from maus_tpu.ops.hessenberg import reduce_hessenberg
        from maus_tpu.ops.pallas.hess_solve import hess_solve_batched_pallas

        rng = np.random.default_rng(0)
        n, k = 128, 16
        A = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
        H = np.asarray(reduce_hessenberg(jnp.asarray(A, jnp.complex128)).h)
        lams = (rng.standard_normal(k) + 1j * rng.standard_normal(k)) * 0.3
        B = rng.standard_normal((k, n)) + 1j * rng.standard_normal((k, n))
        W = np.asarray(hess_solve_batched_pallas(
            jnp.asarray(H, jnp.complex64), jnp.asarray(-lams, jnp.complex64),
            jnp.asarray(B, jnp.complex64), interpret=True))
        for lam, w, b in zip(lams, W, B):
            r = np.linalg.norm((H - lam * np.eye(n)) @ w - b) \
                / np.linalg.norm(b)
            assert r < 5e-5
