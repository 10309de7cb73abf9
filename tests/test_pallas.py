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


# The two from-scratch Pallas batched-LU kernels (unblocked + panel-blocked)
# were measured losing to XLA's batched LU at production shapes and live as
# runnable evidence in benchmarks/parked/ (each carries a __main__ self-check
# in interpret mode); their production role is covered by the XLA LU path
# tested throughout this suite.


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
