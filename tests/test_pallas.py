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
