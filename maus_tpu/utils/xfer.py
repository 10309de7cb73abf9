"""Host↔device transfer shims for complex arrays.

Probed property of this TPU runtime: complex64 arrays cannot cross the host
boundary in either direction (``device_put`` and readback both raise
UNIMPLEMENTED), while complex arithmetic ON device works fine. Every complex
transfer therefore moves as separate real/imag float planes and is
combined/split by a tiny jitted program on the device side.

On the CPU backend these shims degrade to plain ``jnp.asarray``/``np.asarray``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _needs_split() -> bool:
    return jax.default_backend() != "cpu"


@functools.partial(jax.jit, static_argnames=())
def _combine(re: jax.Array, im: jax.Array) -> jax.Array:
    return jax.lax.complex(re, im)


@jax.jit
def _split(z: jax.Array) -> tuple[jax.Array, jax.Array]:
    return z.real, z.imag


def to_device_complex(x_host, dtype) -> jax.Array:
    """Move a host (possibly complex) array to the default device in ``dtype``."""
    dtype = jnp.dtype(dtype)
    x_host = np.asarray(x_host)
    if not jnp.issubdtype(dtype, jnp.complexfloating) or not _needs_split():
        return jnp.asarray(x_host, dtype)
    rdt = np.float32 if dtype == jnp.complex64 else np.float64
    re = jnp.asarray(np.ascontiguousarray(x_host.real, rdt))
    im = jnp.asarray(np.ascontiguousarray(x_host.imag, rdt))
    return _combine(re, im).astype(dtype)


def to_host_complex(x_dev) -> np.ndarray:
    """Read back a device array (complex-safe) as numpy."""
    if not jnp.issubdtype(x_dev.dtype, jnp.complexfloating) or not _needs_split():
        return np.asarray(x_dev)
    re, im = _split(x_dev)
    re_h = np.asarray(re)
    im_h = np.asarray(im)
    cdt = np.complex64 if re_h.dtype == np.float32 else np.complex128
    out = np.empty(re_h.shape, cdt)
    out.real = re_h
    out.imag = im_h
    return out
