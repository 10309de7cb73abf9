"""Pallas batched LU with partial pivoting (split-plane complex).

Target: the eigenproblem path's K independent shifted factorizations
``(A − λ_k I + Ψ_k D)`` (ops/batched_solve.batched_shifted_solve) where each
matrix is small enough to live entirely in VMEM — exactly the regime where XLA's
generic batched LU underperforms (dispatch + HBM round-trips per step).

Design: one grid program per batch element; the whole matrix is factorized
in-place in VMEM by a ``fori_loop`` over columns:

* pivot search  — masked |·|² argmax down the current column;
* row swap      — two dynamic-row reads + writes (records the pivot index);
* elimination   — masked complex divide of the subdiagonal column;
* rank-1 update — full-matrix masked outer-product subtraction (VPU), avoiding
  dynamic-shape slicing entirely.

Complex arithmetic runs on separate re/im f32 planes (complex dtypes don't exist
inside Pallas TPU kernels). The result layout matches
``jax.scipy.linalg.lu_factor``: packed LU and a pivot row-index vector, so
``lu_solve`` consumes it unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lu_kernel(n: int):
    def kernel(ar_ref, ai_ref, outr_ref, outi_ref, piv_ref):
        outr_ref[:] = ar_ref[:]
        outi_ref[:] = ai_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

        def col_step(k, _):
            Mr = outr_ref[:]
            Mi = outi_ref[:]
            colr = jax.lax.dynamic_slice(Mr, (0, k), (n, 1))     # (n, 1)
            coli = jax.lax.dynamic_slice(Mi, (0, k), (n, 1))
            mag = colr * colr + coli * coli
            mag = jnp.where(rows >= k, mag, -1.0)
            p = jnp.argmax(mag[:, 0])
            piv_ref[0, k] = p.astype(jnp.int32)

            # swap rows k and p (no-op when p == k)
            row_k_r = outr_ref[pl.ds(k, 1), :]
            row_k_i = outi_ref[pl.ds(k, 1), :]
            row_p_r = outr_ref[pl.ds(p, 1), :]
            row_p_i = outi_ref[pl.ds(p, 1), :]
            outr_ref[pl.ds(k, 1), :] = row_p_r
            outi_ref[pl.ds(k, 1), :] = row_p_i
            outr_ref[pl.ds(p, 1), :] = row_k_r
            outi_ref[pl.ds(p, 1), :] = row_k_i

            Mr = outr_ref[:]
            Mi = outi_ref[:]
            # pivot value (scalar reads via dynamic slice)
            pv_r = jax.lax.dynamic_slice(Mr, (k, k), (1, 1))[0, 0]
            pv_i = jax.lax.dynamic_slice(Mi, (k, k), (1, 1))[0, 0]
            den = pv_r * pv_r + pv_i * pv_i
            den = jnp.where(den > 0.0, den, 1.0)                 # singular guard

            colr = jax.lax.dynamic_slice(Mr, (0, k), (n, 1))
            coli = jax.lax.dynamic_slice(Mi, (0, k), (n, 1))
            below = rows > k
            # factor = col / pivot  (complex divide on planes)
            fr = jnp.where(below, (colr * pv_r + coli * pv_i) / den, 0.0)
            fi = jnp.where(below, (coli * pv_r - colr * pv_i) / den, 0.0)

            # store multipliers into column k (keep rows ≤ k unchanged)
            outr_ref[:, pl.ds(k, 1)] = jnp.where(below, fr, colr)
            outi_ref[:, pl.ds(k, 1)] = jnp.where(below, fi, coli)

            # trailing rank-1 update on columns > k: A -= f ⊗ row_k
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            right = cols > k
            ur = jnp.where(right, jax.lax.dynamic_slice(Mr, (k, 0), (1, n)), 0.0)
            ui = jnp.where(right, jax.lax.dynamic_slice(Mi, (k, 0), (1, n)), 0.0)
            outr_ref[:] = outr_ref[:] - (fr * ur - fi * ui)
            outi_ref[:] = outi_ref[:] - (fr * ui + fi * ur)
            return 0

        jax.lax.fori_loop(0, n, col_step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def lu_factor_batched(A: jax.Array, *, interpret: bool = False):
    """Batched packed-LU with partial pivoting of ``A: (K, N, N)`` complex64.

    Returns ``(lu, piv)`` with the ``jax.scipy.linalg.lu_factor`` contract, so
    ``jax.vmap(lambda l, p, b: jsla.lu_solve((l, p), b))`` works directly.
    """
    if A.ndim != 3 or A.shape[1] != A.shape[2]:
        raise ValueError(f"expected (K, N, N), got {A.shape}")
    K, n, _ = A.shape
    ar = A.real.astype(jnp.float32)
    ai = A.imag.astype(jnp.float32)

    kernel = _lu_kernel(n)
    outr, outi, piv = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((None, n, n), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, n), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, n, n), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, n), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, n), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, n, n), jnp.float32),
            jax.ShapeDtypeStruct((K, n, n), jnp.float32),
            jax.ShapeDtypeStruct((K, 1, n), jnp.int32),
        ],
        interpret=interpret,
    )(ar, ai)
    lu = jax.lax.complex(outr, outi).astype(A.dtype)
    return lu, piv[:, 0, :]
