"""Pallas batched LU with partial pivoting (split-plane complex).

Target: the eigenproblem path's K independent shifted factorizations
``(A − λ_k I + Ψ_k D)`` (ops/batched_solve.batched_shifted_solve) where each
matrix is small enough to live entirely in VMEM — exactly the regime where XLA's
generic batched LU underperforms (dispatch + HBM round-trips per step).

Status (measured on v5e, K=16-32, n=128-512): numerically correct on hardware
(residuals match XLA's batched LU) but 0.5-0.9× its speed — the Mosaic
constraint that forbids dynamic row/column slicing forces ~6 full-matrix masked
VPU passes per column, i.e. O(6n³) VPU work where XLA blocks onto the MXU. The
path to a win is the classic panel split (unblocked 128-column panels + MXU
rank-128 trailing updates); until then the solver's hot paths keep XLA's LU and
this kernel stands as the from-scratch reference implementation.

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
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        def col_step(k, _):
            # Mosaic cannot lower dynamic single-row/column slices (lane/sublane
            # alignment), so every access is a masked full-matrix VPU op — the
            # matrix is VMEM-resident, so these passes are cheap.
            Mr = outr_ref[:]
            Mi = outi_ref[:]
            colmask = cols == k                                   # (1, n)
            rowmask_k = rows == k                                 # (n, 1)

            colr = jnp.sum(jnp.where(colmask, Mr, 0.0), axis=1, keepdims=True)
            coli = jnp.sum(jnp.where(colmask, Mi, 0.0), axis=1, keepdims=True)
            mag = colr * colr + coli * coli
            mag = jnp.where(rows >= k, mag, -1.0)
            p = jnp.argmax(mag[:, 0]).astype(jnp.int32)
            piv_ref[0, k] = p

            # masked row swap k ↔ p
            rowmask_p = rows == p
            rowk_r = jnp.sum(jnp.where(rowmask_k, Mr, 0.0), axis=0, keepdims=True)
            rowk_i = jnp.sum(jnp.where(rowmask_k, Mi, 0.0), axis=0, keepdims=True)
            rowp_r = jnp.sum(jnp.where(rowmask_p, Mr, 0.0), axis=0, keepdims=True)
            rowp_i = jnp.sum(jnp.where(rowmask_p, Mi, 0.0), axis=0, keepdims=True)
            Mr = Mr + rowmask_k * (rowp_r - rowk_r) + rowmask_p * (rowk_r - rowp_r)
            Mi = Mi + rowmask_k * (rowp_i - rowk_i) + rowmask_p * (rowk_i - rowp_i)

            # post-swap pivot column and pivot value
            colr = jnp.sum(jnp.where(colmask, Mr, 0.0), axis=1, keepdims=True)
            coli = jnp.sum(jnp.where(colmask, Mi, 0.0), axis=1, keepdims=True)
            pv_r = jnp.sum(jnp.where(rowmask_k, colr, 0.0))
            pv_i = jnp.sum(jnp.where(rowmask_k, coli, 0.0))
            den = pv_r * pv_r + pv_i * pv_i
            den = jnp.where(den > 0.0, den, 1.0)                  # singular guard

            below = rows > k
            fr = jnp.where(below, (colr * pv_r + coli * pv_i) / den, 0.0)
            fi = jnp.where(below, (coli * pv_r - colr * pv_i) / den, 0.0)

            # write multipliers into column k (rows ≤ k keep their values)
            Mr = jnp.where(colmask & below, fr, Mr)
            Mi = jnp.where(colmask & below, fi, Mi)

            # trailing rank-1 update on columns > k: A -= f ⊗ row_k
            # (row k after the swap is the old row p, already extracted)
            right = cols > k
            ur = jnp.where(right, rowp_r, 0.0)
            ui = jnp.where(right, rowp_i, 0.0)
            outr_ref[:] = Mr - (fr * ur - fi * ui)
            outi_ref[:] = Mi - (fr * ui + fi * ur)
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


if __name__ == "__main__":
    # this environment pre-registers a TPU backend; the self-check must
    # run on CPU (env vars are read too early — post-import config only)
    jax.config.update("jax_platforms", "cpu")
    # self-check (interpret mode, CPU-safe): scipy lu_solve contract + a
    # pivot-requiring zero leading diagonal
    import numpy as np
    import jax.scipy.linalg as jsla

    rng = np.random.default_rng(0)
    K, n = 3, 16
    A = (rng.standard_normal((K, n, n)) + 1j * rng.standard_normal((K, n, n))
         ).astype(np.complex64) + 2 * np.eye(n, dtype=np.complex64)
    lu, piv = lu_factor_batched(jnp.asarray(A), interpret=True)
    b = (rng.standard_normal((K, n)) + 1j * rng.standard_normal((K, n))
         ).astype(np.complex64)
    x = jax.vmap(lambda l, p, bb: jsla.lu_solve((l, p), bb))(
        lu, piv, jnp.asarray(b))
    for k in range(K):
        r = np.linalg.norm(A[k] @ np.asarray(x[k]) - b[k]) / np.linalg.norm(b[k])
        assert r < 5e-5, r
    A0 = np.array([[[0.0, 1.0], [1.0, 0.0]]], np.complex64)
    lu, piv = lu_factor_batched(jnp.asarray(A0), interpret=True)
    x = jax.vmap(lambda l, p, bb: jsla.lu_solve((l, p), bb))(
        lu, piv, jnp.asarray(np.array([[1.0, 2.0]], np.complex64)))
    np.testing.assert_allclose(np.asarray(x[0]), [2.0, 1.0], atol=1e-6)
    print("pallas_lu self-check: ok")
