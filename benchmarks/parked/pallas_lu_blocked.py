"""Panel-blocked Pallas batched LU with partial pivoting (split-plane complex).

The unblocked kernel (benchmarks/parked/pallas_lu.py) is numerically right but VPU-bound:
Mosaic forbids *unaligned* dynamic column access, so every column step paid
O(n²) masked passes. Probing shows what IS legal on this hardware: dynamic
single-row reads/writes, dynamic 8-aligned row blocks, and **128-aligned dynamic
column panels**. That is exactly the shape of classic blocked right-looking LU:

for each 128-column panel (aligned slice → legal):
  1. factor the (n, 128) panel with partial pivoting — per-column work is
     masked ops on the panel only (O(n·128) per column, not O(n²));
     row swaps hit the full matrix via (legal) dynamic row ops;
  2. U₁₂ ← L₁₁⁻¹ · A[s:e, e:]  — unit-lower triangular solve on the 128-row
     block (masked rank-1 updates on a (128, n) value);
  3. trailing update A −= L₂₁ · U₁₂ — the O(n³) bulk as MXU dots (full-width
     with masked operands; ~1.5× minimal flops, MXU-fast).

Layout contract matches ``jax.scipy.linalg.lu_factor`` (packed LU + pivot rows).
Requires n % 128 == 0 (the wrapper falls back to XLA otherwise).

Measured on v5e vs XLA's batched LU (residuals identical): **1.23× at
(K=16, n=128)**, 0.67× at n=256, 0.56× at n=512, VMEM-OOM at n=1024 (whole
matrix per program: 4·n²·4B > 16 MB). The remaining cost is the per-column
sequential VPU chain (pivot search + full-matrix dynamic-row swaps); the next
step would defer row swaps panel-locally and double-buffer panels from HBM.
Production paths use XLA's LU; this kernel is the from-scratch reference and
the small-n winner.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128  # panel width == TPU lane tile


def _blocked_lu_kernel(n: int):
    nb = n // B

    def kernel(ar_ref, ai_ref, outr_ref, outi_ref, piv_ref):
        outr_ref[:] = ar_ref[:]
        outi_ref[:] = ai_ref[:]
        rows_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        pcols = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)   # 0..B-1
        rows_b = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        cols_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        def panel_step(p, _):
            s = pl.multiple_of(p * B, B)

            # ---- 1) factor the panel (carried as values) ----
            Pr0 = outr_ref[:, pl.ds(s, B)]
            Pi0 = outi_ref[:, pl.ds(s, B)]

            def col_step(kk, carry):
                Pr, Pi = carry
                k = s + kk
                cmask = pcols == kk                                # (1, B)
                colr = jnp.sum(jnp.where(cmask, Pr, 0.0), axis=1, keepdims=True)
                coli = jnp.sum(jnp.where(cmask, Pi, 0.0), axis=1, keepdims=True)
                mag = jnp.where(rows_n >= k, colr * colr + coli * coli, -1.0)
                piv = jnp.argmax(mag[:, 0]).astype(jnp.int32)
                piv_ref[0, k] = piv

                # swap rows k ↔ piv: masked on the panel carry ...
                rmk = rows_n == k
                rmp = rows_n == piv
                rk_r = jnp.sum(jnp.where(rmk, Pr, 0.0), axis=0, keepdims=True)
                rk_i = jnp.sum(jnp.where(rmk, Pi, 0.0), axis=0, keepdims=True)
                rp_r = jnp.sum(jnp.where(rmp, Pr, 0.0), axis=0, keepdims=True)
                rp_i = jnp.sum(jnp.where(rmp, Pi, 0.0), axis=0, keepdims=True)
                Pr = Pr + rmk * (rp_r - rk_r) + rmp * (rk_r - rp_r)
                Pi = Pi + rmk * (rp_i - rk_i) + rmp * (rk_i - rp_i)
                # ... and via dynamic row ops on the full matrix (panel columns
                # there are stale; overwritten at write-back)
                row_k_r = outr_ref[pl.ds(k, 1), :]
                row_k_i = outi_ref[pl.ds(k, 1), :]
                row_p_r = outr_ref[pl.ds(piv, 1), :]
                row_p_i = outi_ref[pl.ds(piv, 1), :]
                outr_ref[pl.ds(k, 1), :] = row_p_r
                outi_ref[pl.ds(k, 1), :] = row_p_i
                outr_ref[pl.ds(piv, 1), :] = row_k_r
                outi_ref[pl.ds(piv, 1), :] = row_k_i

                # eliminate below the pivot (panel only)
                colr = jnp.sum(jnp.where(cmask, Pr, 0.0), axis=1, keepdims=True)
                coli = jnp.sum(jnp.where(cmask, Pi, 0.0), axis=1, keepdims=True)
                pv_r = jnp.sum(jnp.where(rows_n == k, colr, 0.0))
                pv_i = jnp.sum(jnp.where(rows_n == k, coli, 0.0))
                den = pv_r * pv_r + pv_i * pv_i
                den = jnp.where(den > 0.0, den, 1.0)
                below = rows_n > k
                fr = jnp.where(below, (colr * pv_r + coli * pv_i) / den, 0.0)
                fi = jnp.where(below, (coli * pv_r - colr * pv_i) / den, 0.0)
                Pr = jnp.where(cmask & below, fr, Pr)
                Pi = jnp.where(cmask & below, fi, Pi)
                # panel-internal rank-1 update (columns kk+1..B-1)
                right = pcols > kk
                ur = jnp.where(right & (rows_n == k), Pr, 0.0).sum(
                    axis=0, keepdims=True)
                ui = jnp.where(right & (rows_n == k), Pi, 0.0).sum(
                    axis=0, keepdims=True)
                Pr = Pr - (fr * ur - fi * ui)
                Pi = Pi - (fr * ui + fi * ur)
                return Pr, Pi

            Pr, Pi = jax.lax.fori_loop(0, B, col_step, (Pr0, Pi0))
            outr_ref[:, pl.ds(s, B)] = Pr
            outi_ref[:, pl.ds(s, B)] = Pi

            # ---- 2) U₁₂ ← L₁₁⁻¹ A[s:e, e:] (unit-lower solve, masked) ----
            # operate on the full 128-row band; columns ≤ e-1 are masked out of
            # the update so the band's panel part stays intact
            l11_r = outr_ref[pl.ds(s, B), pl.ds(s, B)]           # (B, B)
            l11_i = outi_ref[pl.ds(s, B), pl.ds(s, B)]
            Rr0 = outr_ref[pl.ds(s, B), :]                       # (B, n)
            Ri0 = outi_ref[pl.ds(s, B), :]
            trail = cols_n >= s + B                              # (1, n)

            def tri_step(j, carry):
                Rr, Ri = carry
                jmask = rows_b == j                              # (B, 1)
                uj_r = jnp.sum(jnp.where(jmask, Rr, 0.0), axis=0, keepdims=True)
                uj_i = jnp.sum(jnp.where(jmask, Ri, 0.0), axis=0, keepdims=True)
                ljmask = pcols == j                              # (1, B)
                lj_r = jnp.sum(jnp.where(ljmask, l11_r, 0.0), axis=1,
                               keepdims=True)                    # (B, 1)
                lj_i = jnp.sum(jnp.where(ljmask, l11_i, 0.0), axis=1,
                               keepdims=True)
                lower = rows_b > j
                lj_r = jnp.where(lower, lj_r, 0.0)
                lj_i = jnp.where(lower, lj_i, 0.0)
                upd_r = lj_r * uj_r - lj_i * uj_i
                upd_i = lj_r * uj_i + lj_i * uj_r
                Rr = Rr - jnp.where(trail, upd_r, 0.0)
                Ri = Ri - jnp.where(trail, upd_i, 0.0)
                return Rr, Ri

            Rr, Ri = jax.lax.fori_loop(0, B, tri_step, (Rr0, Ri0))
            outr_ref[pl.ds(s, B), :] = Rr
            outi_ref[pl.ds(s, B), :] = Ri

            # ---- 3) trailing update A −= L₂₁ · U₁₂ (MXU) ----
            Lr = jnp.where(rows_n > s + B - 1, Pr, 0.0)          # (n, B) strict L₂₁
            Li = jnp.where(rows_n > s + B - 1, Pi, 0.0)
            Ur = jnp.where(trail, Rr, 0.0)                       # (B, n)
            Ui = jnp.where(trail, Ri, 0.0)
            hi = jax.lax.Precision.HIGHEST
            prr = jnp.dot(Lr, Ur, preferred_element_type=jnp.float32,
                          precision=hi)
            pii = jnp.dot(Li, Ui, preferred_element_type=jnp.float32,
                          precision=hi)
            pmix = jnp.dot(Lr + Li, Ur + Ui,
                           preferred_element_type=jnp.float32, precision=hi)
            outr_ref[:] = outr_ref[:] - (prr - pii)
            outi_ref[:] = outi_ref[:] - (pmix - prr - pii)
            return 0

        jax.lax.fori_loop(0, nb, panel_step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def lu_factor_batched_blocked(A: jax.Array, *, interpret: bool = False):
    """Blocked batched LU of ``A: (K, N, N)`` complex64, N % 128 == 0.

    Same contract as ``jax.scipy.linalg.lu_factor`` (packed LU + pivot rows).
    """
    if A.ndim != 3 or A.shape[1] != A.shape[2]:
        raise ValueError(f"expected (K, N, N), got {A.shape}")
    K, n, _ = A.shape
    if n % B != 0:
        raise ValueError(f"blocked LU requires N % {B} == 0, got {n}")
    ar = A.real.astype(jnp.float32)
    ai = A.imag.astype(jnp.float32)
    outr, outi, piv = pl.pallas_call(
        _blocked_lu_kernel(n),
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
    # self-check (interpret mode, CPU-safe): solve-oracle residuals + the
    # 128-alignment rejection contract
    import numpy as np
    import jax.scipy.linalg as jsla

    rng = np.random.default_rng(3)
    K, n = 2, 256
    A = (rng.standard_normal((K, n, n)) + 1j * rng.standard_normal((K, n, n))
         ).astype(np.complex64) + 4 * np.eye(n, dtype=np.complex64)
    lu, piv = lu_factor_batched_blocked(jnp.asarray(A), interpret=True)
    b = (rng.standard_normal((K, n)) + 1j * rng.standard_normal((K, n))
         ).astype(np.complex64)
    x = jax.vmap(lambda l, p, bb: jsla.lu_solve((l, p), bb))(
        lu, piv, jnp.asarray(b))
    for k in range(K):
        r = np.linalg.norm(A[k] @ np.asarray(x[k]) - b[k]) / np.linalg.norm(b[k])
        assert r < 1e-4, r
    try:
        lu_factor_batched_blocked(jnp.zeros((1, 100, 100), jnp.complex64),
                                  interpret=True)
    except ValueError as e:
        assert "128" in str(e)
    else:
        raise AssertionError("unaligned shape not rejected")
    print("pallas_lu_blocked self-check: ok")
