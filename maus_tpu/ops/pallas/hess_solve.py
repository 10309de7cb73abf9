"""Pallas batched shifted-Hessenberg solve kernel.

Computes ``(H − λ_k I + ψ_k I) w_k = b_k`` for K candidates against a SHARED
upper-Hessenberg H — the eig hot path's inner kernel (see ops/hessenberg.py
for why Hessenberg replaces batched LU entirely).

Why Pallas: the pure-JAX version runs the Givens sweep as a ``lax.scan`` whose
~2N steps each launch a fused op over the (K, N, N) carry — measured 1.6 ms at
K=32, n=256 (5× faster than XLA's batched LU, but only ~5% of the roofline
bound; per-step launch overhead dominates). Here the whole sweep runs inside
ONE kernel with everything VMEM-resident, each step a handful of (Kc, N) VPU
row operations — no per-step launch cost at all.

Layout: split re/im f32 planes (complex is not a Pallas TPU dtype). The grid
chunks the candidate axis so the per-program working set
``2 planes · Kc · N² · 4 B`` stays ≤ ~8 MB of VMEM:
Kc = 16 at N ≤ 256, 4 at N = 512, 1 at N = 1024. Requires N % 128 == 0 and
K % Kc == 0 (wrapper falls back to the JAX scan otherwise).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kc_for(n: int) -> int:
    budget = 8 * 1024 * 1024                    # VMEM bytes for the R planes
    kc = max(1, budget // (2 * 4 * n * n))
    for cand in (16, 8, 4, 2, 1):
        if cand <= kc:
            return cand
    return 1


def _kernel(n: int, kc: int):
    def kernel(hr_ref, hi_ref, sr_ref, si_ref, br_ref, bi_ref,
               xr_ref, xi_ref, rr_ref, ri_ref, yr_ref, yi_ref):
        # refs: H (n,n) shared; shift s (1,kc,128) re/im = −λ+ψ tiled along
        # lanes; b (1,kc,n); outputs x (1,kc,n); scratch R (kc,n,n) + y (kc,n).
        # The candidate-chunked operands carry a leading grid axis so their
        # BLOCK shapes' last two dims equal the array dims (Mosaic's tiling
        # rule) for any kc.
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)       # (1, n)
        sre = sr_ref[0, :, 0:1]                                     # (kc, 1)
        sim = si_ref[0, :, 0:1]
        br_full = br_ref[0]                                         # (kc, n)
        bi_full = bi_ref[0]

        # ---- forward Givens sweep -------------------------------------------
        # Row j+1 of the working matrix is always a FRESH (never-rotated)
        # H row + diagonal shift, and its pivot element H[j+1, j] is shared by
        # all candidates — so the loop carries only the current (rotated) row
        # and the current rhs element; R rows are written once, never re-read,
        # and the only (kc, n)-wide extraction per step is the pivot a.
        def fwd(j, carry):
            cur_r, cur_i, ycr, yci = carry
            hrow_r = hr_ref[pl.ds(j + 1, 1), :]                     # (1, n)
            hrow_i = hi_ref[pl.ds(j + 1, 1), :]
            jm = (cols == j).astype(jnp.float32)                    # (1, n)
            jm1 = (cols == j + 1).astype(jnp.float32)
            fresh_r = hrow_r + sre * jm1                            # (kc, n)
            fresh_i = hrow_i + sim * jm1
            ar = jnp.sum(cur_r * jm, axis=1, keepdims=True)         # (kc, 1)
            ai = jnp.sum(cur_i * jm, axis=1, keepdims=True)
            # shared subdiagonal pivot b = H[j+1, j]
            br_ = jnp.sum(hrow_r * jm, axis=1, keepdims=True)       # (1, 1)
            bi_ = jnp.sum(hrow_i * jm, axis=1, keepdims=True)
            a2 = ar * ar + ai * ai
            b2 = (br_ * br_ + bi_ * bi_) + jnp.zeros_like(a2)       # (kc, 1)
            rmag = jnp.sqrt(jnp.maximum(a2 + b2, 1e-37))
            absa = jnp.sqrt(jnp.maximum(a2, 1e-37))
            nontriv = b2 > 0.0
            # c real = |a|/r; s = sign(a)·conj(b)/r, sign(a) = a/|a| (1 if a=0)
            c = jnp.where(nontriv, absa / rmag, 1.0)                # (kc, 1)
            zero_a = a2 <= 1e-37
            sgr = jnp.where(zero_a, 1.0, ar / absa)
            sgi = jnp.where(zero_a, 0.0, ai / absa)
            sr = jnp.where(nontriv, (sgr * br_ + sgi * bi_) / rmag, 0.0)
            si = jnp.where(nontriv, (sgi * br_ - sgr * bi_) / rmag, 0.0)
            # row0' = c·cur + s·fresh ; carry row1' = −conj(s)·cur + c·fresh
            n0r = c * cur_r + sr * fresh_r - si * fresh_i
            n0i = c * cur_i + sr * fresh_i + si * fresh_r
            n1r = -(sr * cur_r + si * cur_i) + c * fresh_r
            n1i = -(sr * cur_i - si * cur_r) + c * fresh_i
            rr_ref[:, pl.ds(j, 1), :] = n0r[:, None, :]
            ri_ref[:, pl.ds(j, 1), :] = n0i[:, None, :]
            # rhs: carry y[j] and pull the untouched original b[j+1]
            ynr = jnp.sum(br_full * jm1, axis=1, keepdims=True)     # (kc, 1)
            yni = jnp.sum(bi_full * jm1, axis=1, keepdims=True)
            z0r = c * ycr + sr * ynr - si * yni
            z0i = c * yci + sr * yni + si * ynr
            z1r = -(sr * ycr + si * yci) + c * ynr
            z1i = -(sr * yci - si * ycr) + c * yni
            yr_ref[:] = jnp.where(jm > 0, z0r, yr_ref[:])
            yi_ref[:] = jnp.where(jm > 0, z0i, yi_ref[:])
            return n1r, n1i, z1r, z1i

        on0 = (cols == 0).astype(jnp.float32)
        cur_r0 = hr_ref[pl.ds(0, 1), :] + sre * on0                 # (kc, n)
        cur_i0 = hi_ref[pl.ds(0, 1), :] + sim * on0
        ycr0 = jnp.sum(br_full * on0, axis=1, keepdims=True)
        yci0 = jnp.sum(bi_full * on0, axis=1, keepdims=True)
        # i32 loop bounds: python-int bounds make the index i64 under x64,
        # and Mosaic's i64→i32 handling recurses without bound at trace time
        cur_r, cur_i, ycr, yci = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n - 1), fwd,
            (cur_r0, cur_i0, ycr0, yci0))
        # flush the final carried row/rhs element (column n−1)
        rr_ref[:, pl.ds(n - 1, 1), :] = cur_r[:, None, :]
        ri_ref[:, pl.ds(n - 1, 1), :] = cur_i[:, None, :]
        onl = (cols == n - 1).astype(jnp.float32)
        yr_ref[:] = jnp.where(onl > 0, ycr, yr_ref[:])
        yi_ref[:] = jnp.where(onl > 0, yci, yi_ref[:])

        # ---- backward substitution -----------------------------------------
        xr_ref[0] = jnp.zeros((kc, n), jnp.float32)
        xi_ref[0] = jnp.zeros((kc, n), jnp.float32)

        def bwd(i, _):
            j = n - 1 - i
            rjr = rr_ref[:, pl.ds(j, 1), :][:, 0]                   # (kc, n)
            rji = ri_ref[:, pl.ds(j, 1), :][:, 0]
            jm = (cols == j).astype(jnp.float32)
            djr = jnp.sum(rjr * jm, axis=1, keepdims=True)          # R[j,j]
            dji = jnp.sum(rji * jm, axis=1, keepdims=True)
            xr = xr_ref[0]
            xi = xi_ref[0]
            # no `above` mask: x is exactly zero at every column <= j when
            # row j's dot runs (backward order), so the unmasked sum is
            # bitwise identical — A/B'd on v5e: ~10% faster at K=32 n=256
            dotr = jnp.sum(rjr * xr - rji * xi, axis=1, keepdims=True)
            doti = jnp.sum(rjr * xi + rji * xr, axis=1, keepdims=True)
            yjr = jnp.sum(yr_ref[:] * jm, axis=1, keepdims=True)
            yji = jnp.sum(yi_ref[:] * jm, axis=1, keepdims=True)
            numr = yjr - dotr
            numi = yji - doti
            den = djr * djr + dji * dji
            # exact-zero pivot → emit inf (the Ψ ladder / failure machinery
            # upstream treats non-finite rows as solve failure)
            den_safe = jnp.where(den > 0.0, den, 1.0)
            xjr = jnp.where(den > 0.0, (numr * djr + numi * dji) / den_safe,
                            jnp.float32(jnp.inf))
            xji = jnp.where(den > 0.0, (numi * djr - numr * dji) / den_safe,
                            jnp.float32(jnp.inf))
            xr_ref[0] = xr + jm * xjr
            xi_ref[0] = xi + jm * xji
            return jnp.int32(0)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), bwd, jnp.int32(0))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def hess_solve_batched_pallas(H: jax.Array, shifts: jax.Array, B: jax.Array,
                              *, interpret: bool = False) -> jax.Array:
    """Solve ``(H + shift_k I) w_k = b_k`` (upper-Hessenberg H, complex64).

    ``shifts``: (K,) complex — pass ``−λ + ψ``. Requires N % 128 == 0 and
    K % Kc == 0 (see :func:`_kc_for`); callers should use
    :func:`maus_tpu.ops.hessenberg.solve_shifted_hessenberg` as the general
    entry point, which dispatches here when the shapes allow.
    """
    K, n = B.shape
    if H.shape != (n, n):
        raise ValueError(f"H {H.shape} does not match B {B.shape}")
    kc = _kc_for(n)
    if n % 128 != 0 or K % kc != 0:
        raise ValueError(f"unsupported shape: N={n} (needs %128==0), "
                         f"K={K} (needs %{kc}==0)")
    G = K // kc
    grid = (G,)
    hr = H.real.astype(jnp.float32)
    hi = H.imag.astype(jnp.float32)
    # candidate-chunked operands carry a leading grid axis so block shapes'
    # last two dims equal the array dims (Mosaic tiling rule) for any kc;
    # shifts are tiled along 128 lanes for the same reason
    sr = jnp.broadcast_to(shifts.real.astype(jnp.float32)[:, None],
                          (K, 128)).reshape(G, kc, 128)
    si = jnp.broadcast_to(shifts.imag.astype(jnp.float32)[:, None],
                          (K, 128)).reshape(G, kc, 128)
    br = B.real.astype(jnp.float32).reshape(G, kc, n)
    bi = B.imag.astype(jnp.float32).reshape(G, kc, n)

    # index-map zeros must inherit the grid index's dtype: under x64 a Python
    # literal 0 traces as i64 and Mosaic refuses the (i64, i64) index tuple
    def _fixed(g):
        return (g - g, g - g)

    def _chunk(g):
        return (g, g - g, g - g)

    xr, xi = pl.pallas_call(
        _kernel(n, kc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n), _fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), _fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, 128), _chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, 128), _chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, n), _chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, n), _chunk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, kc, n), _chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, n), _chunk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, kc, n), jnp.float32),
            jax.ShapeDtypeStruct((G, kc, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((kc, n, n), jnp.float32),
            pltpu.VMEM((kc, n, n), jnp.float32),
            pltpu.VMEM((kc, n), jnp.float32),
            pltpu.VMEM((kc, n), jnp.float32),
        ],
        interpret=interpret,
    )(hr, hi, sr, si, br, bi)
    return jax.lax.complex(xr, xi).astype(B.dtype).reshape(K, n)
