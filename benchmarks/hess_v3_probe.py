"""v3 Pallas shifted-Hessenberg solve: separate-plane forward sweep (v1's,
with a shorter rsqrt-based Givens-parameter chain) + blocked, latency-lean
back substitution.

Measured v1 split at K=32 n=256 (v5e): forward 55 us, backward ~120 us — the
backward per-column step chains ~14 dependent (kc, n)-wide ops (mask reduces,
divides), ~470 ns/step of pure latency. v3's backward:

* columns in 128-wide blocks; cross-block dots become dense (kc, B, B)
  contractions done once per block pair (phase A);
* per-block precompute: yEff = y − dacc, and the complex reciprocal of the
  diagonal (so the inner loop has NO divide);
* inner step: one rowSeg read + 2 lane reduces (the only serial latency) +
  a vectorized (yEff − dot)·recip evaluated at ALL positions and selected at
  the current column — no per-step extractions of y/diag at all.
* No triangularity masks: x is zero at unsolved positions by construction,
  and R's below-diagonal rounding dust only ever multiplies into rows whose
  unknowns are already solved.

Run: python benchmarks/hess_v3_probe.py [--tpu]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kc_for(n: int) -> int:
    budget = 8 * 1024 * 1024
    kc = max(1, budget // (2 * 4 * n * n))
    for cand in (16, 8, 4, 2, 1):
        if cand <= kc:
            return cand
    return 1


def _kernel_v3(n: int, kc: int, blk: int = 128):
    nb = n // blk

    def kernel(hr_ref, hi_ref, sr_ref, si_ref, br_ref, bi_ref,
               xr_ref, xi_ref, rr_ref, ri_ref, yr_ref, yi_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        sre = sr_ref[0, :, 0:1]                                     # (kc, 1)
        sim = si_ref[0, :, 0:1]
        br_full = br_ref[0]                                         # (kc, n)
        bi_full = bi_ref[0]

        # ---- forward Givens sweep (v1 structure, rsqrt parameter chain) ----
        def fwd(j, carry):
            cur_r, cur_i, ycr, yci = carry
            hrow_r = hr_ref[pl.ds(j + 1, 1), :]                     # (1, n)
            hrow_i = hi_ref[pl.ds(j + 1, 1), :]
            jm = (cols == j).astype(jnp.float32)
            jm1 = (cols == j + 1).astype(jnp.float32)
            fresh_r = hrow_r + sre * jm1                            # (kc, n)
            fresh_i = hrow_i + sim * jm1
            ar = jnp.sum(cur_r * jm, axis=1, keepdims=True)         # (kc, 1)
            ai = jnp.sum(cur_i * jm, axis=1, keepdims=True)
            br_ = jnp.sum(hrow_r * jm, axis=1, keepdims=True)       # (1, 1)
            bi_ = jnp.sum(hrow_i * jm, axis=1, keepdims=True)
            a2 = ar * ar + ai * ai
            b2 = (br_ * br_ + bi_ * bi_) + jnp.zeros_like(a2)
            # c = |a|/r, s = sign(a)·conj(b)/r  ⇒  with u = rsqrt(a2)·rsqrt(r²):
            # c = a2·u, sr+isi = (a·conj(b))·u — two rsqrts, no divide.
            nontriv = b2 > 0.0
            zero_a = a2 <= 1e-37
            inv_absa = jax.lax.rsqrt(jnp.maximum(a2, 1e-37))
            inv_rmag = jax.lax.rsqrt(jnp.maximum(a2 + b2, 1e-37))
            u = inv_absa * inv_rmag
            c = jnp.where(nontriv, a2 * u, 1.0)
            # a=0 ⇒ sign(a)=1 ⇒ s = conj(b)/r
            sr = jnp.where(nontriv,
                           jnp.where(zero_a, br_ * inv_rmag,
                                     (ar * br_ + ai * bi_) * u), 0.0)
            si = jnp.where(nontriv,
                           jnp.where(zero_a, -bi_ * inv_rmag,
                                     (ai * br_ - ar * bi_) * u), 0.0)
            n0r = c * cur_r + sr * fresh_r - si * fresh_i
            n0i = c * cur_i + sr * fresh_i + si * fresh_r
            n1r = -(sr * cur_r + si * cur_i) + c * fresh_r
            n1i = -(sr * cur_i - si * cur_r) + c * fresh_i
            for cc in range(nb):   # static lane-block split: free vreg select
                rr_ref[:, cc:cc + 1, pl.ds(j, 1), :] = jax.lax.slice_in_dim(
                    n0r, cc * blk, (cc + 1) * blk, axis=1) \
                    .reshape(kc, 1, 1, blk)
                ri_ref[:, cc:cc + 1, pl.ds(j, 1), :] = jax.lax.slice_in_dim(
                    n0i, cc * blk, (cc + 1) * blk, axis=1) \
                    .reshape(kc, 1, 1, blk)
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
        cur_r0 = hr_ref[pl.ds(0, 1), :] + sre * on0
        cur_i0 = hi_ref[pl.ds(0, 1), :] + sim * on0
        ycr0 = jnp.sum(br_full * on0, axis=1, keepdims=True)
        yci0 = jnp.sum(bi_full * on0, axis=1, keepdims=True)
        cur_r, cur_i, ycr, yci = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n - 1), fwd,
            (cur_r0, cur_i0, ycr0, yci0))
        for cc in range(nb):
            rr_ref[:, cc:cc + 1, pl.ds(n - 1, 1), :] = jax.lax.slice_in_dim(
                cur_r, cc * blk, (cc + 1) * blk, axis=1).reshape(kc, 1, 1, blk)
            ri_ref[:, cc:cc + 1, pl.ds(n - 1, 1), :] = jax.lax.slice_in_dim(
                cur_i, cc * blk, (cc + 1) * blk, axis=1).reshape(kc, 1, 1, blk)
        onl = (cols == n - 1).astype(jnp.float32)
        yr_ref[:] = jnp.where(onl > 0, ycr, yr_ref[:])
        yi_ref[:] = jnp.where(onl > 0, yci, yi_ref[:])

        # ---- blocked back substitution --------------------------------------
        colsB = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        eyeB = (jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0) ==
                jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)) \
            .astype(jnp.float32)[None]                              # (1, B, B)
        yr_all = yr_ref[:]
        yi_all = yi_ref[:]
        xblocks = [None] * nb
        for bi in range(nb - 1, -1, -1):
            c0 = bi * blk
            # phase A: dots against already-solved blocks (dense contractions)
            dar = jnp.zeros((kc, blk), jnp.float32)
            dai = jnp.zeros((kc, blk), jnp.float32)
            for cc in range(bi + 1, nb):
                Rr = rr_ref[:, cc:cc + 1, c0:c0 + blk, :][:, 0]
                Ri = ri_ref[:, cc:cc + 1, c0:c0 + blk, :][:, 0]
                xr_c, xi_c = xblocks[cc]                            # (kc, B)
                dar = dar + jnp.sum(Rr * xr_c[:, None, :]
                                    - Ri * xi_c[:, None, :], axis=2)
                dai = dai + jnp.sum(Rr * xi_c[:, None, :]
                                    + Ri * xr_c[:, None, :], axis=2)
            yer = yr_all[:, c0:c0 + blk] - dar                      # (kc, B)
            yei = yi_all[:, c0:c0 + blk] - dai
            # per-block precompute: complex reciprocal of the diagonal
            Rr_d = rr_ref[:, bi:bi + 1, c0:c0 + blk, :][:, 0]
            Ri_d = ri_ref[:, bi:bi + 1, c0:c0 + blk, :][:, 0]
            djr = jnp.sum(Rr_d * eyeB, axis=2)                      # (kc, B)
            dji = jnp.sum(Ri_d * eyeB, axis=2)
            den = djr * djr + dji * dji
            good = den > 0.0
            invd = jnp.where(good, 1.0, 0.0) / jnp.where(good, den, 1.0)
            rcr = djr * invd                                        # Re 1/d
            rci = -dji * invd                                       # Im 1/d
            badv = jnp.where(good, 0.0, jnp.float32(jnp.inf))

            # phase B: the only serial latency per step is one rowSeg read +
            # two lane reduces; everything else is vectorized over the block
            # and selected at the current column.
            def inner(t, carry, bi=bi, c0=c0, yer=yer, yei=yei, rcr=rcr,
                      rci=rci, badv=badv):
                xr_b, xi_b = carry                                  # (kc, B)
                jj = blk - 1 - t
                jmB = (colsB == jj).astype(jnp.float32)
                row_r = rr_ref[:, bi:bi + 1, pl.ds(c0 + jj, 1), :][:, 0, 0]
                row_i = ri_ref[:, bi:bi + 1, pl.ds(c0 + jj, 1), :][:, 0, 0]
                # x is zero at ≤ jj, so no triangularity mask is needed
                dot_r = jnp.sum(row_r * xr_b - row_i * xi_b, axis=1,
                                keepdims=True)                      # (kc, 1)
                dot_i = jnp.sum(row_r * xi_b + row_i * xr_b, axis=1,
                                keepdims=True)
                numr = yer - dot_r                                  # (kc, B)
                numi = yei - dot_i
                xcr = numr * rcr - numi * rci + badv
                xci = numr * rci + numi * rcr + badv
                return (xr_b + jmB * xcr, xi_b + jmB * xci)

            xblocks[bi] = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(blk), inner,
                (jnp.zeros((kc, blk), jnp.float32),
                 jnp.zeros((kc, blk), jnp.float32)))
        xr_ref[0] = jnp.concatenate([p[0] for p in xblocks], axis=1)
        xi_ref[0] = jnp.concatenate([p[1] for p in xblocks], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def hess_solve_v3(H, shifts, B, *, interpret=False):
    K, n = B.shape
    kc = _kc_for(n)
    assert n % 128 == 0 and K % kc == 0
    G = K // kc
    hr = H.real.astype(jnp.float32)
    hi = H.imag.astype(jnp.float32)
    sr = jnp.broadcast_to(shifts.real.astype(jnp.float32)[:, None],
                          (K, 128)).reshape(G, kc, 128)
    si = jnp.broadcast_to(shifts.imag.astype(jnp.float32)[:, None],
                          (K, 128)).reshape(G, kc, 128)
    br = B.real.astype(jnp.float32).reshape(G, kc, n)
    bi = B.imag.astype(jnp.float32).reshape(G, kc, n)

    def _fixed(g):
        return (g - g, g - g)

    def _chunk(g):
        return (g, g - g, g - g)

    xr, xi = pl.pallas_call(
        _kernel_v3(n, kc),
        grid=(G,),
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
            pltpu.VMEM((kc, n // 128, n, 128), jnp.float32),
            pltpu.VMEM((kc, n // 128, n, 128), jnp.float32),
            pltpu.VMEM((kc, n), jnp.float32),
            pltpu.VMEM((kc, n), jnp.float32),
        ],
        interpret=interpret,
    )(hr, hi, sr, si, br, bi)
    return jax.lax.complex(xr, xi).astype(B.dtype).reshape(K, n)


def check(interpret: bool, n=256, K=32, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    # well-scaled Hessenberg test matrix (diagonally weighted so the solve is
    # well-conditioned and f32-comparable against the c128 oracle)
    Hh = np.triu(rng.standard_normal((n, n))
                 + 1j * rng.standard_normal((n, n)), -1) \
        + 4.0 * np.sqrt(n) * np.eye(n)
    H = jnp.asarray(Hh, jnp.complex64)
    shifts = jnp.asarray(rng.standard_normal(K)
                         + 1j * rng.standard_normal(K), jnp.complex64)
    B = jnp.asarray(rng.standard_normal((K, n))
                    + 1j * rng.standard_normal((K, n)), jnp.complex64)
    W = hess_solve_v3(H, shifts, B, interpret=interpret)
    import numpy.linalg as npl
    Wn = np.asarray(W, np.complex128)
    errs = []
    for k in range(K):
        ref = npl.solve(np.asarray(Hh) + complex(shifts[k]) * np.eye(n),
                        np.asarray(B[k], np.complex128))
        errs.append(npl.norm(Wn[k] - ref) / npl.norm(ref))
    print(f"n={n} K={K}: max rel err vs c128 oracle = {max(errs):.3e}")
    return max(errs)


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        check(interpret=True, n=256, K=32)
        check(interpret=True, n=128, K=16)
    else:
        import time

        import numpy as np

        from maus_tpu.ops.pallas.hess_solve import hess_solve_batched_pallas
        from maus_tpu.utils.xfer import to_device_complex

        for n, K in ((256, 32), (512, 32), (1024, 16)):
            rng = np.random.default_rng(0)
            Hh = np.triu(rng.standard_normal((n, n))
                         + 1j * rng.standard_normal((n, n)), -1) \
                + 4.0 * np.sqrt(n) * np.eye(n)
            H = to_device_complex(Hh, jnp.complex64)
            sh = to_device_complex(
                rng.standard_normal(K) + 1j * rng.standard_normal(K),
                jnp.complex64)
            B = to_device_complex(
                rng.standard_normal((K, n)) + 1j * rng.standard_normal((K, n)),
                jnp.complex64)

            R = 256

            def loop(fn, H, sh, B):
                def body(i, carry):
                    acc, s = carry
                    s = s * (1.0 + 1e-6)
                    W = fn(H, s, B)
                    return acc + jnp.abs(jnp.sum(W)).real.astype(jnp.float32), s
                acc, _ = jax.lax.fori_loop(0, R, body,
                                           (jnp.float32(0.0), sh))
                return acc

            l1 = jax.jit(functools.partial(loop, hess_solve_batched_pallas))
            l3 = jax.jit(functools.partial(loop, hess_solve_v3))
            o = jax.jit(lambda x: x + 1.0)
            float(o(jnp.float32(0)))
            t0 = time.perf_counter()
            float(o(jnp.float32(0)))
            ov = time.perf_counter() - t0
            for name, l in (("v1", l1), ("v3", l3)):
                float(l(H, sh, B))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(l(H, sh, B))
                    ts.append(time.perf_counter() - t0)
                t = (float(np.median(ts)) - ov) / R
                print(f"n={n} K={K} {name}: {t * 1e6:.1f} us/solve-batch")
            W1 = hess_solve_batched_pallas(H, sh, B)
            W3 = hess_solve_v3(H, sh, B)
            d = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) /
                        jnp.maximum(jnp.max(jnp.abs(a)), 1e-30))(W1, W3)
            print(f"   v1-vs-v3 rel diff: {float(d):.3e}")
