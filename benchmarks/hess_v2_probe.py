"""Prototype A/B harness for the v2 Pallas shifted-Hessenberg solve kernel.

v2 changes vs ops/pallas/hess_solve.py (v1):

* **Stacked re/im planes**: all row operations act on (2, kc, n) tensors
  ([re-plane; im-plane] on a leading axis) — the complex rotation becomes
  3 multiplies + 2 adds + 1 plane-swap per output row instead of 10 separate
  half-size ops, halving instruction issue on a sweep that is issue-bound at
  these shapes.
* **Blocked back substitution**: columns are processed in 128-wide blocks —
  the cross-block dot products run as dense (2, kc, B, B) tile contractions
  (near-peak VPU), and only the within-block recurrence stays sequential on
  (2, kc, B) slices (n/B× smaller than v1's full-width rows).

Run on CPU (interpret mode, correctness) or TPU (timing):
    python benchmarks/hess_v2_probe.py [--tpu]
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


def _swap(t):
    """Swap the stacked re/im planes (axis 0 of a (2, ...) tensor)."""
    return jnp.concatenate([t[1:2], t[0:1]], axis=0)


def _kernel_v2(n: int, kc: int, blk: int = 128):
    nb = n // blk
    kk = 2 * kc            # stacked sublane count: [kc re-rows; kc im-rows]

    def kernel(hs_ref, ss_ref, bs_ref, subr_ref, subi_ref, xs_ref,
               rs_ref, ys_ref):
        # hs: (2, n, n) shared H planes; ss: (1, kk, 128) shifts;
        # bs: (1, kk, n); xs out: (1, kk, n);
        # scratch rs: (kk, n, n), ys: (kk, n).
        # 2D stacked layout throughout: (2,kc,·)-shaped tensors with a middle
        # dim of 1 hit unimplemented Mosaic reduce layouts at kc=1, so planes
        # live on the SUBLANE axis ([0:kc]=re, [kc:2kc]=im) and every reduce
        # is the same (rows, lanes)->(rows, 1) pattern the v1 kernel uses.
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        sS = ss_ref[0, :, 0:1]                              # (kk, 1)
        bS = bs_ref[0]                                      # (kk, n)

        def swap(t):
            return jnp.concatenate([t[kc:], t[:kc]], axis=0)

        def hrow2(j):
            row = hs_ref[:, pl.ds(j, 1), :]                 # (2, 1, n)
            return jnp.broadcast_to(row, (2, kc, n)).reshape(kk, n)

        # ---- forward Givens sweep (stacked planes) ------------------------
        def fwd(j, carry):
            curS, ycS = carry                               # (kk,n), (kk,1)
            jm = (cols == j).astype(jnp.float32)
            jm1 = (cols == j + 1).astype(jnp.float32)
            freshS = hrow2(j + 1) + sS * jm1                # (kk, n)
            aS = jnp.sum(curS * jm, axis=1, keepdims=True)  # (kk, 1)
            ar, ai = aS[:kc], aS[kc:]                       # (kc, 1)
            # shared subdiagonal pivot H[j+1, j]: SMEM scalars
            br, bi = subr_ref[j], subi_ref[j]
            a2 = ar * ar + ai * ai
            b2 = (br * br + bi * bi) + jnp.zeros_like(a2)
            rmag = jnp.sqrt(jnp.maximum(a2 + b2, 1e-37))
            absa = jnp.sqrt(jnp.maximum(a2, 1e-37))
            nontriv = b2 > 0.0
            c = jnp.where(nontriv, absa / rmag, 1.0)
            zero_a = a2 <= 1e-37
            sgr = jnp.where(zero_a, 1.0, ar / absa)
            sgi = jnp.where(zero_a, 0.0, ai / absa)
            sr = jnp.where(nontriv, (sgr * br + sgi * bi) / rmag, 0.0)
            si = jnp.where(nontriv, (sgi * br - sgr * bi) / rmag, 0.0)
            cS = jnp.concatenate([c, c], axis=0)            # (kk, 1)
            srS = jnp.concatenate([sr, sr], axis=0)
            siX = jnp.concatenate([-si, si], axis=0)
            n0S = cS * curS + srS * freshS + siX * swap(freshS)
            n1S = cS * freshS - srS * curS + siX * swap(curS)
            rs_ref[:, pl.ds(j, 1), :] = n0S[:, None, :]
            ynS = jnp.sum(bS * jm1, axis=1, keepdims=True)  # (kk, 1)
            y0S = cS * ycS + srS * ynS + siX * swap(ynS)
            y1S = cS * ynS - srS * ycS + siX * swap(ycS)
            ys_ref[:] = jnp.where(jm > 0, y0S, ys_ref[:])
            return n1S, y1S

        on0 = (cols == 0).astype(jnp.float32)
        cur0 = hrow2(0) + sS * on0
        yc0 = jnp.sum(bS * on0, axis=1, keepdims=True)
        curS, ycS = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), fwd,
                                      (cur0, yc0))
        rs_ref[:, pl.ds(n - 1, 1), :] = curS[:, None, :]
        onl = (cols == n - 1).astype(jnp.float32)
        ys_ref[:] = jnp.where(onl > 0, ycS, ys_ref[:])

        # ---- blocked back substitution ------------------------------------
        colsB = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        yS = ys_ref[:]
        xblocks = [None] * nb

        def swapB(t):
            return jnp.concatenate([t[kc:], t[:kc]], axis=0)

        for bi in range(nb - 1, -1, -1):
            c0 = bi * blk
            # phase A: cross-block dots against already-solved blocks (dense
            # (kk, B, B) tile contractions — the bulk of the flops)
            dacc = jnp.zeros((kk, blk), jnp.float32)
            for cc in range(bi + 1, nb):
                Rblk = rs_ref[:, c0:c0 + blk, cc * blk:(cc + 1) * blk]
                xch = xblocks[cc]                           # (kk, B)
                t1 = jnp.sum(Rblk * xch[:, None, :], axis=2)
                t2 = jnp.sum(Rblk * swapB(xch)[:, None, :], axis=2)
                dacc = dacc + jnp.concatenate(
                    [t1[:kc] - t1[kc:], t2[:kc] + t2[kc:]], axis=0)
            yblk = yS[:, c0:c0 + blk]                       # (kk, B)
            dblk = dacc

            # phase B: within-block sequential recurrence on (kk, B)
            def inner(t, xblk, c0=c0, dblk=dblk, yblk=yblk):
                jj = blk - 1 - t
                jmB = (colsB == jj).astype(jnp.float32)
                gtB = (colsB > jj).astype(jnp.float32)
                # dynamic sublane index + partial lane slice is not a
                # supported Mosaic load — read the full row, slice as a value
                rowSeg = rs_ref[:, pl.ds(c0 + jj, 1), :][:, 0, c0:c0 + blk]
                t1 = jnp.sum(rowSeg * xblk * gtB, axis=1, keepdims=True)
                t2 = jnp.sum(rowSeg * swapB(xblk) * gtB, axis=1,
                             keepdims=True)
                dotS = jnp.concatenate(
                    [t1[:kc] - t1[kc:], t2[:kc] + t2[kc:]], axis=0)
                daccj = jnp.sum(dblk * jmB, axis=1, keepdims=True)
                yj = jnp.sum(yblk * jmB, axis=1, keepdims=True)
                numS = yj - daccj - dotS                    # (kk, 1)
                djS = jnp.sum(rowSeg * jmB, axis=1, keepdims=True)
                djr, dji = djS[:kc], djS[kc:]
                den = djr * djr + dji * dji                 # (kc, 1)
                den_safe = jnp.where(den > 0.0, den, 1.0)
                nr, ni = numS[:kc], numS[kc:]
                xr = jnp.where(den > 0.0, (nr * djr + ni * dji) / den_safe,
                               jnp.float32(jnp.inf))
                xi = jnp.where(den > 0.0, (ni * djr - nr * dji) / den_safe,
                               jnp.float32(jnp.inf))
                xjS = jnp.concatenate([xr, xi], axis=0)     # (kk, 1)
                return xblk + xjS * jmB

            xblocks[bi] = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(blk), inner,
                jnp.zeros((kk, blk), jnp.float32))
        xs_ref[0] = jnp.concatenate(xblocks, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def hess_solve_v2(H, shifts, B, *, interpret=False):
    K, n = B.shape
    kc = _kc_for(n)
    assert n % 128 == 0 and K % kc == 0
    G = K // kc
    hs = jnp.stack([H.real.astype(jnp.float32), H.imag.astype(jnp.float32)])
    sub = jnp.diagonal(H, offset=-1)
    subr = jnp.concatenate([sub.real.astype(jnp.float32),
                            jnp.zeros((1,), jnp.float32)])
    subi = jnp.concatenate([sub.imag.astype(jnp.float32),
                            jnp.zeros((1,), jnp.float32)])
    # stacked-per-chunk operands: (G, 2kc, lanes) with [kc re; kc im] rows
    ss = jnp.broadcast_to(
        jnp.stack([shifts.real.astype(jnp.float32),
                   shifts.imag.astype(jnp.float32)])[:, :, None],
        (2, K, 128)).reshape(2, G, kc, 128).transpose(1, 0, 2, 3) \
        .reshape(G, 2 * kc, 128)
    bs = jnp.stack([B.real.astype(jnp.float32), B.imag.astype(jnp.float32)]) \
        .reshape(2, G, kc, n).transpose(1, 0, 2, 3).reshape(G, 2 * kc, n)

    def _chunk(g):
        return (g, g - g, g - g)

    xs = pl.pallas_call(
        _kernel_v2(n, kc),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((2, n, n), lambda g: (g - g, g - g, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * kc, 128), _chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * kc, n), _chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda g: (g - g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n,), lambda g: (g - g,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * kc, n), _chunk,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 2 * kc, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * kc, n, n), jnp.float32),
            pltpu.VMEM((2 * kc, n), jnp.float32),
        ],
        interpret=interpret,
    )(hs, ss, bs, subr, subi)
    xs = xs.reshape(G, 2, kc, n).transpose(1, 0, 2, 3).reshape(2, K, n)
    return jax.lax.complex(xs[0], xs[1]).astype(B.dtype)


def _ref_solve(H, shifts, B):
    """Dense oracle: per-candidate solve of (H + shift I) w = b."""
    n = H.shape[0]
    eye = jnp.eye(n, dtype=H.dtype)

    def one(s, b):
        return jnp.linalg.solve(H + s * eye, b)

    return jax.vmap(one)(shifts, B)


def check(interpret: bool, n=256, K=32, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    Hh = np.triu(rng.standard_normal((n, n))
                 + 1j * rng.standard_normal((n, n)), -1)
    H = jnp.asarray(Hh, jnp.complex64)
    shifts = jnp.asarray(rng.standard_normal(K)
                         + 1j * rng.standard_normal(K), jnp.complex64)
    B = jnp.asarray(rng.standard_normal((K, n))
                    + 1j * rng.standard_normal((K, n)), jnp.complex64)
    W = hess_solve_v2(H, shifts, B, interpret=interpret)
    Wr = _ref_solve(H, shifts, B)
    err = jnp.max(jnp.abs(W - Wr)) / jnp.max(jnp.abs(Wr))
    print(f"n={n} K={K}: rel err vs dense oracle = {float(err):.3e}")
    return float(err)


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

        for n, K in ((256, 32), (512, 32), (1024, 16)):
            rng = np.random.default_rng(0)
            Hh = np.triu(rng.standard_normal((n, n))
                         + 1j * rng.standard_normal((n, n)), -1)
            from maus_tpu.utils.xfer import to_device_complex

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
            l2 = jax.jit(functools.partial(loop, hess_solve_v2))
            o = jax.jit(lambda x: x + 1.0)
            float(o(jnp.float32(0)))
            t0 = time.perf_counter()
            float(o(jnp.float32(0)))
            ov = time.perf_counter() - t0
            for name, l in (("v1", l1), ("v2", l2)):
                float(l(H, sh, B))      # compile
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(l(H, sh, B))
                    ts.append(time.perf_counter() - t0)
                t = (float(np.median(ts)) - ov) / R
                print(f"n={n} K={K} {name}: {t * 1e6:.1f} us/solve-batch")
            # correctness cross-check on device
            W1 = hess_solve_batched_pallas(H, sh, B)
            W2 = hess_solve_v2(H, sh, B)
            d = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) /
                        jnp.maximum(jnp.max(jnp.abs(a)), 1e-30))(W1, W2)
            print(f"   v1-vs-v2 rel diff: {float(d):.3e}")
