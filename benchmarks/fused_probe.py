"""Measure the FUSED in-VMEM slice-residual kernel vs the dense-ladder path.

The fused kernel (ops/pallas/slice_residual.py) extracts the exact-slicing
digit ladder inside VMEM from an exact f32 triple split and feeds the MXU
directly — no HBM bf16 ladder. This probe, per size:

  * checks the fused residual against the dense-ladder result (both are
    grid-exact; they must agree to f64-accumulation roundoff),
  * times one fused residual call (triple resident, like refinement uses it),
  * times the dense-ladder residual + its one-time extraction for context.

Run solo on the chip:  python benchmarks/fused_probe.py [N ...]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def probe(n: int, reps: int = 3):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from maus_tpu.ops.pallas.slice_residual import (sliced_residual_fused,
                                                    split_triple)
    from maus_tpu.ops.refine import (SplitComplex, _sliced_residual,
                                     _slices_fit, slice_split_matrix)

    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        mk = lambda k, shape: jax.random.normal(k, shape, jnp.float32) \
            .astype(jnp.float64)
        return (mk(ks[0], (n, n)), mk(ks[1], (n, n)), mk(ks[2], (n,)),
                mk(ks[3], (n,)))

    Ar, Ai, xr, xi = gen(key)
    jax.block_until_ready(Ar)
    A64 = SplitComplex(Ar, Ai)
    x64 = SplitComplex(xr, xi)
    b64 = SplitComplex(xr * 1.5, xi * 0.5)

    def timed(fn, *args):
        float(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def timed_amortized(make_prog, R: int = 8):
        """Per-call time with the ~30 ms dispatch+fetch RPC cancelled: time a
        1-call program and an R-call chained program (data-dependent, no CSE)
        and return (t_R − t_1)/(R − 1)."""
        t1 = timed(make_prog(1))
        tR = timed(make_prog(R))
        return max((tR - t1) / (R - 1), 0.0), t1

    out = {"n": n}

    # time the split BEFORE holding a persistent triple (two triples at once
    # would exceed HBM at n=16384: planes 4.3 GB + 2×6.4 GB)
    t_split = timed(lambda a, b_: jnp.float32(
        jax.jit(split_triple)(SplitComplex(a, b_)).re.hi[0, 0]), Ar, Ai)
    tri = jax.jit(split_triple)(A64)
    jax.block_until_ready(tri.re.hi)

    def make_fused(R):
        @jax.jit
        def f(tri, xr, xi, br, bi):
            def body(_, c):
                xr_, xi_ = c
                r = sliced_residual_fused(tri, SplitComplex(xr_, xi_),
                                          SplitComplex(br, bi))
                # feed the residual back in so iterations can't be CSE'd
                return r.re, r.im
            rr, ri = jax.lax.fori_loop(0, R, body, (xr, xi))
            return jnp.sqrt(jnp.sum(rr * rr + ri * ri)).astype(jnp.float32)
        return lambda: f(tri, xr, xi, b64.re, b64.im)

    t_fused, t_fused_1 = timed_amortized(make_fused)
    out["t_fused_resid_s"] = round(t_fused, 5)
    out["t_fused_1call_s"] = round(t_fused_1, 5)
    out["t_triple_split_s"] = round(t_split, 5)

    if _slices_fit(A64):
        sp = jax.jit(slice_split_matrix)(A64)
        jax.block_until_ready(sp.sl_re)

        def make_dense(R):
            @jax.jit
            def f(sp, xr, xi, br, bi):
                def body(_, c):
                    xr_, xi_ = c
                    r = _sliced_residual(sp, SplitComplex(xr_, xi_),
                                         SplitComplex(br, bi))
                    return r.re, r.im
                rr, ri = jax.lax.fori_loop(0, R, body, (xr, xi))
                return jnp.sqrt(jnp.sum(rr * rr + ri * ri)) \
                    .astype(jnp.float32)
            return lambda: f(sp, xr, xi, b64.re, b64.im)

        t_dense, _ = timed_amortized(make_dense)
        t_extract = timed(lambda a, b_: jnp.float32(jax.jit(
            slice_split_matrix)(SplitComplex(a, b_)).sl_re[0, 0, 0]), Ar, Ai)
        out["t_dense_resid_s"] = round(t_dense, 5)
        out["t_dense_extract_s"] = round(t_extract, 5)
        out["speedup_resid"] = round(t_dense / max(t_fused, 1e-9), 2)

        # agreement: both are digit-grid-exact; compare through f64 norms
        @jax.jit
        def diff(tri, sp, xr, xi, br, bi):
            rf = sliced_residual_fused(tri, SplitComplex(xr, xi),
                                       SplitComplex(br, bi))
            rd = _sliced_residual(sp, SplitComplex(xr, xi),
                                  SplitComplex(br, bi))
            num = jnp.sqrt(jnp.sum((rf.re - rd.re) ** 2
                                   + (rf.im - rd.im) ** 2))
            den = jnp.maximum(jnp.sqrt(jnp.sum(rd.re ** 2 + rd.im ** 2)),
                              1e-30)
            return (num / den).astype(jnp.float32)

        out["fused_vs_dense_rel"] = float(diff(tri, sp, xr, xi,
                                               b64.re, b64.im))
    # roofline context: the fused floor is reading the 12 B/elem triple
    out["floor_s_at_664GBs"] = round(2 * 12.0 * n * n / 664e9, 5)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [4096]
    for s in sizes:
        probe(s)
