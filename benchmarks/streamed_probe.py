"""Measure the STREAMED exact-slicing residual at 16384² (VERDICT r2 #4).

Above N ≈ 12k the resident bf16 slice ladder (~13 GB at 16384²) no longer
fits HBM; the round-2 fallback was the emulated-f64 3M GEMV path (~50× below
bandwidth). Round 3 adds `_sliced_residual_streamed`: per-column-panel ladder
extraction + exact bf16 slice GEMMs, with only ladder/panels bytes resident.

This probe times, at N=16384 on the real chip:
  * the 3M emulated-f64 residual (the old fallback),
  * the streamed exact-slicing residual (extraction + GEMMs per call),
and prints JSON. Run solo on the chip:  python benchmarks/streamed_probe.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main(n: int = 16384, reps: int = 2):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from maus_tpu.ops.refine import (SplitComplex, _residual_3m,
                                     _sliced_residual_streamed,
                                     streamed_panels, use_sliced_matvecs,
                                     use_streamed_sliced)

    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        # f32 values widened to f64 planes: extraction/GEMM cost is
        # value-independent, and generation stays on device (the ~70 MB/s
        # host tunnel would take ~60 s to ship a host-made 16384² operand)
        mk = lambda k, shape: jax.random.normal(k, shape, jnp.float32) \
            .astype(jnp.float64)
        Ar = mk(ks[0], (n, n))
        Ai = mk(ks[1], (n, n))
        xr = mk(ks[2], (n,))
        xi = mk(ks[3], (n,))
        return Ar, Ai, xr, xi

    Ar, Ai, xr, xi = gen(key)
    jax.block_until_ready(Ar)
    A64 = SplitComplex(Ar, Ai)
    x64 = SplitComplex(xr, xi)
    b64 = SplitComplex(xr * 1.5, xi * 0.5)

    assert not use_sliced_matvecs(A64), "resident ladder must NOT fit here"
    assert use_streamed_sliced(A64), "streamed tier must engage at 16384"
    panels = streamed_panels(A64)

    overhead_probe = jax.jit(lambda v: v + 1.0)
    float(overhead_probe(jnp.asarray(1.0, jnp.float32)))
    t0 = time.perf_counter()
    float(overhead_probe(jnp.asarray(1.0, jnp.float32)))
    overhead = time.perf_counter() - t0

    def timed(fn, *args, inner: int = 1):
        float(fn(*args))                       # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append((time.perf_counter() - t0 - overhead) / inner)
        return float(np.median(ts))

    # ---- streamed exact-slicing residual (one call per program: at 16384²
    # a single call is ≫ the 30 ms dispatch overhead) ------------------------
    @jax.jit
    def f_stream(Ar, Ai, xr, xi, br, bi):
        r = _sliced_residual_streamed(SplitComplex(Ar, Ai),
                                      SplitComplex(xr, xi),
                                      SplitComplex(br, bi), panels)
        return r.norm().astype(jnp.float32)

    t_stream = timed(f_stream, Ar, Ai, xr, xi, b64.re, b64.im)
    print(json.dumps({"t_streamed_s": round(t_stream, 4), "panels": panels}))

    # ---- old fallback: 3M emulated-f64 GEMV residual. At 16384² this OOMs
    # outright on v5e: XLA's emulated-f64 dot_general materializes an
    # f32[8, N, N] temp (8 GB) plus u32[1, N, N] scratch per GEMV — 19 GB
    # program HBM vs 15.75 available (measured 2026-08-17). Record the
    # failure honestly and scale a per-call estimate from N/2 instead. ------
    @jax.jit
    def f_3m(Ar, Ai, xr, xi, br, bi):
        A = SplitComplex(Ar, Ai)
        r = _residual_3m(A, Ar + Ai, SplitComplex(xr, xi),
                         SplitComplex(br, bi))
        return r.norm().astype(jnp.float32)

    try:
        t_3m = timed(f_3m, Ar, Ai, xr, xi, b64.re, b64.im)
        ra = f_stream(Ar, Ai, xr, xi, b64.re, b64.im)
        rb = f_3m(Ar, Ai, xr, xi, b64.re, b64.im)
        agree = float(abs(float(ra) - float(rb)) / max(float(rb), 1e-30))
    except Exception as e:                                    # noqa: BLE001
        t_3m = None
        agree = None
        print(json.dumps({"t_3m_emulated_s": "OOM",
                          "error_head": str(e)[:160]}))
        # scale reference: the same 3M residual at N/2 (fits), O(N²) cost
        h = n // 2
        t_3m_half = timed(f_3m, Ar[:h, :h], Ai[:h, :h], xr[:h], xi[:h],
                          b64.re[:h], b64.im[:h])
        t_3m = -4.0 * t_3m_half            # negative marks "extrapolated"

    # roofline context: GEMM traffic of the ladder = 24 bf16 planes = 48B/elem
    gemm_bytes = 48.0 * n * n
    # extraction reads the f64 planes (16 B/elem) several times and writes the
    # ladder once — the bound below counts one plane read + one ladder write
    extract_bytes = 16.0 * n * n + gemm_bytes
    extrapolated = t_3m is not None and t_3m < 0
    t_3m_abs = abs(t_3m) if t_3m is not None else None
    out = {
        "n": n, "panels": panels,
        "t_streamed_s": round(t_stream, 4),
        "t_3m_emulated_s": (None if t_3m_abs is None else round(t_3m_abs, 4)),
        "t_3m_is_extrapolated_4x_from_half_n": extrapolated,
        "t_3m_oom_at_n": extrapolated,
        "speedup_vs_3m": (None if t_3m_abs is None
                          else round(t_3m_abs / t_stream, 2)),
        "norm_agreement_rel": agree,
        "note": ("streamed = per-panel ladder re-extraction + exact bf16 "
                 "slice GEMMs; bound counts one plane read + ladder "
                 "write + ladder GEMM read"),
        "lower_bound_s_at_664GBs": round(
            (gemm_bytes + extract_bytes) / 664e9, 4),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
