"""Roofline / MFU scorecard (VERDICT r1 #1, BASELINE.md "≥80% of TPU roofline").

For each hot kernel this measures wall time (fenced by a host fetch of a real
scalar computed inside jit — ``block_until_ready`` does not fence on this
backend) and reports:

* ``gflops``      — flop model ÷ time (complex op = 8 real flops/MAC-pair;
                    LU = 8/3·n³, Householder QR = 16/3·n³ real flops).
* ``mfu``         — gflops ÷ the chip's published bf16 peak. Honest and low
                    for c64-HIGHEST kernels: each f32-accurate flop costs ~6
                    bf16 MXU passes, so the *achievable* ceiling at this
                    precision is peak_bf16/6 before complex overheads.
* ``sol_frac``    — fraction of the precision-adjusted speed of light: the
                    roofline bound max(flops/peak_c64_measured, bytes/bw),
                    where peak_c64_measured is a CALIBRATED large c64-HIGHEST
                    GEMM on this chip (what the MXU actually sustains at this
                    precision) and bw the measured HBM stream bandwidth.
                    This is the "≥80% of roofline" number: it asks whether the
                    kernel is at the hardware limit *for its precision and
                    arithmetic intensity*, which is the only limit a kernel
                    author can reach.

Run standalone: ``python benchmarks/mfu.py`` (JSON to stdout), or import
``scorecard()`` from bench.py.
"""
from __future__ import annotations

import json
import time

import numpy as np

# published chip peaks by device_kind prefix: (bf16 TFLOP/s, HBM GB/s)
_CHIP_PEAKS = {
    "TPU v5 lite": (197.0, 819.0),      # v5e
    "TPU v5": (459.0, 1228.0),          # v5p
    "TPU v4": (275.0, 1228.0),
    "TPU v6": (918.0, 1640.0),          # trillium
}
_DEFAULT_PEAK = (197.0, 819.0)


def _chip_peaks():
    import jax

    kind = jax.devices()[0].device_kind
    for prefix, peaks in _CHIP_PEAKS.items():
        if kind.startswith(prefix):
            return kind, peaks
    return kind, _DEFAULT_PEAK


def _fence_time(fn, *args, reps: int = 3) -> float:
    """Median wall time; each call fenced by fetching the real scalar output."""
    float(fn(*args))                     # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# Inner repetition counts: each kernel runs R times inside ONE jitted
# fori_loop with data-dependent chaining (an εI nudge per iteration defeats
# CSE/hoisting). This backend has a ~30 ms fixed dispatch+fetch RPC latency
# per program call — measured per run via a trivial program and subtracted —
# which would otherwise swamp every kernel under ~100 ms (first scorecard
# attempt reported 8.7 GB/s HBM "bandwidth": pure dispatch latency). R is
# sized PER KERNEL so the loop total is ≥10× the overhead: subtracting a
# noisy ~30 ms from a ~30 ms measurement produced garbage (negative times,
# sol_frac > 400) for sub-millisecond kernels.
_R_GEMM = 8
_R_QR = 8
_R_LU = 64
_R_HESS = 512
_R_MV = 2048
_R_STREAM = 64
_R_SLICED = 128
_R_FUSED = 512


def _timeit(fn, *args, overhead: float = 0.0, reps: int = 8) -> float:
    """Per-iteration kernel time from a reps-times-looped program.

    Every probe sizes its loop ≥10× the dispatch overhead, so
    ``elapsed − overhead ≤ 0`` means the CALLER'S overhead sample was a
    backend stall (a tunnel hiccup during the trivial-program fence), not a
    fast kernel — re-measure both rather than return the 1e-9 clamp (one
    such clamped run put a 2^27-gflops outlier into the round-5 canary
    calibration and blew the hessenberg gate's spread to 1.9e5)."""
    t = _fence_time(fn, *args)
    if t - overhead <= 0:
        overhead = _measure_overhead()
        t = _fence_time(fn, *args)
    return max((t - overhead) / reps, 1e-9)


def _cplx(k, shape):
    import jax
    import jax.numpy as jnp

    ka, kb = jax.random.split(k)
    return jax.lax.complex(jax.random.normal(ka, shape, jnp.float32),
                           jax.random.normal(kb, shape, jnp.float32))


def _measure_overhead():
    import jax
    import jax.numpy as jnp

    return _fence_time(jax.jit(lambda x: x + 1.0),
                       jnp.asarray(1.0, jnp.float32))


def _git_sha() -> str:
    """HEAD sha at measurement time — lets artifact staleness vs the library
    be detected mechanically (VERDICT r4 next-round #1)."""
    import pathlib
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=pathlib.Path(__file__).resolve().parent.parent,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


# ---------------------------------------------------------------------------
# Shared kernel probes — ONE implementation per kernel family, used by both
# scorecard() (full roofline run) and canary_suite() (always-live drift gate,
# VERDICT r3 #9). Each returns (time_s_per_iteration, flops, bytes); shapes
# default to the scorecard/artifact shapes so canary gflops are directly
# comparable with the committed mfu_v5e.json numbers.
# ---------------------------------------------------------------------------

def _probe_matvec(overhead, k_mv: int = 16, n_mv: int = 4096):
    import jax
    import jax.numpy as jnp

    hi = jax.lax.Precision.HIGHEST
    key = jax.random.PRNGKey(0)
    Am = _cplx(jax.random.fold_in(key, 5), (n_mv, n_mv))
    Xm = _cplx(jax.random.fold_in(key, 6), (k_mv, n_mv))
    f32z = jnp.asarray(0.0, jnp.float32)

    @jax.jit
    def mv(a, x):
        def body(i, carry):
            acc, x_ = carry
            x_ = x_ * (1.0 + 1e-7)
            y = jnp.matmul(x_, a.T, precision=hi)
            return acc + jnp.abs(jnp.sum(y)).real.astype(jnp.float32), x_
        acc, _ = jax.lax.fori_loop(0, _R_MV, body, (f32z, x))
        return acc

    t = _timeit(mv, Am, Xm, overhead=overhead, reps=_R_MV)
    return t, 8.0 * k_mv * n_mv ** 2, 8 * n_mv ** 2 + 2 * 8 * k_mv * n_mv


def _probe_hess_solve(overhead, k_lu: int = 32, n_lu: int = 256):
    import jax
    import jax.numpy as jnp

    from maus_tpu.ops.hessenberg import (HessCache, reduce_hessenberg,
                                         solve_shifted_via_hessenberg)

    key = jax.random.PRNGKey(0)
    Al = _cplx(jax.random.fold_in(key, 2), (n_lu, n_lu))
    lams = _cplx(jax.random.fold_in(key, 3), (k_lu,)) * 0.1
    Bv = _cplx(jax.random.fold_in(key, 4), (k_lu, n_lu))
    f32z = jnp.asarray(0.0, jnp.float32)
    cache = reduce_hessenberg(Al)
    jax.block_until_ready(cache.h)

    @jax.jit
    def hss(h, q, l, b):
        c = HessCache(h=h, q=q)

        def body(i, carry):
            acc, l_ = carry
            l_ = l_ * (1.0 + 1e-5)
            W = solve_shifted_via_hessenberg(c, l_, b)
            return acc + jnp.abs(jnp.sum(W)).real.astype(jnp.float32), l_
        acc, _ = jax.lax.fori_loop(0, _R_HESS, body, (f32z, l))
        return acc

    t = _timeit(hss, cache.h, cache.q, lams, Bv, overhead=overhead,
                reps=_R_HESS)
    # flops: two K×n×n GEMMs + O(K n²) Givens sweep; bytes: the (K,n,n)
    # shifted copy written+swept ≈ 3·K·n²·8
    return (t, 2 * 8.0 * k_lu * n_lu ** 2 + 48.0 * k_lu * n_lu ** 2,
            3 * k_lu * 8 * n_lu ** 2)


def _probe_sliced_residual(overhead, n_sr: int = 4096):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from maus_tpu.ops.refine import (SplitComplex, _sliced_residual,
                                     slice_split_matrix)

    key = jax.random.PRNGKey(0)
    kr = jax.random.fold_in(key, 7)
    A64 = SplitComplex(
        jax.random.normal(jax.random.fold_in(kr, 0), (n_sr, n_sr),
                          jnp.float32).astype(jnp.float64),
        jax.random.normal(jax.random.fold_in(kr, 1), (n_sr, n_sr),
                          jnp.float32).astype(jnp.float64))
    x64 = SplitComplex(
        jax.random.normal(jax.random.fold_in(kr, 2), (n_sr,),
                          jnp.float32).astype(jnp.float64),
        jax.random.normal(jax.random.fold_in(kr, 3), (n_sr,),
                          jnp.float32).astype(jnp.float64))
    spA = jax.jit(slice_split_matrix)(A64)
    jax.block_until_ready(spA.sl_re)
    f32z = jnp.asarray(0.0, jnp.float32)

    @jax.jit
    def sres(sl_re, sl_im, sigma, xr, xi):
        sp_ = type(spA)(sl_re, sl_im, sigma)
        x_ = SplitComplex(xr, xi)

        def body(i, acc):
            xk = SplitComplex(x_.re * (1.0 + 1e-13 * i), x_.im)
            r = _sliced_residual(sp_, xk, x_)
            return acc + r.norm().astype(jnp.float32)
        return jax.lax.fori_loop(0, _R_SLICED, body, f32z)

    t = _timeit(sres, spA.sl_re, spA.sl_im, spA.sigma, x64.re, x64.im,
                overhead=overhead, reps=_R_SLICED)
    s_a = int(spA.sl_re.shape[0])
    # bytes: 2 planes × sA bf16 slice passes; flops: 2·sA GEMMs of N²×(2·12)
    return (t, 2.0 * s_a * 2 * 24 * n_sr ** 2, 2 * s_a * 2 * n_sr ** 2,
            s_a)


def _probe_fused_residual(overhead, n_fu: int = 2048):
    """The in-VMEM fused digit-extraction kernel (ops/pallas/slice_residual)
    at a small tileable shape — accelerator only. gflops uses the kernel's
    LOGICAL work model (the f64 residual it replaces, 8·N² flops) so the
    number tracks effective residual throughput, not digit-GEMM volume.

    Shape/rep note (round-5 canary fix): the round-4 probe ran N=1024 with
    R=64 — a ~13 ms loop against a ~34 ms dispatch overhead, violating this
    module's own "loop total ≥10× overhead" rule, and the resulting 200 µs
    measurement drifted 26% run-to-run with zero code changes (BENCH_r04
    canary rc=1). N=2048 × R=512 puts the loop at ~0.4 s, ~12× overhead."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from maus_tpu.ops.pallas.slice_residual import (fused_ok,
                                                    sliced_residual_fused,
                                                    split_triple)
    from maus_tpu.ops.refine import SplitComplex

    if not fused_ok((n_fu, n_fu)):
        return None
    key = jax.random.PRNGKey(0)
    kr = jax.random.fold_in(key, 9)
    A64 = SplitComplex(
        jax.random.normal(jax.random.fold_in(kr, 0), (n_fu, n_fu),
                          jnp.float64),
        jax.random.normal(jax.random.fold_in(kr, 1), (n_fu, n_fu),
                          jnp.float64))
    x64 = SplitComplex(
        jax.random.normal(jax.random.fold_in(kr, 2), (n_fu,), jnp.float64),
        jax.random.normal(jax.random.fold_in(kr, 3), (n_fu,), jnp.float64))
    tri = jax.jit(split_triple)(A64)
    jax.block_until_ready(tri.sigma)
    f32z = jnp.asarray(0.0, jnp.float32)
    R = _R_FUSED

    @jax.jit
    def fres(tri_, xr, xi):
        def body(i, acc):
            xk = SplitComplex(xr * (1.0 + 1e-13 * i), xi)
            r = sliced_residual_fused(tri_, xk,
                                      SplitComplex(jnp.zeros_like(xr),
                                                   jnp.zeros_like(xi)))
            return acc + r.norm().astype(jnp.float32)
        return jax.lax.fori_loop(0, R, body, f32z)

    t = _timeit(fres, tri, x64.re, x64.im, overhead=overhead, reps=R)
    return t, 8.0 * n_fu ** 2, 12 * 2 * n_fu ** 2


def scorecard(n_gemm: int = 4096, n_qr: int = 4096, k_lu: int = 32,
              n_lu: int = 256, k_mv: int = 16, n_mv: int = 4096) -> dict:
    import jax
    import jax.numpy as jnp

    from maus_tpu.ops.batched_solve import batched_shifted_solve

    kind, (peak_bf16_tf, bw_gbs) = _chip_peaks()
    peak_bf16 = peak_bf16_tf * 1e12
    bw = bw_gbs * 1e9
    hi = jax.lax.Precision.HIGHEST
    key = jax.random.PRNGKey(0)
    cplx = _cplx

    out = {"device_kind": kind, "peak_bf16_tflops": peak_bf16_tf,
           "hbm_gbs": bw_gbs, "measured_at": time.strftime("%Y-%m-%d"),
           "git_sha": _git_sha(), "kernels": {}}

    overhead = _fence_time(jax.jit(lambda x: x + 1.0),
                           jnp.asarray(1.0, jnp.float32))
    out["dispatch_overhead_s"] = round(overhead, 4)
    f32z = jnp.asarray(0.0, jnp.float32)

    # ---- calibration 1: c64 HIGHEST GEMM = compute speed-of-light ----------
    ka, kb2 = jax.random.split(key)
    A = cplx(ka, (n_gemm, n_gemm))
    B = cplx(kb2, (n_gemm, n_gemm))

    @jax.jit
    def gemm(a, b):
        def body(i, carry):
            acc, a_ = carry
            a_ = a_ * (1.0 + 1e-7)      # data dependence defeats CSE/hoisting
            return acc + jnp.abs(jnp.sum(jnp.matmul(a_, b, precision=hi))) \
                .real.astype(jnp.float32), a_
        acc, _ = jax.lax.fori_loop(0, _R_GEMM, body, (f32z, a))
        return acc

    t = _timeit(gemm, A, B, overhead=overhead, reps=_R_GEMM)
    gemm_flops = 8.0 * n_gemm ** 3
    peak_c64 = gemm_flops / t            # measured c64-HIGHEST ceiling
    out["kernels"]["cgemm_calibration"] = {
        "shape": f"{n_gemm}^3 c64 HIGHEST", "time_s": round(t, 4),
        "gflops": round(gemm_flops / t / 1e9, 1),
        "mfu": round(gemm_flops / t / peak_bf16, 4),
        "sol_frac": 1.0,                 # defines the compute speed of light
    }

    # ---- calibration 2: HBM stream bandwidth --------------------------------
    big = jax.random.normal(key, (64 * 1024 * 1024,), jnp.float32)  # 256 MB

    @jax.jit
    def stream(x):
        def body(i, x_):
            return x_ * 1.0000001 + 1e-9
        y = jax.lax.fori_loop(0, _R_STREAM, body, x)
        return jnp.sum(y)                # full reduce: no slice propagation

    t_call = _fence_time(stream, big)
    bytes_moved = big.size * 4 * (2 * _R_STREAM + 1)   # R rw passes + reduce
    bw_meas = bytes_moved / max(t_call - overhead, 1e-7)
    out["kernels"]["hbm_stream"] = {
        "shape": f"256MB f32 x{_R_STREAM} rw passes",
        "time_s": round(t_call - overhead, 4),
        "gbs": round(bw_meas / 1e9, 1),
        "sol_frac": round(bw_meas / bw, 4),
    }
    bw_eff = max(bw_meas, 1.0)           # use measured BW for kernel bounds

    def entry(name, shape, t, flops, bytes_):
        bound = max(flops / peak_c64, bytes_ / bw_eff)
        out["kernels"][name] = {
            "shape": shape, "time_s": round(t, 4),
            "gflops": round(flops / t / 1e9, 1),
            "mfu": round(flops / t / peak_bf16, 4),
            "sol_frac": round(bound / t, 4),
        }

    # ---- shared QR factorization (the linear path's one O(N³) op) ----------
    Aq = cplx(jax.random.fold_in(key, 1), (n_qr, n_qr))

    @jax.jit
    def qr(a):
        def body(i, carry):
            acc, a_ = carry
            a_ = a_ * (1.0 + 1e-7)
            q, r = jnp.linalg.qr(a_)
            return acc + jnp.abs(jnp.sum(r)).real.astype(jnp.float32), a_
        acc, _ = jax.lax.fori_loop(0, _R_QR, body, (f32z, a))
        return acc

    t = _timeit(qr, Aq, overhead=overhead, reps=_R_QR)
    entry("shared_qr_factor", f"{n_qr}x{n_qr} c64",
          t, (16.0 / 3.0) * n_qr ** 3, 2 * 8 * n_qr ** 2)

    # ---- batched shifted LU solve (the eig path's hot kernel) --------------
    Al = cplx(jax.random.fold_in(key, 2), (n_lu, n_lu))
    lams = cplx(jax.random.fold_in(key, 3), (k_lu,)) * 0.1
    Bv = cplx(jax.random.fold_in(key, 4), (k_lu, n_lu))
    stuck = jnp.zeros((k_lu,), jnp.int32)

    @jax.jit
    def blu(a, l, b):
        def body(i, carry):
            acc, l_ = carry
            l_ = l_ * (1.0 + 1e-5)
            W, _ = batched_shifted_solve(a, l_, stuck, 1e-12, 1.0, b,
                                         max_attempts=1)
            return acc + jnp.abs(jnp.sum(W)).real.astype(jnp.float32), l_
        acc, _ = jax.lax.fori_loop(0, _R_LU, body, (f32z, l))
        return acc

    t = _timeit(blu, Al, lams, Bv, overhead=overhead, reps=_R_LU)
    entry("batched_shifted_lu_solve", f"K={k_lu} n={n_lu} c64",
          t, k_lu * ((8.0 / 3.0) * n_lu ** 3 + 8.0 * n_lu ** 2),
          k_lu * 2 * 8 * n_lu ** 2)

    # ---- Hessenberg shifted solve (what REPLACED the batched LU on the eig
    # path): same contract as batched_shifted_lu_solve, O(N²) per candidate
    # against the shared one-time reduction ---------------------------------
    t, flops, bytes_ = _probe_hess_solve(overhead, k_lu, n_lu)
    entry("hessenberg_shifted_solve", f"K={k_lu} n={n_lu} c64",
          t, flops, bytes_)

    # ---- GMRES/population matvec (memory-bound; what ties iterations) -------
    t, flops, bytes_ = _probe_matvec(overhead, k_mv, n_mv)
    entry("population_matvec", f"K={k_mv} N={n_mv} c64", t, flops, bytes_)

    # ---- exact-slicing f64 residual (refinement's certification kernel,
    # ops/refine.py::SlicedMatrix — replaces the emulated-f64 GEMV) ----------
    t, flops, bytes_, s_a = _probe_sliced_residual(overhead, n_mv)
    entry("sliced_f64_residual",
          f"N={n_mv} f64-exact via {2 * s_a} bf16 slice-GEMMs",
          t, flops, bytes_)

    # ---- fused in-VMEM digit-extraction residual (ops/pallas/slice_residual,
    # accelerator only) — logical f64-residual flop model, triple-read bytes
    fused = _probe_fused_residual(overhead)
    if fused is not None:
        t, flops, bytes_ = fused
        entry("fused_slice_residual",
              "N=2048 in-VMEM triple (logical f64-residual flops)",
              t, flops, bytes_)

    return out


def _canary_probe_fns():
    """One cheap probe per production kernel family, at the EXACT scorecard
    shapes so measured gflops are directly comparable with the artifact's.
    Each returns (time_s, flops) or None (kernel unavailable on this
    backend)."""
    return {
        "population_matvec": lambda ov: _probe_matvec(ov)[:2],
        "hessenberg_shifted_solve": lambda ov: _probe_hess_solve(ov)[:2],
        "sliced_f64_residual": lambda ov: _probe_sliced_residual(ov)[:2],
        "fused_slice_residual": lambda ov: (
            None if (f := _probe_fused_residual(ov)) is None else f[:2]),
    }


def canary_probe(name: str, overhead: float | None = None) -> dict | None:
    """Re-run a SINGLE canary kernel probe (used by bench.py's retry: a
    drift failure is re-measured before it flips the exit code — a real
    regression fails every repeat, a noise spike does not)."""
    if overhead is None:
        overhead = _measure_overhead()
    res = _canary_probe_fns()[name](overhead)
    if res is None:
        return None
    t, flops = res
    return {"time_s": round(t, 5), "gflops": round(flops / t / 1e9, 1)}


def canary_suite() -> dict:
    """Cheap always-live kernel probes — one per production kernel family
    (VERDICT r3 #9): population matvec, Hessenberg shifted solve, exact-
    slicing f64 residual, and the fused in-VMEM digit-extraction kernel
    (accelerator only). Run per bench invocation so a kernel/toolchain
    regression cannot hide behind the cached scorecard.

    Returns ``{kernel_name: {"time_s", "gflops"}}``; the drift comparison
    against the artifact happens in bench.py (per-kernel gates calibrated
    from the artifact's ``canary_calibration`` spread, see
    :func:`calibrate_canary`)."""
    overhead = _measure_overhead()
    suite = {}
    for name, fn in _canary_probe_fns().items():
        res = fn(overhead)
        if res is None:
            continue
        t, flops = res
        suite[name] = {"time_s": round(t, 5),
                       "gflops": round(flops / t / 1e9, 1)}
    return suite


def calibrate_canary(runs: int = 3) -> dict:
    """Measure each canary probe ``runs`` times and record the run-to-run
    spread — the basis for bench.py's per-kernel drift gates (VERDICT r4
    next-round #1: 'per-kernel gates calibrated to measured variance').
    Stored in the artifact as::

        canary_calibration: {kernel: {gflops_runs: [...], median, spread}}

    ``spread`` = (max − min) / median over the runs; bench.py gates at
    max(0.20, 4·spread) capped at 0.5 against ``median``."""
    out = {}
    for name, fn in _canary_probe_fns().items():
        gfs = []
        for _ in range(runs):
            overhead = _measure_overhead()   # fresh overhead per run, like
            res = fn(overhead)               # a real bench invocation
            if res is None:
                break
            t, flops = res
            gfs.append(round(flops / t / 1e9, 1))
        if not gfs:
            continue
        med = float(np.median(gfs))
        out[name] = {"gflops_runs": gfs, "median": round(med, 1),
                     "spread": round((max(gfs) - min(gfs)) / med, 4)}
    return out


def canary(k_mv: int = 16, n_mv: int = 4096) -> dict:
    """Back-compat single-kernel probe (the round-3 canary)."""
    overhead = _measure_overhead()
    t, flops, _ = _probe_matvec(overhead, k_mv, n_mv)
    return {"kernel": "population_matvec", "time_s": round(t, 5),
            "gflops": round(flops / t / 1e9, 1)}


if __name__ == "__main__":
    print(json.dumps(scorecard(), indent=2))
