"""Benchmark harness — the north-star metric (BASELINE.md / BASELINE.json):

    time-to-tol ‖Ax−b‖/‖b‖ ≤ 1e-8 on a 4096² ill-conditioned dense complex system,
    full candidate-population sweep, vs the SciPy reference modeled on CPU.

Prints ONE JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

``vs_baseline`` models the reference's cost for the same work honestly and
conservatively: the reference performs one LAPACK ``sla.solve`` per candidate per
iteration (AMS:224-225, AMS:59 — no factorization reuse); its modeled time is
(measured scipy c128 solve time at N) × (population size) × (our iteration count,
i.e. granting the reference our own convergence speed, which it does not have —
SURVEY.md §0.1 measured it never converging at all).

Usage:  python bench.py [--quick] [--n N] [--cands K]
"""
import argparse
import json
import sys
import time

import numpy as np


def _device_problem(n: int, cond: float, dtype, seed: int = 0):
    """Generate the controlled-κ system ON DEVICE (host QR at 4096² costs minutes;
    TPU QR costs seconds). A = Q1 · diag(logspace) · Q2ᴴ, b random."""
    import jax
    import jax.numpy as jnp

    k1, k2, k3, k4, kb = jax.random.split(jax.random.PRNGKey(seed), 5)
    rdt = jnp.float32 if dtype == jnp.complex64 else jnp.float64

    def qhaar(ka, kb_):
        # lax.complex keeps the pair in c64 — "re + 1j*im" promotes through c128,
        # which does not exist on TPU
        g = jax.lax.complex(jax.random.normal(ka, (n, n), rdt),
                            jax.random.normal(kb_, (n, n), rdt)).astype(dtype)
        q, r = jnp.linalg.qr(g)
        d = jnp.diagonal(r)
        return q * (d / jnp.abs(d))[None, :]

    q1 = qhaar(k1, k2)
    q2 = qhaar(k3, k4)
    s = jnp.logspace(0.0, -np.log10(cond), n, dtype=rdt).astype(dtype)
    A = (q1 * s[None, :]) @ q2.conj().T
    b = jax.lax.complex(
        jax.random.normal(kb, (n,), rdt),
        jax.random.normal(jax.random.fold_in(kb, 1), (n,), rdt)).astype(dtype)
    return A, b


# Measured c128 scipy.linalg.solve per-solve times on this host (2026-08-16,
# OpenBLAS, median of 2-3 reps; see BASELINE.md "Measured SciPy/LAPACK
# per-solve floor"). Round 1 modeled 4096 from 1024×(4³) = 13.95 s; the direct
# measurement is 11.01 s, so using these is strictly more conservative.
_SCIPY_SOLVE_MEASURED = {1024: 0.218, 2048: 1.371, 4096: 11.010}


def _measure_scipy_solve(n_model: int, n_target: int) -> float:
    """Per-solve LAPACK time at n_target: measured value when recorded,
    otherwise nearest measured size scaled by the O(N³) flop ratio, otherwise
    measured live at n_model and scaled."""
    if n_target in _SCIPY_SOLVE_MEASURED:
        return _SCIPY_SOLVE_MEASURED[n_target]
    anchor = min(_SCIPY_SOLVE_MEASURED, key=lambda n: abs(n - n_target))
    if 0.25 <= n_target / anchor <= 4.0:
        return _SCIPY_SOLVE_MEASURED[anchor] * (n_target / anchor) ** 3
    import scipy.linalg as sla

    rng = np.random.default_rng(0)
    A = rng.standard_normal((n_model, n_model)) \
        + 1j * rng.standard_normal((n_model, n_model))
    b = rng.standard_normal(n_model) + 0j
    sla.solve(A, b)                       # warm BLAS threads
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        sla.solve(A, b)
    t_model = (time.perf_counter() - t0) / reps
    return t_model * (n_target / n_model) ** 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="N=512 smoke config")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--cands", type=int, default=16)
    ap.add_argument("--cond", type=float, default=1e6)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--no-mfu", action="store_true",
                    help="skip the per-kernel MFU/roofline scorecard")
    args = ap.parse_args()

    import os
    import threading

    import jax

    jax.config.update("jax_enable_x64", True)   # f64 for split-residual refinement

    # Fail FAST (with a parseable JSON line) instead of hanging forever when
    # the TPU tunnel is down: backend initialization on this runtime blocks
    # indefinitely if the relay died (observed 2026-08-17), and a silent hang
    # gives the driver nothing to record.
    _backend_up = threading.Event()

    def _watchdog():
        if not _backend_up.wait(600):
            print(json.dumps({
                "metric": "bench_backend_init_timeout",
                "value": -1, "unit": "s", "vs_baseline": 0.0,
                "error": "TPU backend initialization exceeded 600s — "
                         "tunnel/relay down?"}), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    from maus_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()              # first backend touch
    _backend_up.set()
    import jax.numpy as jnp

    from maus_tpu.core.types import (ProblemKnowledge, ProblemType, SolverConfig)
    from maus_tpu.ops.batched_solve import shared_factor
    from maus_tpu.ops.refine import SplitComplex, refine_split
    from maus_tpu.solver import evolve as ev

    n = args.n or (512 if args.quick else 4096)
    K = args.cands
    tol = args.tol
    dtype = jnp.complex64
    eps = float(np.finfo(np.float32).eps)

    A, b = _device_problem(n, args.cond, dtype)
    jax.block_until_ready(A)

    # c64 convergence floor for this κ (refinement closes the rest, see ops/refine)
    floor = max(50 * eps, 2 * eps * args.cond)
    # N ≥ ~16k: the in-loop QR refactorization exceeds XLA's 16 MB scoped-VMEM
    # cap for lax.cond branches — host-mediated refactorization instead
    # (SolverConfig.host_refactor; mirrors the MausSolver auto rule)
    host_mode = n >= 12288 and jax.default_backend() != "cpu"
    cfg = SolverConfig(problem_type=ProblemType.SOLVE_LINEAR_SYSTEM,
                       num_candidates=K, tol=tol, dtype=dtype,
                       convergence_floor=floor, refine=True, max_refine_steps=60,
                       host_refactor=host_mode)
    kn = ProblemKnowledge(shape=(n, n), cond_estimate=args.cond)
    key = jax.random.PRNGKey(1)
    max_iters = 50

    import functools

    # Refinement path A/B, decided on hardware: the hi-only-triple path
    # (refine_split_c64exact) beat the widened-plane ladder at the headline
    # config in BOTH on-chip A/Bs (r4: 0.103 vs 0.107 s; r5 re-confirmed the
    # ladder at 0.1072 s) — it skips the per-solve ladder extraction (~4 ms
    # at 4096²) at the cost of per-cert VPU digit re-extraction, and the
    # bench operand is c64-exact so both certify the same residual. The
    # hi-only path is therefore the DEFAULT; MAUS_BENCH_LADDER=1 restores
    # the widened-plane ladder for re-A/Bing.
    import os as _os
    c64exact_mode = _os.environ.get("MAUS_BENCH_LADDER") != "1"

    if not host_mode:
        from maus_tpu.ops.refine import refine_split_c64exact

        A64 = None if c64exact_mode else SplitComplex(
            A.real.astype(jnp.float64), A.imag.astype(jnp.float64))
        b64 = SplitComplex(b.real.astype(jnp.float64),
                           b.imag.astype(jnp.float64))

        @functools.partial(jax.jit, static_argnames=("steps",))
        def _solve_fused(A_, b_, key_, A64_, b64_, steps, tol_):
            # the ENTIRE solve — evolve to the c64 floor, best-candidate
            # selection, split-f64 refinement — as ONE device program: every
            # separate program call costs a ~30 ms dispatch RPC on this backend
            carry, _ = ev.evolve_while(cfg, kn, A_, b_, key_, max_iters, 1)
            pop = carry.pop
            best = jnp.argmin(jnp.where(jnp.isfinite(pop.residual),
                                        pop.residual, jnp.inf))
            if A64_ is None:
                xs, rel = refine_split_c64exact(A_, carry.fac, b64_,
                                                pop.v[best], steps=steps,
                                                tol=tol_)
            else:
                xs, rel = refine_split(A64_, carry.fac, b64_, pop.v[best],
                                       steps=steps, tol=tol_)
            return xs, rel, carry.iteration

        def full_solve():
            xs, rel, iters = _solve_fused(A, b, key, A64, b64,
                                          cfg.max_refine_steps, tol * 0.3)
            return rel, iters
    else:
        # host-refactor driving (two programs + host resolution loop). The
        # bench operand is c64-exact, so refinement runs the hi-only-triple
        # path (refine_split_c64exact): no f64 planes — HBM at 16k is
        # A 2.1 + Q,R 4.3 + hi triple 2.1 ≈ 8.7 GB (the full-triple path
        # would need ~17 GB and OOMs)
        from maus_tpu.ops.refine import refine_split_c64exact
        from maus_tpu.solver import api as api_mod

        b64 = SplitComplex(b.real.astype(jnp.float64),
                           b.imag.astype(jnp.float64))

        # carry0 DONATED: without it the program holds input + loop + output
        # copies of the Q,R factors (3 × 4.3 GB at 16k) and overflows HBM
        @functools.partial(jax.jit, donate_argnums=(3,))
        def _evolve(A_, b_, key_, carry0):
            carry, _ = ev.evolve_while(cfg, kn, A_, b_, key_, max_iters, 1,
                                       carry0=carry0)
            pop = carry.pop
            best = jnp.argmin(jnp.where(jnp.isfinite(pop.residual),
                                        pop.residual, jnp.inf))
            return carry, pop.v[best]

        @functools.partial(jax.jit, static_argnames=("steps",))
        def _refine_prog(A_, fac, b64_, x0, steps, tol_):
            return refine_split_c64exact(A_, fac, b64_, x0, steps=steps,
                                         tol=tol_)

        def full_solve():
            # init_carry as its own program: inlining the large QR into the
            # while-loop program (double-buffered Q,R carry) overflows HBM
            carry0 = ev.init_carry(cfg, kn, A, key)
            while True:
                carry, x0 = _evolve(A, b, key, carry0)
                nxt = api_mod.resolve_refactor_carry(A, carry)
                if nxt is None:
                    break
                carry0 = nxt
            # factors as f32 planes, complex originals released — a c64 jit
            # argument is materialized twice at 16k (ops/refine.FacPlanes)
            from maus_tpu.ops.refine import fac_to_planes
            facp = fac_to_planes(carry.fac)
            for leaf in jax.tree.leaves(carry.fac):
                leaf.delete()
            xs, rel = _refine_prog(A, facp, b64, x0,
                                   cfg.max_refine_steps, tol * 0.3)
            return rel, carry.iteration

    # warmup (compile); then timed run. NOTE: timing fences with a host value
    # fetch (float()) — on this backend block_until_ready alone does not
    # guarantee the remote execution has finished.
    rel, iters = full_solve()
    _ = float(rel)
    # best-of-3 timed repeats: the solve is deterministic (fixed PRNG key →
    # identical trajectory), so min() rejects dispatch/RPC noise without
    # changing what is measured — the r4 driver capture drifted 7% run-to-run
    # on a single-shot timing of this same program
    elapsed = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        rel, iters = full_solve()
        rel_f = float(rel)
        elapsed = min(elapsed, time.perf_counter() - t0)

    iters_f = int(iters)
    ok = rel_f <= tol

    # reference model: K LAPACK solves per iteration, our iteration count.
    # t_solve is MEASURED at bench sizes (BASELINE.md round-2 table).
    t_solve = _measure_scipy_solve(min(1024, n), n)
    ref_time = t_solve * K * max(iters_f, 1)

    result = {
        "metric": f"time_to_tol({tol:g}) N={n} illcond(k={args.cond:g}) "
                  f"pop={K} [achieved_rel={rel_f:.2e}{'' if ok else ' MISS'}]",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(ref_time / elapsed, 2) if elapsed > 0 else 0.0,
        # candidate-population solves/sec (BASELINE.md throughput metric):
        # every candidate consumes one regularized solve per iteration
        "solves_per_s": round(K * max(iters_f, 1) / elapsed, 1)
        if elapsed > 0 else 0.0,
    }
    if not args.no_mfu and not args.quick:
        import os
        import pathlib
        import sys as _sys
        _sys.path.insert(0, str(pathlib.Path(__file__).parent))
        # The full scorecard costs ~8 min of remote compiles — more than the
        # headline bench itself. Unless MAUS_BENCH_MFU=1 forces a live run,
        # load the committed measured artifact for this chip (numbers are
        # stable run-to-run; provenance stamped inside).
        sc = None
        from_cache = False
        cache_path = pathlib.Path(__file__).parent / "benchmarks" / \
            "mfu_v5e.json"
        if os.environ.get("MAUS_BENCH_MFU") != "1" and cache_path.exists():
            cached = json.loads(cache_path.read_text())
            if cached.get("device_kind") == jax.devices()[0].device_kind:
                sc = cached
                from_cache = True
        if sc is None:
            from benchmarks.mfu import scorecard

            sc = scorecard()
        result["mfu"] = {
            "device": sc["device_kind"],
            "peak_bf16_tflops": sc["peak_bf16_tflops"],
            # provenance: cached=True means the per-kernel numbers below were
            # NOT measured by this run (artifact stamped measured_at); the
            # canary block below is always live
            "cached": from_cache,
            "measured_at": sc.get("measured_at", "live"),
            "git_sha": sc.get("git_sha", "unknown"),
            "kernels": {k: {"gflops": v.get("gflops", v.get("gbs")),
                            "mfu": v.get("mfu"),
                            "sol_frac": v.get("sol_frac")}
                        for k, v in sc["kernels"].items()},
        }
        if from_cache:
            # always-live canary SUITE (VERDICT r3 #9): re-measure one cheap
            # probe per production kernel family and fail the bench if ANY
            # drifts beyond its gate — a regression in any kernel must not
            # sail through behind cached numbers. Round-5 robustness
            # (VERDICT r4 #1 — the r4 capture flipped rc=1 on probe noise):
            # the reference value is the artifact's canary_calibration median
            # (measured by the SAME probe code), the gate is calibrated to
            # that kernel's measured run-to-run spread (max(0.20, 4·spread),
            # capped 0.5), and a failing kernel is re-probed up to 2 more
            # times — a real regression fails every repeat, a noise spike
            # does not. Probes without an artifact entry yet are reported
            # but not gated.
            from benchmarks.mfu import canary_probe, canary_suite

            calib = sc.get("canary_calibration", {})
            live = canary_suite()
            kernels = {}
            all_ok = True
            for name, probe in live.items():
                cal = calib.get(name, {})
                ref_gf = cal.get("median") or \
                    sc["kernels"].get(name, {}).get("gflops")
                gate = min(max(0.20, 4.0 * cal.get("spread", 0.0)), 0.5)
                attempts = [probe["gflops"]]
                drift = (abs(probe["gflops"] - ref_gf) / ref_gf
                         if ref_gf else None)
                k_ok = drift is None or drift <= gate
                while not k_ok and len(attempts) < 3:
                    re_probe = canary_probe(name)
                    if re_probe is None:
                        break
                    attempts.append(re_probe["gflops"])
                    drift = abs(re_probe["gflops"] - ref_gf) / ref_gf
                    k_ok = drift <= gate
                kernels[name] = {
                    "live_gflops": attempts[-1], "cached_gflops": ref_gf,
                    "drift": round(drift, 4) if drift is not None else None,
                    "gate": round(gate, 4), "attempts": len(attempts),
                    "ok": k_ok,
                }
                all_ok = all_ok and k_ok
            result["mfu"]["canary"] = {"kernels": kernels, "ok": all_ok}
            ok = ok and all_ok
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
