"""On-chip A/B: blocked partially-pivoted LU (ops/blocked_lu.py) vs the
shared QR factorization it would replace.

What the shared factorization costs today: XLA's QR at ~46% of the c64
roofline (its sequential panel factorization is compiler-internal), at 2× an
LU's flops. XLA's OWN LU is not a contender — its scoped-VMEM pivot panel
breaches the 16 MB cap at N≥8192 unbatched (probed round 4) and its backward
error is bf16-grade. The from-scratch LU is all HIGHEST-precision GEMMs plus
one explicit panel loop; complex LU = (8/3)N³ real FLOPs vs QR's (16/3)N³.

Per size, one JSON line with:
  - amortized factor time: QR (jnp.linalg.qr) vs factor_lu
  - solve quality on the bench κ=1e6 operand: relative residual of one
    direct solve from each factorization (backward-error check)
  - IR convergence: refine_split_ir steps/residual with each factorization
    as the correction solver (the production refinement contract)

Usage: python -u benchmarks/lu_probe.py [--sizes 2048,4096] [--reps 4]
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,4096")
    ap.add_argument("--cond", type=float, default=1e6)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import pathlib
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from bench import _device_problem
    from maus_tpu.ops.blocked_lu import (factor_lu, factor_rbt_lu, solve_lu,
                                         solve_rbt_lu)
    from maus_tpu.ops.batched_solve import factor_qr, solve_qr
    from maus_tpu.ops.refine import SplitComplex, refine_gmres, refine_split
    from maus_tpu.utils.compile_cache import enable as enable_cache
    from benchmarks.mfu import _fence_time, _measure_overhead

    enable_cache()
    dtype = jnp.complex64 if jax.default_backend() != "cpu" else jnp.complex128
    overhead = _measure_overhead()
    print(json.dumps({"metric": "dispatch overhead", "s": round(overhead, 4)}),
          flush=True)

    for n in [int(s) for s in args.sizes.split(",") if s]:
        A, b = _device_problem(n, args.cond, dtype)
        A = jax.block_until_ready(A)
        R = args.reps

        # --- amortized factorization timing: R data-chained reps in ONE
        # program (εI nudge defeats CSE), ~30 ms dispatch measured+subtracted
        def qr_chain(a):
            acc = jnp.zeros((), jnp.float32)
            for i in range(R):
                q, r = jnp.linalg.qr(a + (1e-7 * (i + 1)) * jnp.eye(n, dtype=a.dtype))
                acc = acc + jnp.abs(r[0, 0]).astype(jnp.float32)
            return acc

        def rbt_chain(a):
            acc = jnp.zeros((), jnp.float32)
            for i in range(R):
                fac = factor_rbt_lu(
                    a + (1e-7 * (i + 1)) * jnp.eye(n, dtype=a.dtype),
                    block=args.block)
                acc = acc + jnp.abs(fac.lu[0, 0]).astype(jnp.float32)
            return acc

        t_qr = max((_fence_time(jax.jit(qr_chain), A) - overhead) / R, 1e-9)
        t_rbt = max((_fence_time(jax.jit(rbt_chain), A) - overhead) / R, 1e-9)

        # --- solve quality (backward error at the bench κ) ----------------
        # everything under jit: eager complex ops can crash on this backend
        fac_qr = jax.jit(lambda a: factor_qr(a, with_rinv=False))(A)
        fac_rbt = jax.jit(lambda a: factor_rbt_lu(a, block=args.block))(A)

        @jax.jit
        def rel_resid(x, a, bb):
            r = bb - x @ a.T
            return (jnp.linalg.norm(r) / jnp.linalg.norm(bb)).real

        x_qr = jax.jit(solve_qr)(fac_qr, b)
        x_rbt = jax.jit(solve_rbt_lu)(fac_rbt, b)
        rq = float(rel_resid(x_qr, A, b))
        rl = float(rel_resid(x_rbt, A, b))

        # --- IR convergence with each factorization as correction solver --
        rdt = jnp.float64
        A_split = SplitComplex(*jax.jit(
            lambda a: (a.real.astype(rdt), a.imag.astype(rdt)))(A))
        b_split = SplitComplex(*jax.jit(
            lambda v: (v.real.astype(rdt), v.imag.astype(rdt)))(b))

        out = {"metric": f"rbt_vs_qr N={n}", "factor_qr_s": round(t_qr, 4),
               "factor_rbt_s": round(t_rbt, 4),
               "speedup": round(t_qr / t_rbt, 2),
               "solve_rel_qr": rq, "solve_rel_rbt": rl}
        for name, fac, x0 in (("qr", fac_qr, x_qr), ("rbt", fac_rbt, x_rbt)):
            t0 = time.perf_counter()
            xs, rel = refine_split(A_split, fac, b_split, x0,
                                   steps=12, tol=1e-9)
            rel = float(rel)
            out[f"ir_{name}_rel"] = rel
            out[f"ir_{name}_s"] = round(time.perf_counter() - t0, 3)
            if rel > 1e-8:
                # production contract: plain-IR stall escalates to GMRES-IR
                # with the factorization as preconditioner
                t0 = time.perf_counter()
                xs2, rel2 = refine_gmres(A_split, fac, b_split,
                                         xs.to_complex(A.dtype), steps=8,
                                         tol=1e-9)
                out[f"gmres_ir_{name}_rel"] = float(rel2)
                out[f"gmres_ir_{name}_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
