"""Eig-path benchmark: direct (shared-Hessenberg shifted solves) vs
matrix-free iterative (Jacobi–Davidson projected GMRES) — VERDICT r1 #7's
"GMRES eig time-to-tol within 3× of direct at N=1024, measured".

Both branches run through the SAME evolve loop; only the initial
``solver_pref`` differs (production reaches the iterative branch via
failover). Timing is fenced by fetching a real scalar metric.

Usage: python -m benchmarks.eig_paths [--n 1024] [--cands 16] [--target 6]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--cands", type=int, default=16)
    ap.add_argument("--target", type=int, default=6)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from maus_tpu.core.types import (ProblemKnowledge, ProblemType,
                                     SolverConfig, SolverPreference,
                                     initial_strategy)
    from maus_tpu.solver import evolve as ev

    n, k = args.n, args.cands
    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    A = jax.lax.complex(jax.random.normal(ka, (n, n), jnp.float32),
                        jax.random.normal(kb, (n, n), jnp.float32)) \
        / jnp.sqrt(jnp.asarray(float(n), jnp.float32)).astype(jnp.complex64)
    cfg = SolverConfig(problem_type=ProblemType.EIGENVALUE, num_candidates=k,
                       tol=1e-4, dtype=jnp.complex64, convergence_floor=2e-6,
                       refine=False, target_num_solutions=args.target)
    kn = ProblemKnowledge(shape=(n, n), cond_estimate=100.0)

    def run(pref):
        carry0 = ev.init_carry(cfg, kn, A, jax.random.PRNGKey(1))
        strat = dataclasses.replace(
            carry0.strat,
            solver_pref=jnp.asarray(int(pref), jnp.int32))
        carry0 = carry0._replace(strat=strat)
        # warm/compile
        carry, m = ev.evolve_while(cfg, kn, A, None, jax.random.PRNGKey(1),
                                   args.iters, args.target, carry0=carry0)
        _ = float(m.min_residual)
        t0 = time.perf_counter()
        carry, m = ev.evolve_while(cfg, kn, A, None, jax.random.PRNGKey(1),
                                   args.iters, args.target, carry0=carry0)
        nd = int(carry.strat.num_distinct)      # fences
        dt = time.perf_counter() - t0
        return dt, nd, int(carry.iteration), float(m.min_residual)

    t_dir, nd_dir, it_dir, r_dir = run(SolverPreference.DIRECT)
    t_jd, nd_jd, it_jd, r_jd = run(SolverPreference.GMRES)
    print(json.dumps({
        "n": n, "cands": k, "target": args.target,
        "direct_hessenberg": {"s": round(t_dir, 3), "distinct": nd_dir,
                              "iters": it_dir, "min_res": r_dir},
        "jacobi_davidson_gmres": {"s": round(t_jd, 3), "distinct": nd_jd,
                                  "iters": it_jd, "min_res": r_jd},
        "jd_over_direct": round(t_jd / max(t_dir, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
