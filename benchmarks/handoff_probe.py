"""Force host-refactor handoffs on hardware (VERDICT r4 #6).

The round-4 16384² run completed with ZERO handoffs, so the host-rebuild-and-
re-enter protocol (`api.resolve_refactor_carry`) had never fired on a chip.
Probing WHY showed high κ alone cannot fire it: the convergence floor scales
as 2·ε·κ (the c64-achievable residual for a random rhs), so harder problems
exit the evolve phase EARLIER, and a backward-stable QR never returns
non-finite iterates on finite input — the frustration ladder (which mirrors
the reference's retry-on-LinAlgError escalation, AMS:44/98-102) has nothing
to ratchet on. The production trigger that genuinely needs the ladder is a
**declared-HPD operand with a small indefinite defect**: the shared Cholesky
factorization of A + ΨI is NaN until Ψ exceeds |λ_min|, every candidate solve
fails, frustration ratchets the Ψ rung each iteration (one host handoff per
rung in host_refactor mode), and after three bad steps the engine fails over
to GMRES on the Ψ-shifted system (reference M3e) and converges; the rung then
decays back down — more handoffs — and split-f64 refinement meets the
tolerance contract on the indefinite operand.

Operand: Q diag(s) Qᴴ with s = logspace(0,-6) and s[-1] flipped NEGATIVE
(λ_min = −1e-6·‖A‖₂ exactly, Hermitian by construction, fully on-device —
no host eigendecomposition at large N). rhs b = A·x_true so the system is
consistent and the 1e-8 contract is meaningful.

Prints one JSON line; rc=0 iff ≥1 handoff fired AND the refined residual
meets tol.

Run: python benchmarks/handoff_probe.py [--n 12288]
"""
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12288)
    ap.add_argument("--cands", type=int, default=16)
    ap.add_argument("--tol", type=float, default=1e-8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import pathlib
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from maus_tpu.core.types import (ProblemKnowledge, ProblemType,
                                     SolverConfig)
    from maus_tpu.solver import api as api_mod
    from maus_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    n, K, tol = args.n, args.cands, args.tol
    eps = float(np.finfo(np.float32).eps)
    cond = 1e6

    print(f"[handoff probe] generating N={n} indefinite-defect Hermitian "
          f"operand on device...", flush=True)

    @jax.jit
    def make_problem(key):
        k1, k2, kb1, kb2 = jax.random.split(key, 4)
        g = jax.lax.complex(jax.random.normal(k1, (n, n), jnp.float32),
                            jax.random.normal(k2, (n, n), jnp.float32))
        q, r = jnp.linalg.qr(g.astype(jnp.complex64))
        d = jnp.diagonal(r)
        q = q * (d / jnp.abs(d))[None, :]
        s = jnp.logspace(0.0, -np.log10(cond), n, dtype=jnp.float32)
        s = s.at[-1].set(-1.0 / cond)      # the indefinite defect
        A = (q * s[None, :].astype(jnp.complex64)) @ q.conj().T
        A = (A + A.conj().T) / 2
        xt = jax.lax.complex(jax.random.normal(kb1, (n,), jnp.float32),
                             jax.random.normal(kb2, (n,), jnp.float32))
        xt = (xt / jnp.linalg.norm(xt)).astype(jnp.complex64)
        return A, (A @ xt).astype(jnp.complex64)

    with jax.default_matmul_precision("highest"):
        A, b = make_problem(jax.random.PRNGKey(0))
    jax.block_until_ready(A)

    # the HOST's (wrong) belief: Hermitian positive definite — the shared
    # factorization routes to Cholesky, which is exactly what the defect breaks
    kn = ProblemKnowledge(shape=(n, n), cond_estimate=cond,
                          is_hermitian=True, is_positive_definite=True)
    cfg = SolverConfig(problem_type=ProblemType.SOLVE_LINEAR_SYSTEM,
                       num_candidates=K, tol=tol, dtype=jnp.complex64,
                       psi_base=1e-12,
                       convergence_floor=max(50 * eps, 2 * eps * cond),
                       refine=True, max_refine_steps=60, host_refactor=True)

    # count handoffs through the SAME resolver the production driver uses
    handoffs = []
    orig = api_mod.resolve_refactor_carry

    def counting(Aop, carry, hpd=False):
        out = orig(Aop, carry, hpd=hpd)
        if out is not None:
            handoffs.append((int(carry.iteration),
                             float(carry.refactor_psi)))
            print(f"  handoff #{len(handoffs)}: psi -> "
                  f"{handoffs[-1][1]:.3e} at iter {handoffs[-1][0]}",
                  flush=True)
        return out

    api_mod.resolve_refactor_carry = counting
    try:
        solver = api_mod.MausSolver(A, ProblemType.SOLVE_LINEAR_SYSTEM,
                                    b_vector=b, config=cfg, knowledge=kn,
                                    seed=1)
        t0 = time.perf_counter()
        rep = solver.evolve(max_iterations=80)
        elapsed = time.perf_counter() - t0
    finally:
        api_mod.resolve_refactor_carry = orig

    rel = rep.residuals[0] if rep.residuals else float("inf")
    out = {"metric": f"host-refactor handoff N={n} indefinite-HPD "
                     f"[achieved_rel={rel:.2e}{'' if rel <= tol else ' MISS'}]",
           "value": round(elapsed, 3), "unit": "s",
           "handoffs": len(handoffs),
           "psi_trajectory": [f"{p:.3e}" for _, p in handoffs],
           "iters": rep.iterations, "converged": rep.converged}
    print(json.dumps(out))
    return 0 if (handoffs and rel <= tol) else 1


if __name__ == "__main__":
    raise SystemExit(main())
