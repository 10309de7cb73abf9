"""Command-line interface (SURVEY.md §5.6 — the reference has none; its
``__main__`` scenario scripts, AMS:641-665 and K:511-593, become subcommands).

    python -m maus_tpu scenarios          # the reference's 4 demo scenarios
    python -m maus_tpu solve --n 64       # generated Ax=b
    python -m maus_tpu eig --n 8 --hermitian
    python -m maus_tpu svd --rows 5 --cols 4
    python -m maus_tpu age --cycles 5     # KAIROSAGE genesis cycles
    python -m maus_tpu bench --quick      # north-star benchmark (JSON line)
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _report_lines(rep, check=None):
    yield (f"{rep.problem_type.name}: {rep.num_distinct}/{rep.target_solutions} "
           f"distinct solutions in {rep.iterations} iterations "
           f"(energy {rep.landscape_energy:.3f})")
    for sol, res in zip(rep.solutions, rep.residuals):
        if rep.problem_type.name == "EIGENVALUE":
            yield f"  λ = {sol[0]:.6g}   residual {res:.3e}"
        elif rep.problem_type.name == "SVD":
            yield f"  σ = {sol[0]:.6g}   residual {res:.3e}"
        else:
            yield f"  ‖x‖ = {np.linalg.norm(sol[0]):.6g}   rel residual {res:.3e}"
    if check is not None:
        yield (f"  vs LAPACK truth: matched {check.matched}/{check.total_found}, "
               f"max err {check.max_abs_error:.3e}")


def _mesh_from_args(args):
    """Build a (1, model) device mesh when --mesh-model is given; the run
    then goes through the full distributed engine (column-sharded operands,
    mesh finishers) exactly as ``solve/eig/svd(mesh=...)``."""
    m = getattr(args, "mesh_model", 0) or 0
    if m <= 1:
        return None
    from maus_tpu.parallel import mesh as mesh_mod

    return mesh_mod.make_mesh(replica=1, model=m)


def _ckpt_kwargs(args):
    return dict(checkpoint_path=getattr(args, "checkpoint", None),
                resume_from=getattr(args, "resume_from", None),
                checkpoint_every=getattr(args, "checkpoint_every", None))


def cmd_solve(args):
    import maus_tpu
    from maus_tpu.problems import generators as gen
    from maus_tpu.utils import truth

    if args.ill_conditioned:
        A, b = gen.ill_conditioned_system(args.n, cond=args.cond, seed=args.seed)
    else:
        A, b = gen.well_conditioned_system(args.n, seed=args.seed)
    rep = maus_tpu.solve(A, b, tol=args.tol, max_iterations=args.iters,
                         num_candidates=args.cands, seed=args.seed,
                         mesh=_mesh_from_args(args), **_ckpt_kwargs(args))
    check = truth.compare(rep, A, b) if args.check else None
    print("\n".join(_report_lines(rep, check)))
    return 0 if rep.converged else 1


def cmd_eig(args):
    import maus_tpu
    from maus_tpu.problems import generators as gen
    from maus_tpu.utils import truth

    A = gen.laplace_like_complex(args.n, make_hermitian=args.hermitian,
                                 seed=args.seed)
    rep = maus_tpu.eig(A, tol=args.tol, max_iterations=args.iters,
                       num_candidates=args.cands, seed=args.seed,
                       mesh=_mesh_from_args(args), **_ckpt_kwargs(args))
    check = truth.compare(rep, A) if args.check else None
    print("\n".join(_report_lines(rep, check)))
    return 0 if rep.converged else 1


def cmd_svd(args):
    import maus_tpu
    from maus_tpu.problems import generators as gen
    from maus_tpu.utils import truth

    A = gen.low_rank_svd_matrix(args.rows, args.cols, target_rank=args.rank,
                                seed=args.seed)
    rep = maus_tpu.svd(A, tol=args.tol, max_iterations=args.iters,
                       num_candidates=args.cands, seed=args.seed,
                       mesh=_mesh_from_args(args), **_ckpt_kwargs(args))
    check = truth.compare(rep, A) if args.check else None
    print("\n".join(_report_lines(rep, check)))
    return 0 if rep.converged else 1


def cmd_scenarios(args):
    """The reference's 4-scenario demo suite (AMS:641-665) with pass/fail."""
    import maus_tpu
    from maus_tpu.problems import generators as gen

    results = []

    A, b = gen.dynamic_solve_system(5, t_step=19, time_max_iter=20)
    rep = maus_tpu.solve(A, b, tol=1e-7, max_iterations=50, num_candidates=15)
    results.append(("1: N=5 dynamic Ax=b", rep.num_distinct >= 1, rep))

    A = gen.laplace_like_complex(8, make_hermitian=False)
    rep = maus_tpu.eig(A, tol=1e-7, max_iterations=80, num_candidates=30)
    results.append(("2A: N=8 general eig", rep.num_distinct == 8, rep))

    A = gen.laplace_like_complex(8, make_hermitian=True)
    rep = maus_tpu.eig(A, tol=1e-7, max_iterations=50, num_candidates=30)
    results.append(("2B: N=8 Hermitian eig", rep.num_distinct == 8, rep))

    A = gen.low_rank_svd_matrix(5, 4, target_rank=2)
    rep = maus_tpu.svd(A, tol=1e-6, max_iterations=100, num_candidates=25)
    results.append(("3: 5x4 rank-2 SVD", rep.num_distinct >= 2, rep))

    ok_all = True
    for name, ok, rep in results:
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] scenario {name}: {rep.num_distinct}/"
              f"{rep.target_solutions} distinct in {rep.iterations} iters")
        ok_all &= ok
    return 0 if ok_all else 1


def cmd_bench(args):
    """Delegate to the repo-root benchmark harness (same JSON-line contract)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("maus_bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = []
    if args.quick:
        argv.append("--quick")
    if args.n:
        argv += ["--n", str(args.n)]
    old = sys.argv
    sys.argv = ["bench.py"] + argv
    try:
        return mod.main()
    finally:
        sys.argv = old


def cmd_age(args):
    from maus_tpu.age import AgeConfig, GenesisEngine, IslandAGE

    conf = AgeConfig(candidates_per_cycle=args.cands)
    if args.islands > 1:
        isl = IslandAGE(n_islands=args.islands, config=conf, seed=args.seed,
                        verbose=not args.json)
        summaries = isl.run(args.cycles)
        if args.json:
            for s in summaries:
                print(json.dumps(s))
        else:
            best = max(s["best_fitness"] for s in summaries)
            print(f"best fitness {best:.3f} across {args.islands} islands, "
                  f"library {summaries[-1]['library_total']}")
        return 0
    eng = GenesisEngine(conf, seed=args.seed, verbose=not args.json)
    summaries = eng.run(args.cycles)
    if args.json:
        for s in summaries:
            print(json.dumps(s))
    best = max(s["best_fitness"] for s in summaries)
    if not args.json:
        print(f"best fitness {best:.3f}, library {len(eng.harmonic_library)}")
        for g in eng.harmonic_library[:5]:
            print(f"  fit={g.stability:.3f}  {g.tree.to_string()[:70]}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="maus_tpu",
                                 description="TPU-native MAUS solver")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (with x64)")
    ap.add_argument("--cpu-devices", type=int, default=None, metavar="N",
                    help="with --cpu: N virtual devices (mesh runs/tests)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--tol", type=float, default=1e-8)
    common.add_argument("--iters", type=int, default=100)
    common.add_argument("--cands", type=int, default=None)
    common.add_argument("--seed", type=int, default=0)
    common.add_argument("--check", action="store_true",
                        help="compare against LAPACK truth")
    common.add_argument("--mesh-model", type=int, default=0, metavar="M",
                        help="run distributed over a (1, M) device mesh "
                             "(column-sharded operand, full engine)")
    common.add_argument("--checkpoint", default=None, metavar="PATH",
                        help="save the solver carry to PATH")
    common.add_argument("--checkpoint-every", type=int, default=None,
                        metavar="K", help="save every K iterations")
    common.add_argument("--resume-from", default=None, metavar="PATH",
                        help="resume from a carry saved by --checkpoint")

    p = sub.add_parser("solve", parents=[common])
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--ill-conditioned", action="store_true")
    p.add_argument("--cond", type=float, default=1e6)
    p.set_defaults(fn=cmd_solve)

    p = sub.add_parser("eig", parents=[common])
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--hermitian", action="store_true")
    p.set_defaults(fn=cmd_eig)

    p = sub.add_parser("svd", parents=[common])
    p.add_argument("--rows", type=int, default=5)
    p.add_argument("--cols", type=int, default=4)
    p.add_argument("--rank", type=int, default=2)
    p.set_defaults(fn=cmd_svd)

    p = sub.add_parser("scenarios")
    p.set_defaults(fn=cmd_scenarios)

    p = sub.add_parser("bench")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--n", type=int, default=None)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("age")
    p.add_argument("--cycles", type=int, default=5)
    p.add_argument("--cands", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--islands", type=int, default=1,
                   help="island-model run: N independent populations, one "
                        "batched device evaluation, ring migration")
    p.add_argument("--json", action="store_true")
    p.set_defaults(fn=cmd_age)

    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        if args.cpu_devices:
            jax.config.update("jax_num_cpu_devices", int(args.cpu_devices))
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
