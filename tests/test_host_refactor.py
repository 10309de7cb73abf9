"""Host-mediated refactorization mode (``SolverConfig.host_refactor``).

At N ≥ ~16k the shared-factorization QR no longer compiles inside the evolve
loop's ``lax.cond`` (XLA TPU caps conditional branches at 16 MB scoped VMEM),
while the identical QR compiles fine at program top level. In host mode the
loop exits with ``carry.refactor_psi`` set instead of refactorizing in-program;
the api driver rebuilds the factorization in a standalone program and
re-enters. These tests pin the two contracts:

* the machinery actually round-trips (exit → host refactor → re-entry picks up
  exactly where the fused path would be), and
* the trajectory is identical to the in-program ``lax.cond`` path on the same
  seeds (the freeze discards the flagged iteration entirely, and the re-entered
  iteration recomputes the same diagnostics/strategy from the same carry).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maus_tpu.core.types import ProblemKnowledge, ProblemType, SolverConfig
from maus_tpu.solver import api as api_mod
from maus_tpu.solver import evolve as evolve_mod


def _ill_conditioned(n=64, kappa=1e6, seed=0):
    rng = np.random.default_rng(seed)
    U, _ = np.linalg.qr(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
    s = np.logspace(0, -np.log10(kappa), n)
    A = (U * s) @ V.conj().T
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    return A, b


def test_refactor_handoff_roundtrip():
    """Force a Ψ mismatch: the loop must exit flagged, the host resolve must
    rebuild fac at the requested Ψ, and re-entry must complete the run."""
    A, b = _ill_conditioned()
    cfg = SolverConfig(problem_type=ProblemType.SOLVE_LINEAR_SYSTEM,
                       num_candidates=8, tol=1e-8, host_refactor=True)
    s = api_mod.MausSolver(A, ProblemType.SOLVE_LINEAR_SYSTEM, b_vector=b,
                           config=cfg, seed=1)
    kn, key = s.knowledge, s._key
    carry0 = evolve_mod.init_carry(cfg, kn, s.A, key)
    # sabotage the cached Ψ so iteration 0's rung comparison fails
    bad = carry0._replace(psi_cached=jnp.asarray(0.0, jnp.float32))
    carry, _ = evolve_mod.evolve_while(cfg, kn, s.A, s.b, key, 50, 1,
                                       carry0=bad)
    # the loop must have exited immediately, asking the host for a rebuild
    assert int(carry.iteration) == 0
    rp = float(carry.refactor_psi)
    assert rp > 0.0
    fixed = s._resolve_refactor(carry)
    assert fixed is not None
    assert float(fixed.refactor_psi) == 0.0
    assert float(fixed.psi_cached) == rp
    # re-entry completes the run and never asks again (Ψ stays on its rung)
    carry2, _ = evolve_mod.evolve_while(cfg, kn, s.A, s.b, key, 50, 1,
                                        carry0=fixed)
    assert float(carry2.refactor_psi) == 0.0
    assert int(carry2.iteration) > 0


@pytest.mark.parametrize("collect_metrics", [False, True])
def test_trajectory_parity_with_fused_path(collect_metrics):
    """host_refactor=True must reproduce the lax.cond path's trajectory
    exactly: same iteration count, same final residuals, same solution."""
    A, b = _ill_conditioned()
    reports = {}
    for hr in (False, True):
        cfg = SolverConfig(problem_type=ProblemType.SOLVE_LINEAR_SYSTEM,
                           num_candidates=8, tol=1e-8, host_refactor=hr)
        s = api_mod.MausSolver(A, ProblemType.SOLVE_LINEAR_SYSTEM,
                               b_vector=b, config=cfg, seed=3)
        reports[hr] = s.evolve(60, collect_metrics=collect_metrics)
    r0, r1 = reports[False], reports[True]
    assert r0.iterations == r1.iterations
    assert r0.num_distinct == r1.num_distinct
    assert len(r0.residuals) == len(r1.residuals)
    for a, c in zip(r0.residuals, r1.residuals):
        assert a == pytest.approx(c, rel=1e-6, abs=1e-14)
    if r0.solutions:
        x0, x1 = r0.solutions[0][0], r1.solutions[0][0]
        assert np.allclose(x0, x1, rtol=1e-7, atol=1e-12)
    if collect_metrics:
        m0, m1 = r0.metrics, r1.metrics
        assert m0 is not None and m1 is not None
        np.testing.assert_allclose(np.asarray(m0["num_distinct"]),
                                   np.asarray(m1["num_distinct"]))


def test_scan_hosted_chunk_stitching():
    """Force a refactor on the scan path's very first iteration: the stitched
    metrics must contain exactly num_iterations rows with the executed rows
    first (no frozen zero-rows interleaved before real ones)."""
    A, b = _ill_conditioned()
    cfg = SolverConfig(problem_type=ProblemType.SOLVE_LINEAR_SYSTEM,
                       num_candidates=8, tol=1e-8, host_refactor=True,
                       capture_history=True)
    s = api_mod.MausSolver(A, ProblemType.SOLVE_LINEAR_SYSTEM, b_vector=b,
                           config=cfg, seed=1)
    carry0 = evolve_mod.init_carry(cfg, s.knowledge, s.A, s._key)
    bad = carry0._replace(psi_cached=jnp.asarray(0.0, jnp.float32))
    num_iters = 12
    carry, metrics = s._scan_hosted(num_iters, bad)
    assert float(carry.refactor_psi) == 0.0
    rows = np.asarray(metrics.num_distinct)
    assert rows.shape[0] == num_iters
    # the run executed some iterations: landscape energy of executed rows is
    # non-zero while frozen rows (if any, at the END only) are exactly zero
    executed = np.asarray(metrics.avg_residual) != 0.0
    ran = int(carry.iteration)
    assert ran > 0
    assert bool(executed[:ran].all())


def test_auto_enable_policy():
    """host_refactor=None resolves to a concrete bool at construction; small
    problems on CPU never enable it."""
    A, b = _ill_conditioned(n=32)
    s = api_mod.MausSolver(A, ProblemType.SOLVE_LINEAR_SYSTEM, b_vector=b,
                           seed=0)
    assert s.config.host_refactor is False
