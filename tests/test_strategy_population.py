"""Unit tests for the strategy layer (dedup registry, landscape energy, regimes —
M5d/M5e) and population management (retire/prune/respawn — M5f)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from maus_tpu.core.types import (CandidateStatus, ProblemType, SolverConfig,
                                 SolverPreference, StabilityState, initial_strategy,
                                 ProblemKnowledge)
from maus_tpu.solver import candidate as cand
from maus_tpu.solver import population as popmgmt
from maus_tpu.solver import strategy as strat_mod


def _mk(cfg, n=8, key=0):
    return cand.init_population(cfg, jax.random.PRNGKey(key), (n, n))


def _strat(cfg, kn=None):
    return initial_strategy(cfg, kn or ProblemKnowledge(shape=(8, 8)))


class TestDedup:
    def test_eigen_duplicates_counted_once(self):
        cfg = SolverConfig(problem_type=ProblemType.EIGENVALUE, num_candidates=6,
                           dtype=jnp.complex128)
        pop = _mk(cfg)
        v = np.zeros((6, 8), np.complex128)
        v[:3, 0] = 1.0          # candidates 0-2: same eigenvector
        v[3:, 1] = 1.0          # candidates 3-5: another eigenvector
        lam = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 9.0], np.complex128)
        status = np.full(6, int(CandidateStatus.CONVERGED), np.int8)
        # realistic CONVERGED residuals: tiny, so the residual-aware λ band
        # (strategy._pairwise_same) stays far below the class separations —
        # a "converged" candidate with residual ~5 would genuinely be
        # indistinguishable from its neighbors (backward error 5)
        pop = dataclasses.replace(
            pop, v=jnp.asarray(v), lam=jnp.asarray(lam),
            status=jnp.asarray(status),
            residual=jnp.asarray(np.arange(6, dtype=np.float64) * 1e-9))
        d = strat_mod.compute_diagnostics(cfg, pop, _strat(cfg), 8)
        # classes: {0,1,2} (λ=1, same vec), {3,4} (λ=2, same vec), {5} (λ=9)
        assert int(d.num_distinct) == 3
        # leaders are the lowest-residual member of each class
        assert bool(d.distinct_leader[0]) and bool(d.distinct_leader[3]) \
            and bool(d.distinct_leader[5])
        assert bool(d.duplicate[1]) and bool(d.duplicate[2]) and bool(d.duplicate[4])

    def test_linear_single_solution_class(self):
        cfg = SolverConfig(problem_type=ProblemType.SOLVE_LINEAR_SYSTEM,
                           num_candidates=4, tol=1e-8, dtype=jnp.complex128)
        pop = _mk(cfg)
        x = np.tile(np.arange(8.0), (4, 1)).astype(np.complex128)
        x[3] += 1.0   # far away
        pop = dataclasses.replace(
            pop, v=jnp.asarray(x),
            status=jnp.full((4,), int(CandidateStatus.CONVERGED), jnp.int8),
            residual=jnp.asarray([0.1, 0.2, 0.3, 0.4]))
        d = strat_mod.compute_diagnostics(cfg, pop, _strat(cfg), 1)
        assert int(d.num_distinct) == 2  # the three identical + the offset one


class TestRegimes:
    def test_critical_regime_escalates(self):
        cfg = SolverConfig()
        strat = _strat(cfg)
        diag = strat_mod.Diagnostics(
            distinct_leader=jnp.zeros(4, bool), duplicate=jnp.zeros(4, bool),
            num_distinct=jnp.asarray(0), avg_residual=jnp.asarray(10.0, jnp.float32),
            avg_stuckness=jnp.asarray(6.0, jnp.float32),
            landscape_energy=jnp.asarray(0.9, jnp.float32),
            stability=jnp.asarray(int(StabilityState.CRITICAL), jnp.int32),
            target_dynamic=jnp.asarray(1, jnp.int32))
        out = strat_mod.adjust_strategy(cfg, strat, diag)
        assert float(out.psi_aggression) > float(strat.psi_aggression)
        # solver preference is failover-driven, not regime-forced (see strategy.py)
        assert int(out.solver_pref) == int(strat.solver_pref)
        assert float(out.threshold) >= float(strat.threshold)

    def test_stable_regime_relaxes(self):
        cfg = SolverConfig()
        strat = _strat(cfg)
        strat = dataclasses.replace(
            strat, psi_aggression=jnp.asarray(10.0, jnp.float32),
            threshold=jnp.asarray(1e-4, jnp.float32),
            solver_pref=jnp.asarray(int(SolverPreference.GMRES), jnp.int32))
        diag = strat_mod.Diagnostics(
            distinct_leader=jnp.zeros(4, bool), duplicate=jnp.zeros(4, bool),
            num_distinct=jnp.asarray(1), avg_residual=jnp.asarray(0.0, jnp.float32),
            avg_stuckness=jnp.asarray(0.0, jnp.float32),
            landscape_energy=jnp.asarray(0.1, jnp.float32),
            stability=jnp.asarray(int(StabilityState.STABLE), jnp.int32),
            target_dynamic=jnp.asarray(1, jnp.int32))
        out = strat_mod.adjust_strategy(cfg, strat, diag)
        assert float(out.psi_aggression) < 10.0
        assert float(out.threshold) < 1e-4
        # preference untouched by regimes (failover-driven; see strategy.py)
        assert int(out.solver_pref) == int(SolverPreference.GMRES)

    def test_initial_strategy_from_conditioning(self):
        cfg = SolverConfig()
        crit = initial_strategy(cfg, ProblemKnowledge(shape=(8, 8),
                                                      cond_estimate=1e13))
        frag = initial_strategy(cfg, ProblemKnowledge(shape=(8, 8),
                                                      cond_estimate=1e7))
        stab = initial_strategy(cfg, ProblemKnowledge(shape=(8, 8),
                                                      cond_estimate=10.0))
        # DIRECT everywhere for dense nonsingular (deviation from AMS:407-416 —
        # see initial_strategy); GMRES only for singular linear systems
        assert int(crit.solver_pref) == int(SolverPreference.DIRECT)
        assert float(crit.psi_aggression) == 50.0
        assert int(frag.solver_pref) == int(SolverPreference.DIRECT)
        assert int(stab.solver_pref) == int(SolverPreference.DIRECT)
        assert np.isclose(float(stab.threshold), cfg.tol)  # f32 storage
        sing = initial_strategy(
            cfg, ProblemKnowledge(shape=(8, 8), cond_estimate=float('inf'),
                                  is_singular=True))
        assert int(sing.solver_pref) == int(SolverPreference.GMRES)


class TestPopulationManagement:
    def test_prune_weak_and_stuck(self):
        cfg = SolverConfig(num_candidates=6, dtype=jnp.complex128)
        pop = _mk(cfg)
        pop = dataclasses.replace(
            pop,
            weight=jnp.asarray([1.0, 1e-12, 1.0, 1.0, 1.0, 1.0]),
            stuck=jnp.asarray([0, 0, 9, 0, 0, 0], jnp.int32))
        strat = _strat(cfg)
        diag = strat_mod.compute_diagnostics(cfg, pop, strat, 1)
        out = popmgmt.manage(cfg, pop, strat, diag, 1)
        status = np.asarray(out.status)
        # weak (1) and stuck (2) slots were retired AND respawned in place:
        # they must be fresh EXPLORING slots with bumped retire_count
        rc = np.asarray(out.retire_count)
        assert rc[1] == 1 and rc[2] == 1
        assert status[1] == int(CandidateStatus.EXPLORING)
        assert np.all(rc[[0, 3, 4, 5]] == 0)

    def test_duplicate_retirement_keeps_leader(self):
        cfg = SolverConfig(problem_type=ProblemType.EIGENVALUE, num_candidates=4,
                           dtype=jnp.complex128)
        pop = _mk(cfg)
        v = np.zeros((4, 8), np.complex128)
        v[:, 0] = 1.0
        pop = dataclasses.replace(
            pop, v=jnp.asarray(v),
            lam=jnp.asarray(np.ones(4, np.complex128)),
            status=jnp.full((4,), int(CandidateStatus.CONVERGED), jnp.int8),
            residual=jnp.asarray([0.3, 0.1, 0.2, 0.4]))
        strat = _strat(cfg)
        diag = strat_mod.compute_diagnostics(cfg, pop, strat, 8)
        out = popmgmt.manage(cfg, pop, strat, diag, 8)
        status = np.asarray(out.status)
        # best-residual candidate (index 1) stays CONVERGED; others recycled
        assert status[1] == int(CandidateStatus.CONVERGED)
        assert np.asarray(out.retire_count)[[0, 2, 3]].min() >= 1

    def test_respawn_preserves_capacity_invariant(self):
        cfg = SolverConfig(num_candidates=8, dtype=jnp.complex128)
        pop = _mk(cfg)
        pop = dataclasses.replace(
            pop, status=jnp.full((8,), int(CandidateStatus.RETIRED), jnp.int8))
        strat = _strat(cfg)
        diag = strat_mod.compute_diagnostics(cfg, pop, strat, 1)
        out = popmgmt.manage(cfg, pop, strat, diag, 1)
        assert out.v.shape == (8, 8)
        # every respawned vector is unit-norm
        norms = np.linalg.norm(np.asarray(out.v), axis=-1)
        respawned = np.asarray(out.retire_count) > 0
        assert np.allclose(norms[respawned], 1.0, atol=1e-6)
