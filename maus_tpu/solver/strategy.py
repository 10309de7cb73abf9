"""Global diagnostics + strategy adaptation — the reference's
``_update_global_diagnostics`` (AMS:424-475) and ``_adjust_global_strategy``
(AMS:477-501) rebuilt as pure batched functions.

The O(pop²) distinct-solution registry (Python loops over ``converged_solutions`` in
the reference) becomes one K×K masked Gram matrix: a single batched inner-product
contraction + boolean reductions, `psum`-able when the population axis is sharded.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import (CandidateStatus, Population, ProblemType, SolverConfig,
                          SolverPreference, StabilityState, StrategyState)


class Diagnostics(NamedTuple):
    distinct_leader: jax.Array    # (K,) bool — converged AND first of its duplicate class
    duplicate: jax.Array          # (K,) bool — converged but redundant (to retire, M5f)
    num_distinct: jax.Array       # scalar i32
    avg_residual: jax.Array       # scalar f32 (over non-converged active, AMS:454-458)
    avg_stuckness: jax.Array      # scalar f32
    landscape_energy: jax.Array   # scalar f32 (AMS:459-472)
    stability: jax.Array          # scalar i32 (AMS:473-475)
    target_dynamic: jax.Array     # scalar i32 — SVD: rank re-estimated from the
                                  # converged σ spectrum (AMS:463-470); other
                                  # problem types: the static target


def _pairwise_same(cfg: SolverConfig, pop: Population) -> jax.Array:
    """K×K boolean 'same solution' matrix per the reference similarity rules:

    * eig: |Δλ| < λ_tol + |λ|·1e-6 AND |⟨v,v'⟩| > 0.999      (AMS:435-437)
    * linear: ‖Δx‖ < 100·tol (all converged x are 'the' solution, AMS:438-440)
    * SVD: |Δσ| < max(abs_tol, σ·rel_tol) AND u,v similar      (AMS:441-452)
    """
    gram_v = jnp.abs(jnp.conj(pop.v) @ pop.v.T)                  # (K, K) |⟨v_i,v_j⟩|
    # Residual-aware λ/σ band: two backward-stable approximations of the SAME
    # eigenpair/triplet differ in their value estimate by up to ~κ·(r_i + r_j)
    # (Bauer–Fike). At f64 residuals this adds nothing (the reference absolute
    # thresholds dominate); at the c64 convergence floor the value noise is
    # ~residual-sized — WITHOUT the band, duplicates of one true eigenpair
    # look distinct (Δλ ≈ 1e-4 > 1e-5), never get retired/respawned, and the
    # distinct count silently over-reports (exposed by the f64 finisher
    # collapsing them). The vector-overlap factor keeps genuinely clustered
    # spectra unmerged: distinct eigenvectors stay far from 0.999 overlap.
    r_eff = jnp.where(jnp.isfinite(pop.residual), pop.residual, 0.0)
    band = (4.0 * (r_eff[:, None] + r_eff[None, :]))
    if cfg.problem_type == ProblemType.EIGENVALUE:
        dlam = jnp.abs(pop.lam[:, None] - pop.lam[None, :])
        tol = cfg.lambda_similarity_tol + jnp.abs(pop.lam)[None, :] * 1e-6 \
            + band
        return (dlam < tol) & (gram_v > cfg.vector_similarity_tol)
    if cfg.problem_type == ProblemType.SOLVE_LINEAR_SYSTEM:
        # ‖x_i − x_j‖² = n_i + n_j − 2·Re G_ij via one K×K Gram — the
        # (K, K, N) pairwise-difference tensor this replaces materialized
        # K²N complex temporaries per iteration (~134 MB at K=16, N=65536)
        nrm2 = jnp.sum(jnp.abs(pop.v) ** 2, axis=-1).real
        G = (jnp.conj(pop.v) @ pop.v.T).real
        d2 = jnp.maximum(nrm2[:, None] + nrm2[None, :] - 2.0 * G, 0.0)
        return d2 < (cfg.tol * 100) ** 2
    # SVD
    sig = pop.lam.real
    dsig = jnp.abs(sig[:, None] - sig[None, :])
    tol = jnp.maximum(cfg.sigma_similarity_abs, sig[None, :] * cfg.sigma_similarity_rel) \
        + band
    gram_u = jnp.abs(jnp.conj(pop.u) @ pop.u.T)
    return (dsig < tol) & (gram_u > cfg.vector_similarity_tol) & \
           (gram_v > cfg.vector_similarity_tol)


def compute_diagnostics(cfg: SolverConfig, pop: Population, strat: StrategyState,
                        target_solutions: int) -> Diagnostics:
    K = pop.capacity
    conv = pop.status == CandidateStatus.CONVERGED
    retired = pop.status == CandidateStatus.RETIRED
    nonconv_active = ~conv & ~retired

    same = _pairwise_same(cfg, pop)

    # Leader election among converged duplicates, SEQUENTIAL in priority
    # order (lowest residual first, ties by slot index) — the reference's
    # registry semantics (AMS:507-521): a candidate is a leader iff it is not
    # similar to any ALREADY-ACCEPTED leader. The earlier "beaten by any
    # better similar candidate" rule was not transitive: with same(a,b) and
    # same(b,c) but not same(a,c) (borderline bands), c was beaten by the
    # non-leader b and a genuinely distinct solution got retired.
    prio = jnp.where(jnp.isfinite(pop.residual), pop.residual, jnp.inf)
    idx = jnp.arange(K)
    order = jnp.lexsort((idx, jnp.where(conv, prio, jnp.inf)))

    def accept(leader_mask, i):
        dup = jnp.any(same[i] & leader_mask)
        is_leader = conv[i] & ~dup
        return leader_mask.at[i].set(is_leader), None

    leader, _ = jax.lax.scan(accept, jnp.zeros((K,), bool), order)
    # similarity duplicates (retirement candidates) — decided BEFORE the SVD
    # tiny-σ exclusion below: a tiny-σ leader is excluded from the COUNT but
    # is not a duplicate to retire
    duplicate = conv & ~leader
    if cfg.problem_type == ProblemType.SVD:
        # σ below rel-tol × the largest σ in play doesn't count as a distinct
        # triplet (AMS:443-445) — unless it is a genuine null vector (σ == 0,
        # which the reference's zero-SV branch also treats as a solution)
        sig = pop.lam.real
        max_sig = jnp.maximum(jnp.max(jnp.where(conv, sig, 0.0)), 1e-30)
        tiny = (sig < max_sig * cfg.sigma_similarity_rel) & (sig > 0.0)
        leader = leader & ~tiny
    num_distinct = jnp.sum(leader).astype(jnp.int32)

    # Dynamic SVD effective-rank target (AMS:463-470): the reference re-derives
    # the rank from the converged σ spectrum every iteration. Until a
    # below-cut σ converges (= the spectrum's noise floor has been reached),
    # assume at least one more triplet exists; once found, the target IS the
    # detected rank, which drives early stop with the correct count even when
    # the initial host estimate was wrong.
    if cfg.problem_type == ProblemType.SVD:
        cap = min(pop.capacity, pop.u.shape[1], pop.v.shape[1])
        sig = pop.lam.real
        smax_l = jnp.max(jnp.where(leader, sig, 0.0))
        have = smax_l > 0.0
        cut = smax_l * cfg.rank_rel_cut
        rank_det = jnp.sum(leader & (sig > cut)).astype(jnp.int32)
        floor_found = jnp.any(conv & (sig < cut))
        tgt = jnp.where(floor_found, rank_det,
                        jnp.minimum(rank_det + 1, cap))
        target_dynamic = jnp.where(have, tgt, strat.target_dynamic) \
            .astype(jnp.int32)
    else:
        target_dynamic = jnp.asarray(target_solutions, jnp.int32)

    # population averages over non-converged, non-retired (AMS:454-458); non-finite
    # residuals count as 100× the current threshold, as in the reference.
    res_eff = jnp.where(jnp.isfinite(pop.residual), pop.residual,
                        strat.threshold * 100.0)
    denom = jnp.maximum(jnp.sum(nonconv_active), 1)
    avg_res = jnp.sum(jnp.where(nonconv_active, res_eff, 0.0)) / denom
    avg_stuck = jnp.sum(jnp.where(nonconv_active, pop.stuck, 0)).astype(jnp.float32) \
        / denom

    # landscape energy (AMS:459-472); 'missing' counts against the dynamic
    # target so a corrected rank estimate immediately relaxes the energy
    norm_missing = jnp.maximum(target_dynamic - num_distinct, 0) \
        .astype(jnp.float32) / jnp.maximum(target_dynamic, 1).astype(jnp.float32)
    norm_res = avg_res / (strat.threshold * 10.0)
    norm_stuck = avg_stuck / (cfg.max_stuck_for_retirement * 2.0)
    energy = jnp.clip(0.4 * norm_res + 0.3 * norm_stuck + 0.3 * norm_missing, 0.0, 1.0)

    # stability reclassification from stuckness (AMS:473-475)
    stability = jnp.where(
        avg_stuck > cfg.max_stuck_for_retirement * 0.5,
        jnp.int32(StabilityState.CRITICAL),
        jnp.where(avg_stuck > cfg.max_stuck_for_pruning * 0.5,
                  jnp.int32(StabilityState.FRAGILE),
                  jnp.int32(StabilityState.STABLE)))

    return Diagnostics(distinct_leader=leader, duplicate=duplicate,
                       num_distinct=num_distinct,
                       avg_residual=avg_res.astype(jnp.float32),
                       avg_stuckness=avg_stuck.astype(jnp.float32),
                       landscape_energy=energy.astype(jnp.float32),
                       stability=stability, target_dynamic=target_dynamic)


def adjust_strategy(cfg: SolverConfig, strat: StrategyState,
                    diag: Diagnostics) -> StrategyState:
    """The three-regime controller (AMS:477-501), as traced ``where`` selects.

    Regimes: high energy + Critical → escalate (GMRES, Ψ×1.1≤200, spawn×1.2≤10,
    threshold×1.05 ≥50·tol); mid energy + Fragile → mild escalation; low energy +
    Stable → relax back toward direct solves and the base tolerance.
    """
    energy, stab = diag.landscape_energy, diag.stability
    hot = (energy > 0.6) & (stab == StabilityState.CRITICAL)
    warm = (energy > 0.4) & (stab == StabilityState.FRAGILE) & ~hot
    cool = (energy < 0.2) & (stab == StabilityState.STABLE)

    psi = strat.psi_aggression
    spawn = strat.spawn_rate
    thr = strat.threshold
    tol = jnp.asarray(cfg.tol, jnp.float32)

    psi = jnp.where(hot, jnp.minimum(200.0, psi * 1.1),
          jnp.where(warm, jnp.minimum(50.0, psi * 1.05),
          jnp.where(cool, jnp.maximum(1.0, psi * 0.9), psi)))
    spawn = jnp.where(hot, jnp.minimum(10.0, spawn * 1.2),
            jnp.where(warm, jnp.minimum(5.0, spawn * 1.1),
            jnp.where(cool, jnp.maximum(0.01, spawn * 0.9), spawn)))
    thr = jnp.where(hot, jnp.maximum(tol * 50.0, thr * 1.05),
          jnp.where(warm, jnp.maximum(tol * 5.0, thr * 1.02),
          jnp.where(cool, jnp.maximum(tol, thr * 0.9), thr)))
    # Solver preference is NOT regime-forced (deviation from AMS:480-497 — see
    # initial_strategy): the direct↔iterative switch is failure-driven failover,
    # handled in the evolve loop from per-step regression statistics.
    pref = strat.solver_pref

    # final clamps (AMS:498-501)
    psi = jnp.clip(psi, 1.0, 200.0)
    spawn = jnp.clip(spawn, 0.01, 10.0)
    thr = jnp.clip(thr, tol, 1.0)

    return dataclasses.replace(
        strat, psi_aggression=psi, spawn_rate=spawn, threshold=thr,
        solver_pref=pref, stability=diag.stability,
        landscape_energy=diag.landscape_energy, avg_residual=diag.avg_residual,
        avg_stuckness=diag.avg_stuckness, num_distinct=diag.num_distinct,
        target_dynamic=diag.target_dynamic)
