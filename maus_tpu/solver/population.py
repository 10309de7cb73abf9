"""Population management — retire / prune / respawn as masked slot reuse.

Reference (``_manage_candidates``, AMS:504-549) mutates a Python list: sorts by
(−weight, residual), retires converged duplicates, prunes weak/stuck candidates, and
appends newly spawned ``SolutionCandidate`` objects. With a fixed-capacity SoA the
same lifecycle is pure masked arithmetic: duplicates/prunees flip to RETIRED, and
respawning re-initializes RETIRED slots in place (warm-started near a converged
solution when the landscape is calm, AMS:539-546).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.types import (CandidateStatus, Population, ProblemType, SolverConfig,
                          StrategyState)
from .strategy import Diagnostics


def manage(cfg: SolverConfig, pop: Population, strat: StrategyState,
           diag: Diagnostics, target_solutions: int,
           lam_scale=1.0, lam_center=0.0) -> Population:
    K = pop.capacity
    rdt = cfg.real_dtype
    lam_scale = jnp.asarray(lam_scale, rdt)

    # 1) retire converged duplicates (keep the per-class leader) — AMS:507-521
    status = jnp.where(diag.duplicate, jnp.int8(CandidateStatus.RETIRED), pop.status)

    # 2) prune: weight below floor or stuck at cap, unless converged — AMS:523
    conv = status == CandidateStatus.CONVERGED
    prune = (~conv) & ((pop.weight < cfg.min_weight) |
                       (pop.stuck >= cfg.max_stuck_for_retirement))
    status = jnp.where(prune, jnp.int8(CandidateStatus.RETIRED), status)

    # 3) spawn budget (AMS:528-534): restore population toward the desired size plus
    # one fresh explorer per missing distinct solution, scaled by the spawn rate.
    retired = status == CandidateStatus.RETIRED
    n_alive = K - jnp.sum(retired)
    desired = K  # fixed capacity IS the desired population in the SoA design
    target_eff = diag.target_dynamic \
        if cfg.problem_type == ProblemType.SVD else target_solutions
    missing = jnp.maximum(target_eff - diag.num_distinct, 0)
    want = jnp.maximum(desired - n_alive, 0) + missing
    want = (want.astype(jnp.float32) * strat.spawn_rate).astype(jnp.int32)
    n_spawn = jnp.minimum(want, jnp.sum(retired))

    # choose the first n_spawn retired slots (rank by cumulative count)
    rank = jnp.cumsum(retired.astype(jnp.int32)) - 1
    respawn = retired & (rank < n_spawn)

    # 4) re-initialize respawned slots
    keys, use_v = rng.split_batch(pop.keys)
    keys, use_pick = rng.split_batch(keys)
    keys, use_lam = rng.split_batch(keys)

    n = pop.v.shape[1]
    fresh_v = rng.normal_like_batch(use_v, (n,), cfg.dtype)
    fresh_v = fresh_v / jnp.linalg.norm(fresh_v, axis=-1, keepdims=True)

    if cfg.problem_type == ProblemType.EIGENVALUE:
        # Warm start near a randomly chosen converged solution when the landscape is
        # calm (AMS:539-546); otherwise fully random.
        leader_w = diag.distinct_leader.astype(jnp.float32)
        have_leader = jnp.sum(leader_w) > 0
        logits = jnp.where(diag.distinct_leader, 0.0, -jnp.inf)

        def pick_one(k):
            return jax.random.categorical(jax.random.wrap_key_data(k), logits)

        picked = jax.vmap(pick_one)(use_pick)                     # (K,) indices
        picked = jnp.where(have_leader, picked, 0)
        base_v = pop.v[picked]                                    # (K, N)
        base_lam = pop.lam[picked]
        scale = (0.1 + diag.landscape_energy).astype(rdt)
        keys, use_noise_v = rng.split_batch(keys)
        noise_v = rng.normal_like_batch(use_noise_v, (n,), cfg.dtype) * scale * 0.1
        warm_v = base_v + noise_v
        warm_v = warm_v / jnp.maximum(jnp.linalg.norm(warm_v, axis=-1, keepdims=True),
                                      jnp.finfo(rdt).tiny)
        noise_lam = rng.normal_like_batch(use_lam, (), cfg.dtype).reshape(K) \
            * scale * 0.05
        warm_lam = base_lam + noise_lam
        # Exploration half: fresh shifts over the spectral scale, REPELLED from
        # eigenvalues already claimed by leaders — the reference's warm-start-only
        # respawn (AMS:539-546) clusters new candidates onto found solutions and
        # never covers the rest of the spectrum.
        keys, use_fresh_lam = rng.split_batch(keys)
        fresh_lam = rng.normal_like_batch(use_fresh_lam, (), cfg.dtype).reshape(K) \
            * lam_scale.astype(cfg.dtype) + jnp.asarray(lam_center, cfg.dtype)
        lam_claimed = jnp.where(diag.distinct_leader, pop.lam,
                                jnp.asarray(jnp.inf, cfg.dtype))
        min_dist = jnp.min(jnp.abs(fresh_lam[:, None] - lam_claimed[None, :]),
                           axis=-1)
        too_close = min_dist < 0.05 * lam_scale
        keys, use_rep = rng.split_batch(keys)
        bump = rng.normal_like_batch(use_rep, (), cfg.dtype).reshape(K)
        bump = bump / jnp.maximum(jnp.abs(bump), 1e-30) * 0.2 \
            * lam_scale.astype(cfg.dtype)
        fresh_lam = jnp.where(too_close, fresh_lam + bump, fresh_lam)
        # fresh explorers start deflated against claimed eigendirections —
        # a ONE-TIME projection at respawn (projecting every iteration
        # destabilizes the Rayleigh dynamics; measured) so inverse iteration
        # initially amplifies unclaimed components
        Vc = pop.v * diag.distinct_leader.astype(cfg.dtype)[:, None]
        coeff = jnp.conj(Vc) @ fresh_v.T                          # (K, K)
        fresh_defl = fresh_v - coeff.T @ Vc
        nrm = jnp.linalg.norm(fresh_defl, axis=-1, keepdims=True)
        fresh_v = jnp.where(nrm > 1e-6, fresh_defl / jnp.maximum(nrm, 1e-30),
                            fresh_v)
        # alternate respawns between warm-start refiners and fresh explorers
        slot_parity = (jnp.arange(K) % 2) == 0
        use_warm = have_leader & (diag.landscape_energy < 0.8) & slot_parity
        new_v = jnp.where(use_warm[:, None], warm_v, fresh_v)
        new_lam = jnp.where(use_warm, warm_lam, fresh_lam)
    else:
        new_v = fresh_v
        new_lam = jnp.ones((K,), cfg.dtype) if cfg.problem_type == ProblemType.SVD \
            else jnp.zeros((K,), cfg.dtype)

    new_u = None
    if pop.u is not None:
        m = pop.u.shape[1]
        keys, use_u = rng.split_batch(keys)
        new_u = rng.normal_like_batch(use_u, (m,), cfg.dtype)
        new_u = new_u / jnp.linalg.norm(new_u, axis=-1, keepdims=True)

    # spawned α gets the aggression boost (AMS:548), capped at 1
    spawn_alpha = jnp.minimum(cfg.alpha_initial * (1.0 + strat.psi_aggression / 10.0),
                              1.0).astype(rdt)

    r = respawn
    rc = r[:, None]
    return Population(
        v=jnp.where(rc, new_v, pop.v),
        u=None if pop.u is None else jnp.where(rc, new_u, pop.u),
        lam=jnp.where(r, new_lam, pop.lam),
        weight=jnp.where(r, jnp.asarray(0.01, rdt), pop.weight),
        alpha=jnp.where(r, spawn_alpha, pop.alpha),
        stuck=jnp.where(r, 0, pop.stuck),
        status=jnp.where(r, jnp.int8(CandidateStatus.EXPLORING), status),
        residual=jnp.where(r, jnp.asarray(jnp.inf, rdt), pop.residual),
        prev_residual=jnp.where(r, jnp.asarray(jnp.inf, rdt), pop.prev_residual),
        psi_level=jnp.where(r, 0, pop.psi_level),
        keys=keys,
        retire_count=jnp.where(r, pop.retire_count + 1, pop.retire_count))
