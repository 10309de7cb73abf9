"""Dynamic SVD effective-rank update (VERDICT r1 #5, reference AMS:463-470).

The rank target must be re-derived from the converged σ spectrum during the
run, so a wrong initial host estimate neither stops the search early (estimate
too low) nor strands it chasing phantom triplets (estimate too high)."""
import numpy as np

import maus_tpu
from maus_tpu.core.types import ProblemType
from maus_tpu.solver.diagnose import diagnose


def _rank2_problem():
    """Exactly rank-2 (σ₃ ≈ 1e-9·σ₁, far below the 1e-4 rank cut). The stock
    generator's +1e-4 noise lifts σ₃ to ~1.3e-4·σ₁ — legitimately rank 3 by
    the cut, so it can't exercise a *wrong* host estimate."""
    rng = np.random.default_rng(0)
    u, _ = np.linalg.qr(rng.standard_normal((8, 8))
                        + 1j * rng.standard_normal((8, 8)))
    v, _ = np.linalg.qr(rng.standard_normal((6, 6))
                        + 1j * rng.standard_normal((6, 6)))
    s = np.array([5.0, 2.5, 5e-9, 2e-9, 1e-9, 1e-9])
    return (u[:, :6] * s[None, :]) @ v.conj().T


def _knowledge_with_rank(A, rank):
    kn = diagnose(A, ProblemType.SVD)
    import dataclasses
    return dataclasses.replace(kn, effective_rank=rank)


class TestDynamicRank:
    def test_estimate_too_low_still_finds_all(self):
        """Host says rank 1; the run must keep searching (target = detected+1
        until a below-cut σ converges) and find both triplets."""
        A = _rank2_problem()
        s = maus_tpu.MausSolver(A, ProblemType.SVD,
                                initial_num_candidates=12,
                                global_convergence_tol=1e-6,
                                knowledge=_knowledge_with_rank(A, 1))
        rep = s.evolve(max_iterations=80)
        sigmas = sorted((t[0] for t in rep.solutions), reverse=True)
        big = [x for x in sigmas if x > 1e-3 * sigmas[0]]
        assert len(big) == 2
        assert np.isclose(big[0], 5.0, rtol=1e-3)
        assert np.isclose(big[1], 2.5, rtol=1e-3)
        assert rep.target_solutions == 2   # final dynamic view

    def test_estimate_too_high_converges_to_true_rank(self):
        """Host says rank 5; once a below-cut σ converges the target collapses
        to the detected rank instead of stalling at 5 phantom triplets."""
        A = _rank2_problem()
        s = maus_tpu.MausSolver(A, ProblemType.SVD,
                                initial_num_candidates=12,
                                global_convergence_tol=1e-6,
                                knowledge=_knowledge_with_rank(A, 5))
        rep = s.evolve(max_iterations=80)
        assert rep.target_solutions == 2
        assert rep.num_distinct >= 2
        assert rep.converged


class TestLowRankAcceptanceScale:
    """Acceptance-scale on low-rank spectra (round-5 chip finding): the
    eig/SVD convergence bar is max(tol, floor)·scale, and a scale of
    ‖A‖_F/√min(M,N) UNDERSTATES the residual units when the spectrum is
    low-rank — measured at 4096×2048 c64 (rank-16 head, σ₁=1, fro-scale
    0.038): the σ∈[0.33, 0.8] triplets sat at 3.7-5.8e-7 (under tol, over
    the mis-scaled bar) for 90 iterations and the report missed the THREE
    LARGEST σ on chip. step_svd/step_eigen now lift the scale by
    max σ = max |uᴴAv| (a provable lower bound on ‖A‖₂ for normalized
    candidates), which recovers the true spectral scale from below.

    The defect only bites once the c64 residual floor crosses the
    mis-scaled bar (N ≳ 4096 at rank 16) — too heavy for the default CPU
    suite, so the full reproduction is env-gated; the driver-run
    benchmarks/spectral_large_probe.py SVD row pins it at scale every
    round. The cheap tests below pin the scale rule's ingredients.
    """

    def test_max_sigma_lifts_scale_monotonically(self):
        """max|σ| of normalized candidates never exceeds ‖A‖₂ (the lift is
        sound) and reaches σ₁ once any candidate aligns (the lift is tight)."""
        rng = np.random.default_rng(5)
        m, n, r = 48, 32, 4
        U, _ = np.linalg.qr(rng.standard_normal((m, m))
                            + 1j * rng.standard_normal((m, m)))
        V, _ = np.linalg.qr(rng.standard_normal((n, n))
                            + 1j * rng.standard_normal((n, n)))
        s = np.concatenate([[1.0, 0.5, 0.25, 0.125], np.full(n - r, 1e-9)])
        A = (U[:, :n] * s) @ V.conj().T
        for _ in range(20):
            u = rng.standard_normal(m) + 1j * rng.standard_normal(m)
            v = rng.standard_normal(n) + 1j * rng.standard_normal(n)
            u /= np.linalg.norm(u)
            v /= np.linalg.norm(v)
            assert abs(np.vdot(u, A @ v)) <= 1.0 + 1e-12
        # aligned candidate ⇒ the bound is attained
        assert abs(np.vdot(U[:, 0], A @ V[:, 0])) > 1.0 - 1e-10

    def test_lowrank_head_fully_found_c64(self):
        """End-to-end at a CPU-suite-budget size: every head triplet of a
        low-rank gapped spectrum is found and at tol under forced c64.
        (At this size the old scale passed too — the at-scale failure is
        pinned by the driver probe; this guards gross regressions.)"""
        import jax.numpy as jnp

        from maus_tpu.core.types import SolverConfig

        rng = np.random.default_rng(3)
        m, n, top = 384, 256, 8

        def haar(d):
            g = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
            q, rr = np.linalg.qr(g)
            dg = np.diagonal(rr)
            return q * (dg / np.abs(dg))[None, :]

        s = np.concatenate([0.8 ** np.arange(top),
                            np.logspace(-2.0, -4.0, n - top)])
        A = (haar(m)[:, :n] * s) @ haar(n).conj().T
        eps32 = float(np.finfo(np.float32).eps)
        cfg = SolverConfig(problem_type=ProblemType.SVD, num_candidates=2 * top,
                           tol=1e-6, dtype=jnp.complex64,
                           convergence_floor=float(max(50.0, np.sqrt(n))
                                                   * eps32))
        slv = maus_tpu.MausSolver(A, ProblemType.SVD, config=cfg,
                                  target_solutions=top)
        rep = slv.evolve(max_iterations=80)
        sig = [float(sol[0]) for sol in rep.solutions]
        for e in 0.8 ** np.arange(top):
            assert min(abs(e - x) for x in sig) < 1e-3, (e, sorted(sig))
