"""TPU hardware tier (VERDICT r1 #4): c64 numerics on the real chip.

Run with::

    MAUS_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu.py -q

Every test here exercises behavior the CPU tier structurally cannot: c64
convergence floors, the complex host-boundary shims, split-f64 refinement on
emulated f64, and checkpointing device-resident complex state. Shapes are
deliberately few and reused — remote compiles cost 20-120 s each.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() in ("cpu", "gpu"),
                       reason="requires the TPU backend "
                              "(MAUS_TPU_TESTS=1 pytest -m tpu)"),
]

N = 64          # the tier's single square shape — reused to bound compiles
K = 8


def _host_problem(seed=0, cond=100.0):
    rng = np.random.default_rng(seed)
    q1, _ = np.linalg.qr(rng.standard_normal((N, N))
                         + 1j * rng.standard_normal((N, N)))
    q2, _ = np.linalg.qr(rng.standard_normal((N, N))
                         + 1j * rng.standard_normal((N, N)))
    s = np.logspace(0, -np.log10(cond), N)
    A = (q1 * s[None, :]) @ q2.conj().T
    b = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    return A, b


class TestXfer:
    def test_complex_roundtrip(self):
        from maus_tpu.utils.xfer import to_device_complex, to_host_complex

        z = (np.arange(2 * N, dtype=np.float64)
             + 1j * np.arange(2 * N, dtype=np.float64)[::-1]).reshape(2, N)
        zd = to_device_complex(z, jnp.complex64)
        assert zd.dtype == jnp.complex64
        zh = to_host_complex(zd)
        np.testing.assert_allclose(zh, z.astype(np.complex64), rtol=0, atol=0)


class TestLinearFloor:
    def test_solve_reaches_1e8_via_refinement(self):
        import maus_tpu
        from maus_tpu.core.types import ProblemType

        A, b = _host_problem(seed=0, cond=1e3)
        s = maus_tpu.MausSolver(A, ProblemType.SOLVE_LINEAR_SYSTEM, b_vector=b,
                                initial_num_candidates=K)
        rep = s.evolve(max_iterations=40)
        assert rep.converged
        assert rep.residuals[0] <= 1e-8
        # the refined solution must actually solve the ORIGINAL host system
        x = rep.solutions[0][0]
        rel = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
        assert rel <= 1e-8


class TestEigFloor:
    def test_hermitian_eig_reaches_1e8(self):
        import maus_tpu
        from maus_tpu.core.types import ProblemType

        rng = np.random.default_rng(1)
        B = rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
        Ah = (B + B.conj().T) / 2
        s = maus_tpu.MausSolver(Ah, ProblemType.EIGENVALUE,
                                initial_num_candidates=2 * K,
                                global_convergence_tol=1e-8)
        rep = s.evolve(max_iterations=40)
        assert rep.num_distinct >= K          # capacity-bounded coverage
        anorm = float(np.linalg.norm(Ah, 2))
        assert max(rep.residuals) <= 1e-8 * max(anorm, 1.0)
        w_true = np.linalg.eigvalsh(Ah)
        for lam, _v in rep.solutions:
            assert np.min(np.abs(w_true - lam)) < 1e-6 * anorm


class TestGeneralEig:
    def test_nonhermitian_eig_hessenberg_path(self):
        """Non-Hermitian eig through the production path: shared Hessenberg
        reduction + the Pallas Givens kernel (N=128, K=16 hits the kernel's
        dispatch window), finished to 1e-8 by the Newton refiner."""
        import maus_tpu
        from maus_tpu.core.types import ProblemType, SolverConfig

        rng = np.random.default_rng(7)
        n = 128
        A = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
        cfg = SolverConfig(problem_type=ProblemType.EIGENVALUE,
                           num_candidates=16, tol=1e-8, dtype=jnp.complex64,
                           convergence_floor=5e-6,
                           target_num_solutions=4)
        s = maus_tpu.MausSolver(A, ProblemType.EIGENVALUE, config=cfg)
        rep = s.evolve(max_iterations=60)
        assert rep.num_distinct >= 4
        w_true = np.linalg.eigvals(A)
        anorm = float(np.abs(w_true).max())
        assert max(rep.residuals) <= 1e-8 * max(anorm, 1.0) * 10
        for lam, _v in rep.solutions:
            assert np.min(np.abs(w_true - lam)) < 1e-5 * anorm


class TestSvdFloor:
    def test_svd_reaches_1e6(self):
        import maus_tpu
        from maus_tpu.core.types import ProblemType
        from maus_tpu.problems import generators as gen

        A = np.asarray(gen.low_rank_svd_matrix(5, 4, seed=0))
        s = maus_tpu.MausSolver(A, ProblemType.SVD, initial_num_candidates=12,
                                global_convergence_tol=1e-6)
        rep = s.evolve(max_iterations=60)
        sig = sorted((t[0] for t in rep.solutions), reverse=True)
        assert np.isclose(sig[0], 5.0, rtol=1e-4)
        assert np.isclose(sig[1], 2.5, rtol=1e-4)
        big = [r for sol, r in zip(rep.solutions, rep.residuals)
               if sol[0] > 1e-3]
        assert max(big) <= 1e-6


class TestSharedEigh:
    def test_eigh_accuracy_on_chip(self):
        """XLA eigh in c64 at HIGHEST matmul precision vs f64 host oracle."""
        from maus_tpu.solver.hermitian import eigh_setup
        from maus_tpu.utils.xfer import to_device_complex, to_host_complex

        rng = np.random.default_rng(2)
        B = rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
        Ah = (B + B.conj().T) / 2
        cache = eigh_setup(to_device_complex(Ah, jnp.complex64))
        w = np.asarray(cache.w)
        V = to_host_complex(cache.V)
        w_true = np.linalg.eigvalsh(Ah)
        anorm = float(np.abs(w_true).max())
        assert np.max(np.abs(np.sort(w) - w_true)) < 5e-5 * anorm
        r = Ah @ V - V * w[None, :]
        assert np.max(np.linalg.norm(r, axis=0)) < 5e-5 * anorm


class TestCheckpointOnChip:
    def test_roundtrip_with_complex_device_state(self, tmp_path):
        """save/load of the full carry (complex population + factors) through
        the split-plane shim — the r1 ADVICE-high crash scenario."""
        import maus_tpu
        from maus_tpu.core.types import ProblemType
        from maus_tpu.solver import evolve as ev
        from maus_tpu.utils import checkpoint

        A, b = _host_problem(seed=3, cond=10.0)
        s = maus_tpu.MausSolver(A, ProblemType.SOLVE_LINEAR_SYSTEM, b_vector=b,
                                initial_num_candidates=K)
        cfg, kn = s.config, s.knowledge

        # A/b must be jit ARGUMENTS: closing over complex device arrays embeds
        # them as constants, which needs a complex host materialization this
        # runtime cannot do
        @jax.jit
        def step(A_, b_, carry_):
            return ev.make_iteration(cfg, kn, A_, b_, None, 1)(carry_)

        carry = ev.init_carry(cfg, kn, s.A, s._key)
        carry, _ = step(s.A, s.b, carry)
        path = str(tmp_path / "tpu_ckpt.npz")
        n_leaves = checkpoint.save_state(path, carry)
        assert n_leaves > 5
        template = ev.init_carry(cfg, kn, s.A, s._key)
        loaded = checkpoint.load_state(path, template)
        ref, _ = step(s.A, s.b, carry)
        res, _ = step(s.A, s.b, loaded)
        # fence through a real-valued reduction computed inside jit
        d = jax.jit(lambda a, b: jnp.sum(jnp.abs(a.pop.v - b.pop.v)))(ref, res)
        assert float(d) == 0.0

        # round-4 resume path: the ABSTRACT (eval_shape) template must
        # restore identically on the chip — complex leaves still route
        # through the split-plane shim, no factorization paid for the template
        template2 = jax.eval_shape(
            lambda a, k_: ev.init_carry(cfg, kn, a, k_), s.A, s._key)
        loaded2 = checkpoint.load_state(path, template2)
        res2, _ = step(s.A, s.b, loaded2)
        d2 = jax.jit(lambda a, b: jnp.sum(jnp.abs(a.pop.v - b.pop.v)))(ref,
                                                                       res2)
        assert float(d2) == 0.0


class TestCondProbe:
    def test_device_cond_estimate_on_chip(self):
        from maus_tpu.solver.diagnose import estimate_cond_device
        from maus_tpu.utils.xfer import to_device_complex

        A, _ = _host_problem(seed=4, cond=1e4)
        c = estimate_cond_device(to_device_complex(A, jnp.complex64))
        assert 2e3 <= c <= 5e4


class TestRefineSplit:
    def test_ir_reaches_1e10_on_emulated_f64(self):
        from maus_tpu.ops.batched_solve import shared_factor_qr
        from maus_tpu.ops.refine import SplitComplex, refine_split
        from maus_tpu.utils.xfer import to_device_complex

        A, b = _host_problem(seed=5, cond=1e3)
        Ad = to_device_complex(A, jnp.complex64)
        fac = shared_factor_qr(Ad, 1e-18)
        A64 = SplitComplex(jnp.asarray(A.real), jnp.asarray(A.imag))
        b64 = SplitComplex(jnp.asarray(b.real), jnp.asarray(b.imag))
        x0 = to_device_complex(np.zeros_like(b), jnp.complex64)
        xs, rel = refine_split(A64, fac, b64, x0, steps=30, tol=1e-12)
        assert float(rel) < 1e-10


class TestHostRefactorOnChip:
    """Round-3 machinery on real hardware: host-mediated refactorization and
    the c64-exact hi-only fused refinement path (the 16k enablers), exercised
    at the tier's small shape — same code paths, bounded compile cost."""

    def test_host_refactor_solve(self):
        import maus_tpu
        from maus_tpu.core.types import ProblemType, SolverConfig

        A, b = _host_problem(seed=7, cond=1e3)
        cfg = SolverConfig(problem_type=ProblemType.SOLVE_LINEAR_SYSTEM,
                           num_candidates=K, tol=1e-8,
                           convergence_floor=1e-4, host_refactor=True)
        s = maus_tpu.MausSolver(A, ProblemType.SOLVE_LINEAR_SYSTEM,
                                b_vector=b, config=cfg)
        rep = s.evolve(40)
        assert rep.residuals and rep.residuals[0] < 1e-8

    def test_c64exact_hi_only_refinement(self):
        """refine_split_c64exact on chip: hi-only digit triple, fused kernel,
        no f64 planes. N=256 is the kernel's minimum tile shape."""
        from maus_tpu.ops.batched_solve import factor_qr
        from maus_tpu.ops.refine import SplitComplex, refine_split_c64exact
        from maus_tpu.utils.xfer import to_device_complex

        n = 256
        rng = np.random.default_rng(11)
        q1, _ = np.linalg.qr(rng.standard_normal((n, n))
                             + 1j * rng.standard_normal((n, n)))
        q2, _ = np.linalg.qr(rng.standard_normal((n, n))
                             + 1j * rng.standard_normal((n, n)))
        sv = np.logspace(0, -3, n)
        A = ((q1 * sv[None, :]) @ q2.conj().T).astype(np.complex64)
        x_true = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        b = A.astype(np.complex128) @ x_true
        Ad = to_device_complex(A, jnp.complex64)
        fac = factor_qr(Ad)
        b64 = SplitComplex(jnp.asarray(b.real), jnp.asarray(b.imag))
        x0 = to_device_complex(np.zeros_like(b), jnp.complex64)
        xs, rel = refine_split_c64exact(Ad, fac, b64, x0, steps=30, tol=1e-12)
        assert float(rel) < 1e-10

    def test_device_resident_operand_solve(self):
        """A jax.Array operand goes through MausSolver with zero host
        round-trip (device diagnosis + device rhs)."""
        import maus_tpu
        from maus_tpu.core.types import ProblemType
        from maus_tpu.utils.xfer import to_device_complex

        A, b = _host_problem(seed=8, cond=1e3)
        Ad = to_device_complex(A, jnp.complex64)
        bd = to_device_complex(b, jnp.complex64)
        s = maus_tpu.MausSolver(Ad, ProblemType.SOLVE_LINEAR_SYSTEM,
                                b_vector=bd, initial_num_candidates=K)
        assert s.A_host is None and s.b_host is None
        rep = s.evolve(40)
        assert rep.residuals and rep.residuals[0] < 1e-8
