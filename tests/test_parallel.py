"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4): mesh
construction and the full evolve loop running GSPMD-sharded."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maus_tpu
from maus_tpu.core.types import ProblemType
from maus_tpu.parallel import mesh as mesh_mod
from maus_tpu.parallel import placement
from maus_tpu.problems import generators as gen
from maus_tpu.solver import evolve as ev


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return mesh_mod.make_mesh(replica=2, model=4)


def test_make_mesh_shapes(mesh8):
    assert mesh8.shape[mesh_mod.REPLICA_AXIS] == 2
    assert mesh8.shape[mesh_mod.MODEL_AXIS] == 4


def test_evolve_linear_sharded_end_to_end(mesh8):
    """The full jitted evolve loop on GSPMD-sharded operands must produce the same
    solution as the single-device run."""
    A_h, b_h = gen.well_conditioned_system(64, seed=0)
    s = maus_tpu.MausSolver(A_h, ProblemType.SOLVE_LINEAR_SYSTEM, b_vector=b_h,
                            initial_num_candidates=8)
    cfg, kn = s.config, s.knowledge
    A_s, b_s = placement.place_operands(mesh8, s.A, s.b)
    carry, _ = ev.evolve_while(cfg, kn, A_s, b_s, s._key, 30, 1)
    res = np.asarray(carry.pop.residual)
    conv = np.asarray(carry.pop.status) == int(maus_tpu.CandidateStatus.CONVERGED)
    assert conv.any()
    x = np.asarray(carry.pop.v)[conv][0]
    assert np.linalg.norm(A_h @ x - b_h) / np.linalg.norm(b_h) < 1e-8


def test_evolve_eigen_sharded(mesh8):
    A_h = gen.laplace_like_complex(8, make_hermitian=True)
    s = maus_tpu.MausSolver(A_h, ProblemType.EIGENVALUE, initial_num_candidates=16,
                            global_convergence_tol=1e-7)
    A_s, _ = placement.place_operands(mesh8, s.A)
    carry, _ = ev.evolve_while(s.config, s.knowledge, A_s, None, s._key, 20,
                               s.target_solutions)
    assert int(carry.strat.num_distinct) == 8


def test_evolve_general_eig_sharded(mesh8):
    """Non-Hermitian path under GSPMD: the Hessenberg reduction + shifted
    Givens solves must compile and converge with A row-sharded."""
    A_h = gen.laplace_like_complex(8, make_hermitian=False)
    s = maus_tpu.MausSolver(A_h, ProblemType.EIGENVALUE,
                            initial_num_candidates=24,
                            global_convergence_tol=1e-6)
    A_s, _ = placement.place_operands(mesh8, s.A)
    carry, _ = ev.evolve_while(s.config, s.knowledge, A_s, None, s._key, 40,
                               s.target_solutions)
    nd = int(carry.strat.num_distinct)
    assert nd >= 4
    conv = np.asarray(carry.pop.status) == int(maus_tpu.CandidateStatus.CONVERGED)
    lam = np.asarray(carry.pop.lam)[conv]
    w_true = np.linalg.eigvals(A_h)
    for l in lam:
        assert np.min(np.abs(w_true - l)) < 1e-4


def test_population_placement_preserves_values(mesh8):
    from maus_tpu.solver import candidate as cand
    cfg = maus_tpu.SolverConfig(num_candidates=8, dtype=jnp.complex128)
    pop = cand.init_population(cfg, jax.random.PRNGKey(0), (16, 16))
    pop_s = placement.place_population(mesh8, pop)
    np.testing.assert_array_equal(np.asarray(pop_s.v), np.asarray(pop.v))
    np.testing.assert_array_equal(np.asarray(pop_s.status), np.asarray(pop.status))
