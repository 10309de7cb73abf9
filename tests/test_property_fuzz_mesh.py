"""Randomized property tests for the MESH paths (the single-chip fuzz tier's
counterpart): ``solve/eig/svd(mesh=)`` across operator structure and scale
draws on the 8-virtual-device CPU mesh, asserting the REPORTED residuals
agree with independently recomputed ones — the distributed engine must never
claim convergence it didn't achieve, including at the range extremes the
mesh reductions were hardened for (round-3 range-safe psums).
"""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

import maus_tpu

M_DEV = 8
N = 32


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < M_DEV:
        pytest.skip("needs 8 devices")
    return Mesh(np.array(jax.devices()).reshape(-1), ("model",))


def _case_matrix(rng, n, kind):
    if kind == "general":
        return rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    if kind == "hermitian":
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        return (A + A.conj().T) / 2
    if kind == "real":
        return rng.standard_normal((n, n)) + 0j
    if kind == "scaled_tiny":
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        return A * 1e-6
    if kind == "scaled_huge":
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        return A * 1e6
    if kind == "diag_dominant":
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        return A + 3 * n * np.eye(n)
    raise ValueError(kind)


SOLVE_KINDS = ["general", "hermitian", "real", "scaled_tiny", "scaled_huge",
               "diag_dominant"]


@pytest.mark.parametrize("kind", SOLVE_KINDS)
def test_mesh_solve_reaches_tol_and_reports_honestly(kind, mesh):
    rng = np.random.default_rng(hash(kind) % 1000)
    A = _case_matrix(rng, N, kind)
    b = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    rep = maus_tpu.solve(A, b, tol=1e-8, max_iterations=40, num_candidates=6,
                         seed=1, mesh=mesh)
    assert rep.converged, f"{kind}: mesh solve did not converge"
    x = rep.best()[0]
    true_rel = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert true_rel <= 1e-8, f"{kind}: true rel {true_rel}"
    assert abs(rep.residuals[0] - true_rel) <= 1e-8 + 0.5 * true_rel


@pytest.mark.parametrize("kind", ["general", "hermitian", "scaled_huge"])
def test_mesh_eig_matches_spectrum(kind, mesh):
    rng = np.random.default_rng(3 + hash(kind) % 1000)
    A = _case_matrix(rng, N, kind)
    rep = maus_tpu.eig(A, tol=1e-8, max_iterations=60, num_candidates=8,
                       seed=2, mesh=mesh)
    assert rep.num_distinct >= 2, f"{kind}: mesh eig found too few pairs"
    lam_true = np.linalg.eigvals(A)
    scale = np.max(np.abs(lam_true))
    for (lam, v), claimed in zip(rep.solutions, rep.residuals):
        assert np.min(np.abs(lam_true - lam)) < 1e-5 * scale
        recomputed = np.linalg.norm(A @ v - lam * v)
        assert recomputed <= max(2 * claimed, 1e-12 * scale), \
            f"{kind}: claimed {claimed}, recomputed {recomputed}"


@pytest.mark.parametrize("kind", ["general", "scaled_tiny"])
def test_mesh_svd_matches_spectrum(kind, mesh):
    rng = np.random.default_rng(7 + hash(kind) % 1000)
    mr = 24
    A = _case_matrix(rng, N, kind)[:mr]
    rep = maus_tpu.svd(A, tol=1e-8, max_iterations=60, num_candidates=6,
                       seed=3, mesh=mesh)
    s_true = np.linalg.svd(A, compute_uv=False)
    assert rep.num_distinct >= 2, f"{kind}: mesh svd found too few triplets"
    for (sig, u, v), claimed in zip(rep.solutions, rep.residuals):
        assert np.min(np.abs(s_true - sig)) < 1e-5 * s_true[0]
        recomputed = np.linalg.norm(A @ v - sig * u) + \
            np.linalg.norm(A.conj().T @ u - sig * v)
        assert recomputed <= max(2 * claimed, 1e-12 * s_true[0]), \
            f"{kind}: claimed {claimed}, recomputed {recomputed}"
