"""Randomized property tests: the public API against LAPACK oracles across
operator structure, scale, and conditioning draws (SURVEY.md §4's
property-test tier over the M6-style fixture families, widened to random
structure classes).

Every case asserts the REPORTED residuals agree with independently recomputed
ones — the framework must never claim convergence it didn't achieve."""
import numpy as np
import pytest

import maus_tpu
from maus_tpu.problems import generators as gen


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


KINDS = ["general", "hermitian", "real", "scaled_tiny", "scaled_huge",
         "diag_dominant"]


@pytest.mark.parametrize("seed,kind", [(s, k) for s in (0, 1)
                                       for k in KINDS])
def test_solve_reaches_tol_and_reports_honestly(seed, kind):
    rng = np.random.default_rng(seed)
    n = 48
    A = _case_matrix(rng, n, kind)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    rep = maus_tpu.solve(A, b, tol=1e-8, max_iterations=60, num_candidates=8,
                         seed=seed)
    assert rep.converged, f"{kind}: did not converge"
    x = rep.best()[0]
    true_rel = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert true_rel <= 1e-8, f"{kind}: true rel {true_rel}"
    # claimed residual honest within rounding of the recompute
    assert abs(rep.residuals[np.argmin(rep.residuals)] - true_rel) \
        <= 1e-8 + 0.5 * true_rel


@pytest.mark.parametrize("seed,kind", [(s, k) for s in (0,) for k in KINDS])
def test_solve_device_staged_matches_host_staged(seed, kind, monkeypatch):
    """Device-resident staging (round 3) across the structure draws: the
    device-staged solve must reach tol with honest residuals exactly like the
    host-staged one — diagnosis, refinement planes, and result assembly all
    run on device in this mode."""
    import jax.numpy as jnp

    from maus_tpu.solver import api as api_mod
    monkeypatch.setattr(api_mod, "_device_staging_ok", lambda: True)
    rng = np.random.default_rng(seed + 20)
    n = 48
    A = _case_matrix(rng, n, kind).astype(np.complex64)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    rep = maus_tpu.solve(jnp.asarray(A), jnp.asarray(b), tol=1e-8,
                         max_iterations=60, num_candidates=8, seed=seed)
    assert rep.converged, f"{kind}: device-staged did not converge"
    x = rep.best()[0]
    A128, b128 = A.astype(np.complex128), b.astype(np.complex128)
    true_rel = np.linalg.norm(A128 @ x - b128) / np.linalg.norm(b128)
    assert true_rel <= 1e-8, f"{kind}: true rel {true_rel}"
    assert abs(rep.residuals[np.argmin(rep.residuals)] - true_rel) \
        <= 1e-8 + 0.5 * true_rel


@pytest.mark.parametrize("seed,kind", [(0, "general"), (1, "hermitian"),
                                       (0, "scaled_huge"), (1, "real")])
def test_eig_pairs_match_lapack_spectrum(seed, kind):
    rng = np.random.default_rng(seed + 10)
    n = 16
    A = _case_matrix(rng, n, kind)
    rep = maus_tpu.eig(A, tol=1e-7, num_candidates=3 * n, max_iterations=120,
                       seed=seed)
    ev = np.linalg.eigvals(A)
    scale = max(np.abs(ev).max(), 1e-300)
    for lam, v in rep.solutions:
        # every returned eigenvalue is a true one…
        assert np.min(np.abs(ev - lam)) <= 1e-5 * scale
        # …and (λ, v) is a consistent pair
        r = np.linalg.norm(A @ v - lam * v)
        assert r <= 1e-5 * scale


@pytest.mark.parametrize("seed,shape", [(0, (24, 16)), (1, (16, 24)),
                                        (2, (20, 20))])
def test_svd_triplets_match_lapack(seed, shape):
    rng = np.random.default_rng(seed + 20)
    m, n = shape
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    rep = maus_tpu.svd(A, tol=1e-6, num_candidates=min(m, n),
                       max_iterations=200, seed=seed)
    sv = np.linalg.svd(A, compute_uv=False)
    for sig, u, v in rep.solutions:
        assert np.min(np.abs(sv - sig)) <= 1e-5 * sv[0]
        r = (np.linalg.norm(A @ v - sig * u)
             + np.linalg.norm(A.conj().T @ u - sig * v))
        assert r <= 1e-5 * sv[0]


def test_singular_system_is_flagged_not_faked():
    rng = np.random.default_rng(5)
    n = 32
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A[:, -1] = A[:, 0]                       # exactly singular
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    rep = maus_tpu.solve(A, b, tol=1e-8, max_iterations=40, num_candidates=8)
    if rep.converged:                        # b happened to lie in range(A)
        x = rep.best()[0]
        assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-6
    else:
        assert rep.knowledge.is_singular or rep.residuals == [] or \
            min(rep.residuals, default=1.0) > 1e-8
