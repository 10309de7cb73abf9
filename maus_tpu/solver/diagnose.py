"""Host-side matrix diagnosis — the reference's ``_diagnose_matrix_initial``
(AMS:374-404), run once before tracing.

The results are *static* (Python values): Hermitian-ness selects an entirely
different compiled path (the shared-eigh fast path), so it must be known at trace
time. Unlike the reference, the condition number is an *estimate* for large N
(power + inverse-power iteration) instead of a full O(N³) SVD, and it is computed
for sparse-classified inputs too (the reference skips it there and then treats
cond=∞ as Critical — the identity-matrix quirk of SURVEY.md §0.1).
"""
from __future__ import annotations

import numpy as np

from ..core.types import ProblemKnowledge, ProblemType


def _to_dense_numpy(A) -> np.ndarray:
    """Accept numpy arrays, jax arrays, and scipy.sparse matrices; return dense
    ndarray (sparse CSC/CSR inputs map to dense TPU layouts per BASELINE.json)."""
    if hasattr(A, "toarray"):          # scipy.sparse without importing scipy
        return np.asarray(A.toarray())
    return np.asarray(A)


def estimate_cond(A: np.ndarray, exact_below: int = 512, iters: int = 30) -> float:
    """2-norm condition estimate: exact SVD for small matrices, randomized power /
    inverse-power iteration above ``exact_below`` (reference uses exact
    ``np.linalg.cond`` always, AMS:400 — O(N³) at any size)."""
    n = min(A.shape)
    if n == 0:
        return 1.0
    if max(A.shape) <= exact_below:
        try:
            c = np.linalg.cond(A)
            return float(c) if np.isfinite(c) else np.inf
        except np.linalg.LinAlgError:
            return np.inf
    rng_ = np.random.default_rng(0)
    x = rng_.standard_normal(A.shape[1]) + 1j * rng_.standard_normal(A.shape[1])
    for _ in range(iters):
        x = A.conj().T @ (A @ x)
        nx = np.linalg.norm(x)
        if nx == 0:
            return np.inf
        x /= nx
    smax = float(np.sqrt(np.linalg.norm(A.conj().T @ (A @ x))))
    # smallest singular value via inverse power iteration on AᴴA (LU on host)
    try:
        import scipy.linalg as sla
        lu_piv = sla.lu_factor(A.conj().T @ A if A.shape[0] != A.shape[1] else A)
        y = rng_.standard_normal(A.shape[1]) + 1j * rng_.standard_normal(A.shape[1])
        for _ in range(iters):
            y = sla.lu_solve(lu_piv, y)
            ny = np.linalg.norm(y)
            if not np.isfinite(ny) or ny == 0:
                return np.inf
            y /= ny
        smin_inv = np.linalg.norm(sla.lu_solve(lu_piv, y))
        smin = 1.0 / smin_inv if smin_inv > 0 else 0.0
        if A.shape[0] != A.shape[1]:
            smin = float(np.sqrt(abs(smin)))
    except Exception:
        return np.inf
    return smax / smin if smin > 0 else np.inf


def diagnose(A, problem_type: ProblemType,
             sparse_density_threshold: float = 0.25) -> ProblemKnowledge:
    """Classify the operand: density, Hermitian / complex-symmetric structure,
    conditioning, singularity (AMS:374-404 semantics, estimation fixed)."""
    was_sparse = hasattr(A, "toarray")
    Ad = _to_dense_numpy(A)
    if Ad.ndim != 2:
        raise ValueError(f"expected a 2-D operand, got shape {Ad.shape}")
    m, n = Ad.shape
    nnz = int(np.count_nonzero(np.abs(Ad) > 1e-12))
    density = nnz / max(1, m * n)
    is_sparse = was_sparse or density < sparse_density_threshold

    is_hermitian = False
    is_complex_symmetric = False
    is_positive_definite = False
    if m == n and m * n <= 10_000_000:          # densify guard (AMS:390-395)
        is_hermitian = bool(np.allclose(Ad, Ad.conj().T, atol=1e-9))
        if not is_hermitian and np.iscomplexobj(Ad):
            is_complex_symmetric = bool(np.allclose(Ad, Ad.T, atol=1e-9))
        if is_hermitian:
            try:
                np.linalg.cholesky(Ad)
                is_positive_definite = True
            except np.linalg.LinAlgError:
                is_positive_definite = False

    cond = estimate_cond(Ad) if m == n else estimate_cond(Ad)
    is_singular = (not np.isfinite(cond)) or cond > 1e15

    effective_rank = None
    if problem_type == ProblemType.SVD:
        # cheap rank probe from a few power iterations' worth of singular values:
        # exact for small operands, top-k randomized sketch otherwise
        k = min(m, n)
        if k <= 512:
            s = np.linalg.svd(Ad, compute_uv=False)
        else:
            rng_ = np.random.default_rng(1)
            Q = np.linalg.qr(Ad @ rng_.standard_normal((n, min(64, k))))[0]
            s = np.linalg.svd(Q.conj().T @ Ad, compute_uv=False)
        smax = s[0] if len(s) else 1.0
        effective_rank = int(np.sum(s / max(smax, 1e-300) > 1e-4)) or 1

    return ProblemKnowledge(
        shape=(m, n), is_hermitian=is_hermitian,
        is_complex_symmetric=is_complex_symmetric,
        is_positive_definite=is_positive_definite,
        is_sparse_input=is_sparse, density=float(density),
        cond_estimate=float(cond) if np.isfinite(cond) else float("inf"),
        is_singular=bool(is_singular), effective_rank=effective_rank)
