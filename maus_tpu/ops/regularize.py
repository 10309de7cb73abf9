"""Ψ-regularization ladder — shift construction.

Reference semantics (``InverseIterateSolver``, AMS:30-104): solve ``(A + R)x = b``
where ``R`` escalates with retry attempt and stuckness,

    Ψ = psi_base · 10^(attempt/2) · 10^(stuck/3)            (M3a, AMS:44)

and ``R = Ψ·I`` for sparse inputs (AMS:46-47) or ``Ψ·I + 0.15Ψ·U[0,1]`` dense random
perturbation (AMS:49-50). The dense random perturbation exists to break symmetry for
stuck candidates; a *deterministic* diagonal perturbation keeps that function while
staying reproducible and rank-structured (SURVEY.md §7.1), so here

    R = Ψ·(I + 0.15·D_jitter),   D_jitter = diag(j/(N-1) for j in 0..N-1)

which is cheap, batched, and never densifies structure.
"""
from __future__ import annotations

import jax.numpy as jnp


def psi_magnitude(psi_base, aggression, attempt, stuck):
    """Scalar/batched Ψ level (M3a, AMS:44 with the strategy aggression factor of
    AMS:224-225 folded in)."""
    attempt = attempt.astype(jnp.float32) if hasattr(attempt, "astype") else float(attempt)
    stuck = stuck.astype(jnp.float32) if hasattr(stuck, "astype") else float(stuck)
    return psi_base * aggression * 10.0 ** (attempt / 2.0) * 10.0 ** (stuck / 3.0)


def shift_diagonal(n: int, psi, dtype) -> jnp.ndarray:
    """Diagonal of the regularization term R for a single Ψ level.

    Returns a length-``n`` vector ``d`` such that ``R = diag(d)``; add with
    ``A + jnp.diag(d)`` or, batched, ``A.at[..., idx, idx].add(d)``.
    """
    jitter = jnp.linspace(0.0, 0.15, n, dtype=jnp.float32)
    d = psi * (1.0 + jitter)
    return d.astype(dtype)


def apply_shift(A: jnp.ndarray, psi, extra_diag=None) -> jnp.ndarray:
    """``H = A + Ψ·(I + 0.15·jitter) [+ diag(extra_diag)]`` for square ``A``.

    ``extra_diag`` carries the eigen-shift ``−λ`` for shifted inverse iteration
    (AMS:270-271) so the whole shifted+regularized operator is built in one pass.
    """
    n = A.shape[-1]
    d = shift_diagonal(n, psi, A.dtype)
    if extra_diag is not None:
        d = d + extra_diag.astype(A.dtype)
    idx = jnp.arange(n)
    return A.at[..., idx, idx].add(d)
