"""Mixed-precision iterative refinement.

TPU constraint (probed on v5e): ``complex128`` is not supported at all, ``float64``
is (software-emulated, slow but fine for O(N²) work). The classic mixed-precision
recipe therefore becomes:

* factor + solve in ``complex64`` on the MXU (fast, O(N³));
* represent high-precision iterates as **split re/im float64 pairs**;
* compute residuals ``r = b − A x`` with four real f64 matvecs (O(N²), emulated);
* correction solve ``H d = r`` reuses the c64 factorization.

This reaches ‖Ax−b‖/‖b‖ ≈ 1e-8..1e-15 (κ(A)·eps_f32 < 1 permitting) without any
c128 op ever reaching the TPU compiler. The reference has no analogue — it gets
f64 for free on CPU; this module is what makes the 1e-8 north-star tolerance
(BASELINE.md) reachable on TPU hardware.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .batched_solve import (CholFactors, LUFactors, QRFactors, solve_chol,
                            solve_factored, solve_qr)


def _solve_any(fac, b):
    if isinstance(fac, CholFactors):
        return solve_chol(fac, b)
    if isinstance(fac, QRFactors):
        return solve_qr(fac, b)
    return solve_factored(fac, b)


class SplitComplex(NamedTuple):
    """A complex vector/matrix held as separate real/imag parts (any float dtype).

    Exists because c128 cannot live on TPU; (f64, f64) pairs can.
    """

    re: jax.Array
    im: jax.Array

    @classmethod
    def from_complex(cls, z: jax.Array, dtype=jnp.float64) -> "SplitComplex":
        return cls(z.real.astype(dtype), z.imag.astype(dtype))

    def to_complex(self, dtype=jnp.complex64) -> jax.Array:
        rdt = jnp.float32 if dtype == jnp.complex64 else jnp.float64
        # lax.complex avoids an intermediate c128 (unsupported on TPU)
        return jax.lax.complex(self.re.astype(rdt),
                               self.im.astype(rdt)).astype(dtype)

    def norm(self) -> jax.Array:
        return jnp.sqrt(jnp.sum(self.re * self.re + self.im * self.im, axis=-1))


def split_matvec(A: SplitComplex, x: SplitComplex) -> SplitComplex:
    """``A @ x`` on split-complex operands: 4 real matvecs.

    Supports batched ``x`` of shape (..., N) against ``A`` of shape (N, N) via
    standard matmul broadcasting (contract on the last axis of x).
    """
    re = x.re @ A.re.T - x.im @ A.im.T if x.re.ndim > 1 else A.re @ x.re - A.im @ x.im
    im = x.re @ A.im.T + x.im @ A.re.T if x.re.ndim > 1 else A.im @ x.re + A.re @ x.im
    return SplitComplex(re, im)


def split_residual(A: SplitComplex, x: SplitComplex, b: SplitComplex) -> SplitComplex:
    ax = split_matvec(A, x)
    return SplitComplex(b.re - ax.re, b.im - ax.im)


def _residual_3m(A: SplitComplex, Asum: jax.Array, x: SplitComplex,
                 b: SplitComplex) -> SplitComplex:
    """r = b − A x with the 3-multiplication complex trick: Karatsuba on the
    planes (t1 = Ar·xr, t2 = Ai·xi, t3 = (Ar+Ai)(xr+xi)) cuts the emulated-f64
    GEMVs from 4 to 3 — they are the dominant refinement cost on TPU. ``Asum``
    = A.re + A.im, precomputed once per refinement call (one O(N²) add
    amortized over every step)."""
    t1 = A.re @ x.re
    t2 = A.im @ x.im
    t3 = Asum @ (x.re + x.im)
    return SplitComplex(b.re - (t1 - t2), b.im - (t3 - t1 - t2))


def refine(A: jax.Array, fac: LUFactors, b: jax.Array, x0: jax.Array,
           steps: int = 3) -> tuple[jax.Array, jax.Array]:
    """Iteratively refine ``x0`` (solution of the Ψ-shifted proxy system) toward the
    true system ``A x = b`` using f64 residuals and the existing c64 factorization.

    Returns ``(x_in_compute_dtype, rel_residual_f64)``. NOTE: casting back to the
    compute dtype rounds away the refined digits — ``rel`` describes the f64
    iterate, not the returned array. Callers that need the refined precision must
    use :func:`refine_split` and keep the split-f64 representation (the user API
    does; this wrapper exists for in-loop residual steering only).
    """
    xs, rel = refine_split(A, fac, b, x0, steps)
    return xs.to_complex(x0.dtype), rel


@functools.partial(jax.jit, static_argnames=("steps",))
def refine_split(A, fac: LUFactors, b, x0: jax.Array,
                 steps: int = 3, tol: float = 0.0) -> tuple[SplitComplex, jax.Array]:
    """As :func:`refine` but returns the split-f64 iterate.

    ``A`` / ``b`` may be passed as :class:`SplitComplex` built from the *original*
    full-precision host operands — then refinement targets the user's true system
    (the c64 factorization is only the preconditioner), not its c64 rounding.

    Early-exits (cheap no-op iterations) once the f64 relative residual reaches
    ``tol`` or stops improving; per-step cost is O(N²), so a generous ``steps``
    budget is safe — at large N·ε·κ the contraction per step approaches 1 and
    dozens of steps may be needed (observed at N=4096, κ=1e6).
    """
    A64 = A if isinstance(A, SplitComplex) else SplitComplex.from_complex(A)
    b64 = b if isinstance(b, SplitComplex) else SplitComplex.from_complex(b)
    with jax.default_matmul_precision("highest"):
        return _refine_split_impl(A64, fac, b64, x0, steps, tol)


def _refine_split_impl(A64, fac, b64, x0, steps, tol):
    bnorm = jnp.maximum(b64.norm(), jnp.asarray(1e-300, jnp.float64))
    Asum = A64.re + A64.im              # one-time plane sum for the 3M matvec

    # a REAL early-exit while_loop: a masked fori_loop still executes every
    # step's O(N²) work after convergence — measured as 4.3 of the 4.4 s of the
    # 4096² bench before this change.
    # ONE split-f64 matvec per step: the residual of the accepted iterate is
    # carried into the next step as both the correction RHS and the acceptance
    # measure (emulated-f64 matvecs are the dominant refinement cost on TPU —
    # the previous two-matvec body measured as most of the 4096² bench time).
    def cond(carry):
        _, _, rel, prev_rel, it = carry
        return (it < steps) & (rel > tol) & (rel <= 0.9 * prev_rel)

    def body(carry):
        x64, r64, rel, _, it = carry
        # correction in working precision against the same factorization
        d = _solve_any(fac, r64.to_complex(x0.dtype))
        d64 = SplitComplex.from_complex(d)
        x_new = SplitComplex(x64.re + d64.re, x64.im + d64.im)
        r_new = _residual_3m(A64, Asum, x_new, b64)
        rel_new = r_new.norm() / bnorm
        # keep the better iterate (and ITS residual — already computed)
        better = rel_new < rel
        x_out = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), x_new, x64)
        r_out = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), r_new, r64)
        return x_out, r_out, jnp.minimum(rel_new, rel), rel, it + 1

    x64 = SplitComplex.from_complex(x0)
    r0 = _residual_3m(A64, Asum, x64, b64)
    rel0 = r0.norm() / bnorm
    x64, _, rel, _, _ = jax.lax.while_loop(
        cond, body, (x64, r0, rel0, jnp.asarray(jnp.inf, rel0.dtype),
                     jnp.asarray(0, jnp.int32)))
    return x64, rel


def true_residual_norm(A: jax.Array, x: jax.Array, b: jax.Array) -> jax.Array:
    """f64 relative residual ‖Ax−b‖/‖b‖ for c64 operands, batched over leading axes.

    Used by tests and the bench harness as the ground-truth acceptance measure.
    """
    with jax.default_matmul_precision("highest"):
        A64 = SplitComplex.from_complex(A)
        x64 = SplitComplex.from_complex(x)
        b64 = SplitComplex.from_complex(b)
        r = split_residual(A64, x64, b64)
        return r.norm() / jnp.maximum(b64.norm(), 1e-300)


def refine_gmres(A, fac, b, x0: jax.Array, steps: int = 3, tol: float = 0.0,
                 restart: int = 30) -> tuple[SplitComplex, jax.Array]:
    """GMRES-IR: iterative refinement whose correction solve is a *preconditioned
    GMRES* instead of a single factorization solve.

    Plain IR contracts at ~N·ε_f32·κ per step and stalls once that factor nears 1
    (κ ≳ 1e7 at N=4096 in c64). Replacing the single correction solve with
    GMRES on the right-preconditioned operator ``A·P⁻¹`` (P = the c64
    factorization) extends the reachable κ by roughly another 1/ε factor — the
    standard GMRES-IR construction, here with f64 split-plane outer residuals.

    Same contract as :func:`refine_split`.
    """
    from .gmres import gmres_batched

    A64 = A if isinstance(A, SplitComplex) else SplitComplex.from_complex(A)
    b64 = b if isinstance(b, SplitComplex) else SplitComplex.from_complex(b)
    with jax.default_matmul_precision("highest"):
        return _refine_gmres_impl(A64, fac, b64, x0, steps, tol, restart,
                                  gmres_batched)


def _refine_gmres_impl(A64, fac, b64, x0, steps, tol, restart, gmres_batched):
    bnorm = jnp.maximum(b64.norm(), jnp.asarray(1e-300, jnp.float64))
    Asum = A64.re + A64.im              # one-time plane sum for the 3M matvec
    Ac = SplitComplex(A64.re.astype(jnp.float32),
                      A64.im.astype(jnp.float32)).to_complex(x0.dtype)

    def matvec(Z):
        # right-preconditioned operator: A · P⁻¹ (batched over one row)
        y = _solve_any(fac, Z[0])
        return (Ac @ y)[None, :]

    def cond(carry):
        _, _, rel, prev_rel, it = carry
        return (it < steps) & (rel > tol) & (rel <= 0.95 * prev_rel)

    def body(carry):
        x64, r64, rel, _, it = carry
        r = r64.to_complex(x0.dtype)
        res = gmres_batched(matvec, r[None, :], tol=1e-6, restart=restart,
                            max_restarts=2)
        d = _solve_any(fac, res.x[0])          # un-precondition: x = P⁻¹ y
        d64 = SplitComplex.from_complex(d)
        x_new = SplitComplex(x64.re + d64.re, x64.im + d64.im)
        r_new = _residual_3m(A64, Asum, x_new, b64)
        rel_new = r_new.norm() / bnorm
        better = rel_new < rel
        x_out = jax.tree.map(lambda new, old: jnp.where(better, new, old),
                             x_new, x64)
        r_out = jax.tree.map(lambda new, old: jnp.where(better, new, old),
                             r_new, r64)
        return x_out, r_out, jnp.minimum(rel_new, rel), rel, it + 1

    x64 = SplitComplex.from_complex(x0)
    r0 = _residual_3m(A64, Asum, x64, b64)
    rel0 = r0.norm() / bnorm
    x64, _, rel, _, _ = jax.lax.while_loop(
        cond, body, (x64, r0, rel0, jnp.asarray(jnp.inf, rel0.dtype),
                     jnp.asarray(0, jnp.int32)))
    return x64, rel
