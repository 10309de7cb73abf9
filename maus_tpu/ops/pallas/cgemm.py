"""Pallas complex GEMM — 3-multiplication (Karatsuba) algorithm on split planes.

XLA lowers a complex64 matmul to 4 real MXU matmuls:
``Re = ArBr − AiBi``, ``Im = ArBi + AiBr``. The 3M scheme does it in three:

    P1 = Ar·Br,  P2 = Ai·Bi,  P3 = (Ar+Ai)·(Br+Bi)
    Re = P1 − P2,   Im = P3 − P1 − P2

— a 25% MXU-FLOP reduction for the price of a few VPU adds. Complex dtypes
don't exist inside Pallas TPU kernels, so operands travel as separate re/im f32
planes; the public wrapper :func:`cgemm` accepts complex64 arrays, pads to tile
multiples, and reassembles.

Measured on v5e at ``Precision.HIGHEST`` (the only precision acceptable for
solver math — bf16-pass dots carry ~3e-3 product error): 1.57× over XLA's
complex matmul at N=1024, parity at N=2048-4096 (XLA's f32 6-pass complex
matmul is already well tuned; the extra (Ar+Ai) operand passes eat the 3M
advantage at large N). Kept as the framework's demonstration complex-GEMM
kernel and the fallback for shapes where XLA's complex lowering regresses; the
solver's hot paths stay on XLA matmuls by default.

Kernel structure: classic (i, j, k) grid with output revisiting along k —
out blocks live in VMEM across the k-loop and accumulate the three partial dots.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cgemm_kernel(ar_ref, ai_ref, br_ref, bi_ref, cr_ref, ci_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        cr_ref[:] = jnp.zeros_like(cr_ref)
        ci_ref[:] = jnp.zeros_like(ci_ref)

    ar = ar_ref[:]
    ai = ai_ref[:]
    br = br_ref[:]
    bi = bi_ref[:]
    # full f32 MXU precision: bf16-pass dots put a ~3e-3 error on the product,
    # useless for solver math (measured)
    hi = jax.lax.Precision.HIGHEST
    p1 = jnp.dot(ar, br, preferred_element_type=jnp.float32, precision=hi)
    p2 = jnp.dot(ai, bi, preferred_element_type=jnp.float32, precision=hi)
    p3 = jnp.dot(ar + ai, br + bi, preferred_element_type=jnp.float32,
                 precision=hi)
    cr_ref[:] += p1 - p2
    ci_ref[:] += p3 - p1 - p2


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def cgemm(a: jax.Array, b: jax.Array, *, bm: int = 256, bn: int = 256,
          bk: int = 512, interpret: bool = False) -> jax.Array:
    """``a @ b`` for complex64 operands via the 3M Pallas kernel.

    Args:
      a: (M, K) complex64.  b: (K, N) complex64.
      bm/bn/bk: tile sizes (multiples of the f32 (8, 128) TPU tile).
      interpret: run in Pallas interpreter mode (CPU tests).
    """
    if a.ndim != 2 or b.ndim != 2 or a.shape[1] != b.shape[0]:
        raise ValueError(f"bad shapes {a.shape} @ {b.shape}")
    m, k = a.shape
    _, n = b.shape
    bm_, bn_, bk_ = min(bm, _rup(m, 8)), min(bn, _rup(n, 128)), \
        min(bk, _rup(k, 128))

    mp, kp, np_ = _rup(m, bm_), _rup(k, bk_), _rup(n, bn_)
    ar = jnp.zeros((mp, kp), jnp.float32).at[:m, :k].set(a.real.astype(jnp.float32))
    ai = jnp.zeros((mp, kp), jnp.float32).at[:m, :k].set(a.imag.astype(jnp.float32))
    br = jnp.zeros((kp, np_), jnp.float32).at[:k, :n].set(b.real.astype(jnp.float32))
    bi = jnp.zeros((kp, np_), jnp.float32).at[:k, :n].set(b.imag.astype(jnp.float32))

    grid = (mp // bm_, np_ // bn_, kp // bk_)
    flops = 3 * 2 * mp * np_ * kp + 4 * mp * np_ * (kp // bk_)
    cr, ci = pl.pallas_call(
        _cgemm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bk_), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm_, bk_), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk_, bn_), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk_, bn_), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm_, bn_), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm_, bn_), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((mp, np_), jnp.float32),
                   jax.ShapeDtypeStruct((mp, np_), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * (mp * kp + kp * np_ + mp * np_) * 2,
            transcendentals=0),
        interpret=interpret,
    )(ar, ai, br, bi)
    return jax.lax.complex(cr[:m, :n], ci[:m, :n]).astype(jnp.complex64)


def _rup(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult
