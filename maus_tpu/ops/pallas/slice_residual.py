"""Fused exact-slicing residual kernel: ladder extraction + MXU dots in VMEM.

The exact-slicing residual (``ops/refine.py::SlicedMatrix`` — Ozaki-scheme
error-free bf16 decomposition, reference parity per AMS:297/341's residual
contract) materializes a ~24-plane bf16 ladder in HBM and streams it back
through the MXU every certification: per element, 8 B of f64 plane reads to
extract, ~24 B of ladder writes, ~24 B of ladder reads to multiply. This
kernel removes the HBM ladder round-trip entirely: each (tile_m × tile_k)
tile's integer digits are extracted **in VMEM** with native f32 arithmetic
and fed straight to the MXU, so the HBM traffic is one read of the operand
representation and nothing else.

Representation: the f64 plane is pre-split (once per refinement call, two
exact emulated-f64 subtractions) into an f32 TRIPLE ``hi + mid + lo = A``
exactly — ``hi = f32(A)``, ``mid = f32(A − hi)``, ``lo = f32(A − hi − mid)``
(both subtractions are exact in f64: each remainder is within 2⁻²⁴ of the
value it is subtracted from, so the high bits cancel exactly). 72 bits of
significand cover f64's 53, and each component is extracted on the SAME
global power-of-two digit grid as the dense ladder:

* every digit is ``round(z·2⁵)`` of an exact power-of-two-scaled f32 —
  integers ≤ 2⁵, exact in bf16;
* component bounds make most digit positions provably zero and they are
  skipped statically: |hi| ≤ σ → digits 0..11; |mid| ≤ 2⁻²⁴σ → digits 4..11;
  |lo| ≤ 2⁻⁴⁸σ → digits 9..11.  D = 23 digit planes per matrix plane;
* every (A-digit)·(x-digit) product is an integer ≤ 2¹⁰ and every length-N
  f32 MXU accumulation stays ≤ 2¹⁰·N ≤ 2²⁴ for N ≤ 16384 — exact, the same
  bound as the dense ladder (refine.py::_slices_fit);
* the grid is truncated at 2⁻⁶⁰σ absolute exactly like the dense ladder, so
  the result carries the same 2⁻⁵³σ·‖x‖-grade certification contract.

The kernel emits per-digit f32 partials ``out[d, row, xslice]``; the f64
recombination (a 23×24-term scaled sum per row — O(N) emulated-f64 work) and
the ``b −`` subtraction happen outside in XLA.

Measured v5e (see benchmarks/fused_probe.py): the per-certification residual
drops well below the ladder-streaming roofline because the ladder bytes no
longer exist — the floor is the 12 B/element triple read.
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..refine import SplitComplex, _pow2_ceil, _slice_array

# digit-grid geometry (w = 5 bits per digit, 12 grid positions = 60 bits
# below the global power-of-two scale — identical to slice_split_matrix)
_W = 5
_NDIG = 12
# per-component (first_digit, num_digits): hi covers the whole grid, mid
# starts where 2^-24·sigma can first round to a non-zero digit, lo likewise
_COMPONENTS = ((0, 12), (4, 8), (9, 3))
_D = sum(n for _, n in _COMPONENTS)          # 23 digit planes per matrix plane
_LX = 128                                    # lane-padded x-slice columns
_SX = 12                                     # x digits per x plane (60 bits)


def _kernel(tm: int, tk: int, comps=_COMPONENTS):
    D = sum(nd for _, nd in comps)

    def kernel(invs_ref, *refs):
        *comp_refs, x_ref, out_ref = refs
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros((D, tm, _LX), jnp.float32)

        invs = invs_ref[0, 0]
        X = x_ref[:]                                   # (tk, LX) bf16
        base = 0
        for comp_ref, (k0, nd) in zip(comp_refs, comps):
            # z = (A_comp/σ)·2^{5k0}: both scalings are powers of two — exact
            z = (comp_ref[:] * invs) * jnp.float32(2.0 ** (_W * k0))
            for t in range(nd):
                zs = z * jnp.float32(32.0)             # exact pow2 scale
                zi = jnp.round(zs)
                z = zs - zi                            # exact remainder
                d = zi.astype(jnp.bfloat16)            # integer ≤ 2^5, exact
                # precision pinned to DEFAULT: the products are exact already
                # (integer bf16), and an ambient default_matmul_precision
                # ("highest") context would request an fp32-contract bf16
                # matmul that Mosaic rejects ("Bad lhs type")
                out_ref[base + t] += jnp.dot(
                    d, X, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
            base += nd

    return kernel


class PlaneTriple(typing.NamedTuple):
    """Exact f32 triple of one f64 plane: hi + mid + lo == plane, bitwise.

    ``mid``/``lo`` are ``None`` for operands whose f64 widening is f32-exact
    (c64 working-dtype inputs): the single ``hi`` plane IS the operand and the
    kernel runs only its 12 digit planes (half the VPU extraction work, a
    third of the resident bytes)."""

    hi: jax.Array
    mid: typing.Optional[jax.Array]
    lo: typing.Optional[jax.Array]


class SlicedTriple(typing.NamedTuple):
    """Both planes of a split-complex operand as exact f32 triples, plus the
    shared power-of-two digit scale (duck-analog of refine.SlicedMatrix)."""

    re: PlaneTriple
    im: PlaneTriple
    sigma: jax.Array                                   # f64 power of two


def split_triple(A64: SplitComplex) -> SlicedTriple:
    """One-time (per refinement call) exact triple-split of the f64 planes.

    Two emulated-f64 elementwise subtractions per plane — a fraction of the
    old ladder extraction's ~7 passes — and 12 B/element resident instead of
    the 24-plane bf16 ladder's 24 B/element."""
    sigma = _pow2_ceil(jnp.maximum(jnp.max(jnp.abs(A64.re)),
                                   jnp.max(jnp.abs(A64.im))))

    def one(P):
        hi = P.astype(jnp.float32)
        r1 = P - hi.astype(P.dtype)                    # exact
        mid = r1.astype(jnp.float32)
        lo = (r1 - mid.astype(P.dtype)).astype(jnp.float32)   # exact
        return PlaneTriple(hi, mid, lo)

    return SlicedTriple(one(A64.re), one(A64.im), sigma)


def split_triple_c64(A: jax.Array) -> SlicedTriple:
    """Single-component triple of a working-dtype (c64) operand.

    The operand's f64 widening is exact, so ``hi = A.real/imag`` (already f32)
    carries every bit and ``mid = lo = 0`` identically — no f64 planes are
    ever materialized (at 16384² this removes the 4.3 GB plane pair plus
    two-thirds of the triple bytes; the memory key to single-chip 16k
    refinement, STATUS r3 gap 6)."""
    mx = jnp.maximum(jnp.max(jnp.abs(A.real)), jnp.max(jnp.abs(A.imag)))
    sigma = _pow2_ceil(mx.astype(jnp.float64))
    return SlicedTriple(PlaneTriple(A.real, None, None),
                        PlaneTriple(A.imag, None, None), sigma)


def fused_ok(shape, backend: str | None = None) -> bool:
    """Static dispatch rule for the fused kernel: accelerator backend, both
    dims tileable, and the f32-exact contraction bound (refine._slices_fit's
    N ≤ 2^{24−2w}) holds."""
    m, n = shape
    if backend is None:
        backend = jax.default_backend()
    return (backend != "cpu" and m % 256 == 0 and n % 512 == 0
            and max(m, n) <= 16384)


def _partials(tri: PlaneTriple, X, inv_sigma, *, tile_m: int, tile_k: int,
              interpret: bool):
    planes = tuple(p for p in (tri.hi, tri.mid, tri.lo) if p is not None)
    comps = _COMPONENTS[:len(planes)]
    D = sum(nd for _, nd in comps)
    m, n = tri.hi.shape
    if m % tile_m != 0 or n % tile_k != 0:
        # floor-divided grids silently DROP trailing rows/columns of the
        # contraction; fused_ok() gates the library call sites but direct
        # callers with custom tiles must fail loudly
        raise ValueError(f"operand {m}×{n} not divisible by tiles "
                         f"({tile_m}, {tile_k})")
    grid = (m // tile_m, n // tile_k)

    def _tile(i, j):
        return (i, j)

    def _xmap(i, j):
        return (j, i - i)

    def _omap(i, j):
        return (i - i, i, j - j)

    return pl.pallas_call(
        _kernel(tile_m, tile_k, comps),
        grid=grid,
        in_specs=[
            # explicit block + index map: the auto-generated map for a
            # shapeless spec emits i64 zeros under x64, which Mosaic rejects
            # (same trap as hess_solve.py's _fixed)
            pl.BlockSpec((1, 1), lambda i, j: (i - i, j - j),
                         memory_space=pltpu.SMEM),
        ] + [
            pl.BlockSpec((tile_m, tile_k), _tile, memory_space=pltpu.VMEM)
            for _ in planes
        ] + [
            pl.BlockSpec((tile_k, _LX), _xmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, tile_m, _LX), _omap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, m, _LX), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.reshape(inv_sigma, (1, 1)), *planes, X)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_k", "interpret"))
def sliced_residual_fused(tri: SlicedTriple, x: SplitComplex,
                          b: SplitComplex, *, tile_m: int = 256,
                          tile_k: int = 512,
                          interpret: bool = False) -> SplitComplex:
    """r = b − A x at exact-slicing accuracy with in-VMEM digit extraction.

    Same f64 result contract as :func:`maus_tpu.ops.refine._sliced_residual`
    (identical digit grid and truncation floor; the f64 accumulation order of
    the ≤ 2⁻⁶⁰σ-grid-exact partials differs)."""
    f64 = tri.sigma.dtype
    # x-slicing: identical to the dense path (O(N), cheap)
    sxr, sig_xr = _slice_array(x.re, _SX, _W)
    sxi, sig_xi = _slice_array(x.im, _SX, _W)
    X = jnp.concatenate([sxr, sxi], axis=0).T          # (N, 2·SX) bf16
    n = X.shape[0]
    X = jnp.concatenate(
        [X, jnp.zeros((n, _LX - 2 * _SX), jnp.bfloat16)], axis=1)
    inv_sigma = (1.0 / tri.sigma).astype(jnp.float32)

    Pre = _partials(tri.re, X, inv_sigma, tile_m=tile_m, tile_k=tile_k,
                    interpret=interpret)               # (D, M, LX) f32
    Pim = _partials(tri.im, X, inv_sigma, tile_m=tile_m, tile_k=tile_k,
                    interpret=interpret)

    # ---- f64 recombination (outside the kernel; O(D·2SX·M) emulated ops) --
    # digit d of component c sits at grid position k0_c + t → scale σ·2^{−w(k+1)}
    ncomp = sum(1 for p in (tri.re.hi, tri.re.mid, tri.re.lo)
                if p is not None)
    kpos = jnp.asarray([k0 + t for k0, nd in _COMPONENTS[:ncomp]
                        for t in range(nd)], f64)      # (D,)
    kscale = tri.sigma * jnp.exp2(-_W * (kpos + 1.0))  # (D,)
    jpow = jnp.exp2(-_W * (jnp.arange(_SX, dtype=f64) + 1.0))
    colscale = jnp.concatenate([sig_xr * jpow, sig_xi * jpow])   # (2SX,)

    def recombine(P):
        # split the exact f32 partials by x plane and contract the scales in
        # f64: (D, M, 2SX)·(D)·(2SX) → two (M,) vectors (A·xre, A·xim parts)
        Pd = P[:, :, :2 * _SX].astype(f64) * kscale[:, None, None] \
            * colscale[None, None, :]
        xr_part = jnp.sum(Pd[:, :, :_SX], axis=(0, 2))
        xi_part = jnp.sum(Pd[:, :, _SX:], axis=(0, 2))
        return xr_part, xi_part

    arxr, arxi = recombine(Pre)                        # Ar·xr, Ar·xi
    aixr, aixi = recombine(Pim)                        # Ai·xr, Ai·xi
    return SplitComplex(b.re - (arxr - aixi), b.im - (arxi + aixr))
