"""Static communication-budget accounting for sharded programs.

Walks the jaxpr of a traced function and sums the logical per-device byte
volume of every cross-device collective (``psum`` / ``all_gather`` /
``ppermute`` / ``all_to_all`` / ``reduce_scatter`` / ``pmax`` / ``pmin``),
multiplying loop-body volumes by their trip counts: ``lax.scan`` lengths are
static in the jaxpr; ``lax.while_loop`` bounds must be supplied by the caller
(every while in ``parallel/`` is step-bounded, so the bound is the caller's
own ``steps`` / ``iterations`` argument).

This machine-checks the communication complexity the ``parallel/`` modules
document in prose (``dist_qr.py``: O(N²) per factorization — the reference
has no distributed capability at all, SURVEY.md §2.3, so these budgets are
properties of this framework's own design): ``tests/test_comm_budget.py``
pins absolute budgets and scaling exponents so a change that silently
introduces an O(N³) gather fails CI rather than shipping.

Volume model (per device, constant ring/tree factors deliberately ignored —
they cannot change a scaling exponent):

* ``psum``-family (``psum``, ``psum_invariant``, ``pmax``, ``pmin``,
  ``pmean``): bytes of the operands entering the reduction;
* ``all_gather``: bytes of the gathered OUTPUT (what lands on each device);
* ``reduce_scatter`` / ``ppermute`` / ``all_to_all``: operand bytes.

Branches of ``lax.cond`` are summed (an upper bound). Collectives inside a
``while_loop`` with no ``while_bound`` supplied raise — an unbounded
collective loop has no static budget.
"""
from __future__ import annotations

import math

import jax

# primitive name -> which side of the eqn carries the moved volume
_COLLECTIVES = {
    "psum": "in",
    "psum_invariant": "in",
    "pmax": "in",
    "pmin": "in",
    "pmean": "in",
    "all_gather": "out",
    "all_gather_invariant": "out",
    "reduce_scatter": "in",
    "reduce_scatter_invariant": "in",
    "ppermute": "in",
    "all_to_all": "in",
}


def _subjaxprs(eqn):
    """All jaxprs referenced by an eqn's params (scan/while/cond/pjit/
    shard_map/custom_* bodies), as bare Jaxpr objects."""
    for v in eqn.params.values():
        for x in v if isinstance(v, (list, tuple)) else [v]:
            if hasattr(x, "eqns"):
                yield x
            elif hasattr(x, "jaxpr") and hasattr(x.jaxpr, "eqns"):
                yield x.jaxpr


def _aval_bytes(v) -> int:
    aval = getattr(v, "aval", None)
    if aval is None or not hasattr(aval, "shape"):
        return 0
    return math.prod(aval.shape) * aval.dtype.itemsize if aval.shape \
        else aval.dtype.itemsize


def _contains_collective(jaxpr) -> bool:
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in _COLLECTIVES:
            return True
        if any(_contains_collective(sj) for sj in _subjaxprs(eqn)):
            return True
    return False


def _walk(jaxpr, mult: int, acc: dict, while_bound) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _COLLECTIVES:
            side = eqn.invars if _COLLECTIVES[name] == "in" else eqn.outvars
            nbytes = sum(_aval_bytes(v) for v in side)
            acc[name] = acc.get(name, 0) + mult * nbytes
        inner = mult
        if name == "scan":
            inner = mult * int(eqn.params["length"])
        elif name == "while":
            if while_bound is None:
                if any(_contains_collective(sj) for sj in _subjaxprs(eqn)):
                    raise ValueError(
                        "collectives inside a while_loop: pass while_bound "
                        "(the loop's static step cap) to budget them")
            else:
                inner = mult * int(while_bound)
        for sj in _subjaxprs(eqn):
            _walk(sj, inner, acc, while_bound)


def collective_volume(fn, *args, while_bound: int | None = None,
                      **kwargs) -> dict:
    """Trace ``fn(*args, **kwargs)`` and return per-primitive logical
    collective byte volumes plus their ``"total"``.

    ``args`` may be ``jax.ShapeDtypeStruct``s — only avals are needed.
    ``while_bound`` multiplies every ``while_loop`` body (required if any
    while body communicates).
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    acc: dict = {}
    _walk(closed.jaxpr, 1, acc, while_bound)
    acc["total"] = sum(acc.values())
    return acc


def compiled_collective_shapes(fn, *args, **kwargs) -> list[tuple[str, int]]:
    """Lower + compile ``fn`` and return ``(opname, nbytes)`` for every
    collective instruction in the optimized HLO text — the post-GSPMD,
    post-fusion ground truth (one entry per instruction; loop multiplicity
    NOT applied). Complements :func:`collective_volume`: catches collectives
    the partitioner inserted that never existed in the jaxpr."""
    import re

    txt = jax.jit(fn).lower(*args, **kwargs).compile().as_text()
    dtype_bytes = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1,
                   "f8e5m2": 1, "c64": 8, "c128": 16, "s64": 8, "u64": 8,
                   "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                   "pred": 1}
    shape_re = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")
    inst_re = re.compile(
        r"=\s*(\(?[a-z0-9,\[\]{}\s/_*]*\)?)\s*"
        r"(all-reduce|all-gather|collective-permute|reduce-scatter|"
        r"all-to-all)(?:-start)?\(")
    out = []
    for line in txt.splitlines():
        m = inst_re.search(line)
        if not m:
            continue
        nbytes = 0
        for dt, dims in shape_re.findall(m.group(1)):
            if dt not in dtype_bytes:
                continue
            cnt = 1
            for d in dims.split(","):
                if d:
                    cnt *= int(d)
            nbytes += cnt * dtype_bytes[dt]
        out.append((m.group(2), nbytes))
    return out
