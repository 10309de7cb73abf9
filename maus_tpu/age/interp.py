"""Vectorized postfix-tape interpreter.

The reference evaluates each expression tree recursively per grid cell — a
N·T·population Python hot loop (K:28-47, ~50k tree walks per AGE cycle;
SURVEY.md §3.5). Here one interpreter pass evaluates a tape on ALL grid cells at
once: the operand stack is a ``(MAX_STACK, N)`` tensor and every op is an
elementwise VPU op over the cell axis; ``vmap`` adds the population axis.

Validity semantics mirror the reference: any non-finite intermediate result
invalidates that cell's evaluation (node ``evaluate`` returning ``None``,
K:203/239) — tracked as a per-cell boolean folded through the scan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .tape import BINARY_OPS, MAX_STACK, UNARY_OPS


def _apply_unary(op_idx, x):
    """Protected unary table (K:183-188)."""
    branches = [
        lambda v: -v,                                            # neg
        jnp.sin,                                                 # sin
        jnp.cos,                                                 # cos
        lambda v: jnp.exp(jnp.clip(v, -10.0, 10.0)),             # exp (clipped)
        lambda v: jnp.log(jnp.abs(v) + 1e-9),                    # log (protected)
        lambda v: jnp.sqrt(jnp.abs(v)),                          # sqrt (protected)
        jnp.abs,                                                 # abs
        jnp.tanh,                                                # tanh
        lambda v: 1.0 / (1.0 + jnp.exp(-jnp.clip(v, -10.0, 10.0))),  # sig
    ]
    assert len(branches) == len(UNARY_OPS)
    return jax.lax.switch(op_idx, branches, x)


def _apply_binary(op_idx, a, b):
    """Protected binary table (K:216-217). Division by ~0 and invalid powers
    produce non-finite values, which the validity mask then kills — matching the
    reference's None-on-inf node semantics."""
    branches = [
        lambda a, b: a + b,
        lambda a, b: a - b,
        lambda a, b: a * b,
        lambda a, b: jnp.where(jnp.abs(b) > 1e-9, a / b,
                               jnp.sign(a) * jnp.sign(b + 1e-30) * jnp.inf),
        lambda a, b: jnp.power(a, jnp.clip(b, -5.0, 5.0)),
    ]
    assert len(branches) == len(BINARY_OPS)
    return jax.lax.switch(op_idx, branches, a, b)


def eval_tape(opcode: jax.Array, arg: jax.Array, const: jax.Array,
              variables: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Evaluate one tape on a batch of variable vectors.

    Args:
      opcode, arg: (MAX_TAPE,) int32.
      const: (MAX_TAPE,) f32.
      variables: (V, N) — one row per variable in tape-variable order, N cells.
    Returns:
      (value, valid): (N,) f32 results and per-cell validity mask.
    """
    n = variables.shape[-1]
    stack0 = jnp.zeros((MAX_STACK, n), jnp.float32)
    valid0 = jnp.ones((n,), bool)

    def step(carry, inst):
        stack, sp, valid = carry
        op, a, c = inst

        def do_nop(s, sp, v):
            return s, sp, v

        def do_const(s, sp, v):
            return s.at[sp].set(jnp.full((n,), c, jnp.float32)), sp + 1, v

        def do_var(s, sp, v):
            return s.at[sp].set(variables[a].astype(jnp.float32)), sp + 1, v

        def do_unary(s, sp, v):
            x = s[sp - 1]
            y = _apply_unary(a, x)
            return s.at[sp - 1].set(y), sp, v & jnp.isfinite(y)

        def do_binary(s, sp, v):
            rhs = s[sp - 1]
            lhs = s[sp - 2]
            y = _apply_binary(a, lhs, rhs)
            return s.at[sp - 2].set(y), sp - 1, v & jnp.isfinite(y)

        stack, sp, valid = jax.lax.switch(
            op, [do_nop, do_const, do_var, do_unary, do_binary], stack, sp, valid)
        return (stack, sp, valid), None

    (stack, sp, valid), _ = jax.lax.scan(
        step, (stack0, jnp.asarray(0, jnp.int32), valid0),
        (opcode, arg, const))
    return stack[0], valid


@partial(jax.jit)
def eval_population(tapes: dict, variables: jax.Array
                    ) -> tuple[jax.Array, jax.Array]:
    """Evaluate a stacked population of tapes: (P, MAX_TAPE) programs × (V, N)
    shared variables → (P, N) values + (P, N) validity."""
    return jax.vmap(lambda o, a, c: eval_tape(o, a, c, variables))(
        tapes["opcode"], tapes["arg"], tapes["const"])
