"""Thin collective wrappers + the explicit ring matvec.

Most of the framework relies on GSPMD: annotate shardings, let XLA insert
``all-gather``/``reduce-scatter``/``all-reduce`` over ICI. This module is the
hand-written escape hatch for the one pattern worth controlling manually — the
row-sharded matvec ring (SURVEY.md §5.7: "the moral equivalent of ring attention
for matvecs") — plus named wrappers so solver code never calls ``lax.p*``
directly (keeps the rest of the code mesh-agnostic and unit-testable on CPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS, REPLICA_AXIS


def psum_replica(x):
    return jax.lax.psum(x, REPLICA_AXIS)


def psum_model(x):
    return jax.lax.psum(x, MODEL_AXIS)


def pmean_replica(x):
    return jax.lax.pmean(x, REPLICA_AXIS)


def all_gather_model(x, axis: int = 0):
    return jax.lax.all_gather(x, MODEL_AXIS, axis=axis, tiled=True)


def sharded_matvec(mesh: Mesh, A, X):
    """Batched matvec ``X @ A.T`` with A row-sharded over the model axis.

    Per shard: the local rows of A produce the local slice of the output; X is
    needed in full (replicated input). One ``shard_map`` call, no collective on the
    forward path — the output comes back sharded over its last axis, matching
    :func:`maus_tpu.parallel.mesh.population_matrix_sharding`.

    Args:
      A: (N, N) row-sharded.
      X: (K, N) replicated (or replica-sharded on K).
    Returns:
      (K, N) with the last axis sharded over the model axis.
    """

    def local(a_rows, x):
        return x @ a_rows.T        # (K, N_local)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(REPLICA_AXIS, None)),
        out_specs=P(REPLICA_AXIS, MODEL_AXIS))(A, X)


def ring_matvec(mesh: Mesh, A, X):
    """Ring-overlap matvec for column-sharded X: each step multiplies the local
    block of A against the currently-held X shard and ``ppermute``s the shard to
    the next device — compute overlaps the ICI transfer, the moral equivalent of
    ring attention for matvecs (SURVEY.md §5.7).

    Args:
      A: (N, N) sharded (rows over model).
      X: (K, N) sharded (columns over model).
    Returns:
      (K, N) result of X @ A.T, columns sharded over model.
    """
    n_model = mesh.shape[MODEL_AXIS]
    if A.shape[-1] % n_model != 0:
        raise ValueError(
            f"ring_matvec needs N divisible by the model axis: "
            f"N={A.shape[-1]}, model={n_model}")

    def local(a_rows, x_cols):
        # a_rows: (N/m, N) — full columns of the local row block
        # x_cols: (K, N/m) — the locally-held column shard of X
        m = jax.lax.axis_size(MODEL_AXIS)
        me = jax.lax.axis_index(MODEL_AXIS)
        ncols = x_cols.shape[-1]

        def step(i, carry):
            acc, xs = carry
            # xs currently holds the shard that started on device (me - i) % m
            src = (me - i) % m
            a_block = jax.lax.dynamic_slice_in_dim(a_rows, src * ncols, ncols,
                                                   axis=1)
            acc = acc + xs @ a_block.T
            xs = jax.lax.ppermute(
                xs, MODEL_AXIS,
                perm=[(j, (j + 1) % m) for j in range(m)])
            return acc, xs

        acc0 = jnp.zeros((x_cols.shape[0], a_rows.shape[0]), x_cols.dtype)
        # match the carry's varying-manual-axes type to the loop body's output
        acc0 = jax.lax.pcast(acc0, (REPLICA_AXIS, MODEL_AXIS), to="varying")
        acc, _ = jax.lax.fori_loop(0, m, step, (acc0, x_cols))
        return acc

    if n_model == 1:
        return X @ A.T
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(REPLICA_AXIS, MODEL_AXIS)),
        out_specs=P(REPLICA_AXIS, MODEL_AXIS))(A, X)
    return out
