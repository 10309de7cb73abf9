"""Checkpoint / resume (SURVEY.md §5.4).

The reference has no serialization — ``evolve()`` runs to completion or dies.
Here the entire solver state is one pytree (:class:`EvolveCarry`: population SoA,
strategy scalars, cached factorization, PRNG keys), so checkpointing is a flat
leaf dump and resume is re-entering the jitted loop with the loaded carry.

Format: a single ``.npz`` with positional leaf arrays — no pickling. Loading
requires a structural template (built by ``init_carry`` from the same config),
which doubles as a schema check: leaf count/shape/dtype mismatches fail loudly
instead of resuming garbage.
"""
from __future__ import annotations

import jax
import numpy as np


def save_state(path: str, state) -> int:
    """Dump any pytree's leaves to ``path`` (.npz). Returns the leaf count."""
    leaves = jax.tree.leaves(state)
    arrays = {f"leaf_{i:04d}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, **arrays)
    return len(leaves)


def load_state(path: str, template):
    """Rebuild a pytree with ``template``'s structure and the file's leaves."""
    with np.load(path) as data:
        names = sorted(data.files)
        leaves = [data[n] for n in names]
    t_leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template expects "
            f"{len(t_leaves)} — config/shape mismatch")
    out = []
    for i, (got, want) in enumerate(zip(leaves, t_leaves)):
        want = np.asarray(want)
        if got.shape != want.shape:
            raise ValueError(f"leaf {i}: checkpoint shape {got.shape} != "
                             f"template {want.shape}")
        out.append(got.astype(want.dtype))
    return jax.tree.unflatten(treedef, out)
