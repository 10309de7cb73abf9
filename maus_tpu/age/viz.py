"""Diffusion visualization (reference K10, K:572-593): heatmap of the best
expression's full diffusion grid. Import-guarded — matplotlib is optional."""
from __future__ import annotations

import numpy as np


def capture_full_grid(genome, conf) -> np.ndarray:
    """Re-run the best genome's diffusion sim capturing every time step
    (the reference's ``visualize=True`` path, K:82-116). Returns (T, N)."""
    import jax.numpy as jnp

    from . import diffusion
    from .tape import compile_tree, stack_tapes

    tapes = stack_tapes([compile_tree(genome.tree, conf.variables)])
    tapes = {k: jnp.asarray(v) for k, v in tapes.items()}
    base = jnp.asarray(np.asarray(conf.base_kernel, np.float32))

    # step the scan manually, collecting states
    n, t = conf.diffusion_n, conf.diffusion_t
    grid = np.zeros((t, n), np.float32)
    # reuse the batched sim by running prefixes would be O(T²); instead run the
    # full sim once per step-capture via the scan's ys output:
    import jax

    from .interp import eval_tape

    center = n // 2
    state = jnp.zeros((1, n), jnp.float32).at[:, center].set(1.0)
    memory = jnp.zeros((1, n), jnp.float32)
    ok = jnp.ones((1,), bool)
    grid[0] = np.asarray(state[0])
    i_norm = (jnp.arange(n, dtype=jnp.float32) / n)[None, :]

    @jax.jit
    def one(state, memory, ok, t_step):
        memory = memory + state
        trace = jnp.tanh(memory) * 0.5 + 0.5
        m_c = trace[:, center][:, None].repeat(n, axis=1)
        variables = jnp.stack(
            [trace, m_c, trace - m_c,
             jnp.full((1, n), t_step / t), i_norm], axis=1)
        val, valid = jax.vmap(lambda o, a, c, v: eval_tape(o, a, c, v))(
            tapes["opcode"], tapes["arg"], tapes["const"], variables)
        w = jnp.where(valid, 1.0 / (1.0 + jnp.exp(-jnp.clip(val, -10, 10))), 0.0)
        w = jnp.where(jnp.sum(w, axis=1, keepdims=True) < 1e-9 * n, 0.5, w)
        eff = diffusion._conv_same_batched(w, base)
        ssum = jnp.sum(eff, axis=1, keepdims=True)
        eff = eff / jnp.where(jnp.abs(ssum) >= 1e-9, ssum, 1.0)
        nxt = diffusion._conv_same_batched(state, eff)
        total = jnp.sum(nxt, axis=1)
        healthy = jnp.all(jnp.isfinite(nxt), axis=1) & (total >= 1e-7) & \
            (total <= 1e7) & (jnp.abs(ssum[:, 0]) >= 1e-9)
        ok = ok & healthy
        state = jnp.where(ok[:, None], nxt, state)
        return state, memory, ok

    for ts in range(1, t):
        state, memory, ok = one(state, memory, ok, float(ts))
        grid[ts] = np.asarray(state[0])
    return grid


def plot_best(engine, path: str = "age_best_diffusion.png"):
    """Save the reference's final heatmap (K:572-593) for the engine's best
    archived genome. Returns the path, or None when matplotlib is unavailable
    or the library is empty."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    if not engine.harmonic_library:
        return None
    best = max(engine.harmonic_library, key=lambda g: g.stability)
    grid = capture_full_grid(best, engine.conf)
    fig, ax = plt.subplots(figsize=(7, 5))
    im = ax.imshow(grid, aspect="auto", origin="lower", cmap="magma")
    ax.set_xlabel("space")
    ax.set_ylabel("time")
    ax.set_title(f"best expression (fitness {best.stability:.3f}): "
                 f"{best.tree.to_string()[:60]}")
    fig.colorbar(im, ax=ax, label="concentration")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
