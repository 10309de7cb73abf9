"""Persistent XLA compilation cache setup (accelerator backends).

Probed on this runtime (round 3): the JAX persistent compilation cache WORKS
with the remote-compile TPU backend — executables serialize to disk and
reload in fresh processes (measured warmup 116 s → 17.5 s on the 2048² solve
probe). Operationally critical here because remote compiles cost 20-120 s per
distinct shape AND the remote compile helper is flaky at very large shapes
(16384² QR compiles get OOM-SIGKILLed on most attempts): with the cache, each
successful compile is banked, so a retry loop converges attempt by attempt.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = "~/.cache/jax_comp_cache"


def enable(cache_dir: str = DEFAULT_DIR, min_compile_secs: int = 5) -> bool:
    """Enable the persistent compilation cache; no-op on CPU (compiles are
    local and fast there). Returns True when enabled."""
    if jax.default_backend() == "cpu":
        return False
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return True
