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


_auto_done = False


def enable_once() -> None:
    """Library-level auto-enable (MausSolver construction, accelerator
    backends): compiles on this runtime cost 20-120 s each, so banking them
    is almost always what the user wants. Opt out with
    ``MAUS_NO_COMPILE_CACHE=1``; an explicit user-set cache dir is never
    overridden."""
    global _auto_done
    if _auto_done:
        return
    _auto_done = True
    if os.environ.get("MAUS_NO_COMPILE_CACHE") == "1":
        return
    try:
        if jax.config.jax_compilation_cache_dir:
            return      # user already configured one
    except AttributeError:
        pass
    try:
        enable()
    except Exception:   # cache setup must never break a solve
        pass
