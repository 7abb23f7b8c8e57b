"""Persistent XLA compilation cache.

TPU compiles of the full train-epoch scan take minutes (the axon remote
compiler); the persistent cache turns warm restarts into seconds.  Enabled
by every CLI and by bench.py; opt out with SPATIALVAE_JAX_CACHE=0, redirect
with SPATIALVAE_JAX_CACHE=/path.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    import jax

    loc = os.environ.get("SPATIALVAE_JAX_CACHE")
    if loc == "0":
        return
    cache_dir = loc or os.path.expanduser("~/.cache/spatialvae_jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is best-effort
