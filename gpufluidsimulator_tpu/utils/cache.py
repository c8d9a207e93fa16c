"""Persistent XLA compilation cache setup.

This environment's TPU compiles go through a remote-compile service with
10s-to-minutes latency per program (measured 40s -> 1.4s with the cache for
the 65k 2D step; an 18-minute 4M compile becomes seconds on re-run).  Call
``enable()`` before the first jit; all CLI/bench/driver entry points do.
"""

from __future__ import annotations

import os


def enable(path: str = "") -> str:
    import jax

    path = path or os.environ.get(
        "FLUID_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "gpufluidsimulator_tpu", "jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
