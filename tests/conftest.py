"""Test harness config.

Per SURVEY.md §4.5: tests run on the CPU backend with 8 virtual devices so the
sharded path (parallel/) can be exercised without a real TPU pod.  Env vars
must be set before the first jax import.
"""

import os
import sys

# PYTEST_TPU=1 selects the ON-CHIP tier (tests/test_tpu.py, `-m tpu`): the
# real TPU stays the backend and no virtual CPU devices are forced.
# Default (unset): CPU backend with 8 virtual devices (SURVEY.md §4.5).
_TPU_TIER = os.environ.get("PYTEST_TPU", "") == "1"

if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"   # the env presets a TPU platform
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's TPU plugin overrides JAX_PLATFORMS; the config update is
# honored, so force the CPU backend here (before any backend initialisation).
if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the gridded/pallas steps compile slowly on the
# CPU backend; cache across test runs.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
