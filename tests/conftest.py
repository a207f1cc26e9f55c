"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices so mesh/sharding
tests run without real TPU hardware (SURVEY.md §4). The environment's axon
site hook pre-registers a remote TPU platform and overrides JAX_PLATFORMS,
so the platform must be forced via jax.config AFTER import, before any
device query.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated suite runs skip recompiles
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR",
                            "/tmp/rdm_tpu_jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# fp32 test tensors should get true fp32 matmuls (the JAX default is
# bf16-grade even on CPU); production code runs bf16 explicitly.
jax.config.update("jax_default_matmul_precision", "highest")
