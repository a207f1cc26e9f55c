"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax initializes,
so mesh/sharding tests run without real TPU hardware (SURVEY.md §4).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fp32 test tensors should get true fp32 matmuls (the JAX default is
# bf16-grade even on CPU); production code runs bf16 explicitly.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
