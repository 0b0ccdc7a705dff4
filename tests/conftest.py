"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count); real-TPU benchmarking happens in
bench.py, not in tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The hosted TPU plugin ignores JAX_PLATFORMS; force CPU through jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
