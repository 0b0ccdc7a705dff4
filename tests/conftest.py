"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count); real-TPU benchmarking happens in
bench.py, not in tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Tests compile hundreds of small graphs and run each a handful of times, so
# XLA:CPU codegen effort is mostly overhead. -O1 is the measured sweet spot
# on this 1-core box: train-step compile 43s -> 31s AND the execution-heavy
# tests run faster than at -O2 (119s vs 143s for the two worst); -O0 halves
# compiles but its 3x-slower execution LOST 4 min of suite total. Results
# are bit-identical (no fast-math; FP semantics preserved at every level).
# Production/bench paths never see these flags — this is test config only.
if "xla_backend_optimization_level" not in flags:
    flags += (" --xla_backend_optimization_level=1"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The hosted TPU plugin ignores JAX_PLATFORMS; force CPU through jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Dedupe identical compiles across tests: fixtures rebuild models/agents with
# fresh jax.jit closures, so the in-memory jit cache never hits across tests —
# the on-disk cache is keyed by HLO hash and does (intra-run on a cold box,
# across runs locally). Entries are host-local (~/.cache), so the
# machine-pinned-AOT concern from CLAUDE.md does not apply; set
# GRIDMM_COMPILE_CACHE=0 to measure true cold-compile times.
import sys  # noqa: E402
from pathlib import Path  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from gridmm_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(min_compile_time_secs=2.0)
