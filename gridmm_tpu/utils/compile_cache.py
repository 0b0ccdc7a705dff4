"""Persistent XLA compilation cache.

The reference stack pays its (CUDA) warmup per process and amortizes it over
long trainings; on TPU the first XLA compile of the full CE perception +
navigation graphs is minutes of wall clock (and through a tunneled dev chip,
tens of minutes). JAX can persist compiled executables keyed by HLO hash so
every later process — eval pollers, pre-emption restarts, benchmarks —
reloads them instead of recompiling. This module turns that on with sane
defaults; all CLIs and bench scripts call it at startup.

Safe everywhere: backends whose PJRT plugin cannot serialize executables
(some experimental plugins) simply log a warning and compile as before.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "gridmm_tpu", "xla")

_active_dir: str | None = None


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_time_secs: float = 1.0) -> str:
    """Idempotently enable the on-disk compilation cache.

    cache_dir defaults to $GRIDMM_COMPILE_CACHE or ~/.cache/gridmm_tpu/xla;
    set GRIDMM_COMPILE_CACHE=0 to disable entirely (e.g. for compile-time
    benchmarking). Calling again with a different dir re-points the cache.
    Returns the directory in use ('' when disabled)."""
    global _active_dir
    env = os.environ.get("GRIDMM_COMPILE_CACHE")
    if env == "0":
        return ""
    cache_dir = cache_dir or env or DEFAULT_DIR
    if _active_dir == cache_dir:
        return cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache anything that took real compile time; tiny programs recompile
    # faster than they deserialize
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _active_dir = cache_dir
    return cache_dir
