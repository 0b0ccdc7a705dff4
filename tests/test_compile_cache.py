"""Persistent compilation cache (utils/compile_cache.py)."""

import os
import subprocess
import sys


def test_persistent_cache_populates(tmp_path):
    """A fresh process with the cache enabled writes executable entries.

    Runs in a subprocess: JAX initializes its persistent-cache plumbing once
    per process, so re-pointing the directory after another test already
    compiled something is not reliably picked up in-process."""
    cache_dir = str(tmp_path / "xla")
    code = (
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from gridmm_tpu.utils.compile_cache import enable_persistent_cache\n"
        f"enable_persistent_cache({cache_dir!r}, min_compile_time_secs=0.0)\n"
        "f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())\n"
        "f(jnp.ones((64, 64))).block_until_ready()\n"
    )
    env = dict(os.environ)
    env.pop("GRIDMM_COMPILE_CACHE", None)
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(__file__)))
    assert os.listdir(cache_dir), "compilation cache produced no entries"


def test_cache_opt_out(monkeypatch):
    from gridmm_tpu.utils.compile_cache import enable_persistent_cache

    monkeypatch.setenv("GRIDMM_COMPILE_CACHE", "0")
    assert enable_persistent_cache("/nonexistent/should/not/create") == ""
    assert not os.path.exists("/nonexistent/should/not/create")
