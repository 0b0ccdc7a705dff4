"""Liveness probe for the hosted TPU backend.

The dev chip is reached through a tunnel that can be down for hours at a
time; when it is, *backend initialization itself* hangs (``jax.devices()``
never returns), so any entry point that touches jax — including the headline
benchmark the driver runs unattended — would block forever instead of
degrading. ``ensure_live_backend`` probes device init in a **subprocess**
with a hard timeout (the hang cannot be interrupted in-process) and, when
the probe fails, pins this process to the CPU backend before jax initializes.

Note the axon plugin ignores the ``JAX_PLATFORMS`` environment variable; the
only reliable override is ``jax.config.update("jax_platforms", "cpu")``
*before* first backend touch — which is why this must run ahead of any other
jax call (see tests/conftest.py for the same trick).
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE = ("import jax; d = jax.devices(); "
          "print(d[0].platform if d else 'none')")


def ensure_live_backend(timeout_s: float = 90.0) -> str:
    """Return the platform that is safe to use, forcing CPU on a dead tunnel.

    Runs ``jax.devices()`` in a child process bounded by ``timeout_s``. On
    timeout or error, calls ``jax.config.update("jax_platforms", "cpu")`` in
    THIS process (which must not have initialized a backend yet) and returns
    ``"cpu"``. On success returns the probed platform name. Set
    GRIDMM_SKIP_TPU_PROBE=1 to skip (e.g. in tests that already force CPU).
    """
    if os.environ.get("GRIDMM_SKIP_TPU_PROBE") == "1":
        return "unprobed"
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE], capture_output=True,
            timeout=timeout_s, text=True, cwd=os.getcwd())
        if out.returncode == 0 and out.stdout.strip():
            return out.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        pass
    import jax

    jax.config.update("jax_platforms", "cpu")
    print("[tpu_probe] accelerator backend unreachable "
          f"(probe exceeded {timeout_s:.0f}s or errored); "
          "falling back to CPU", file=sys.stderr)
    return "cpu"
