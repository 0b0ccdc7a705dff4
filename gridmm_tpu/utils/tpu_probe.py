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

# print the resolved backend name — the exact token jax_platforms accepts
# (device.platform can differ from the registered plugin platform name)
_PROBE = ("import jax; jax.devices(); print(jax.default_backend())")


def ensure_live_backend(timeout_s: float | None = None) -> str:
    """Return the platform that is safe to use, forcing CPU on a dead tunnel.

    Runs ``jax.devices()`` in a child process bounded by ``timeout_s``
    (default 90, overridable via GRIDMM_TPU_PROBE_TIMEOUT for slow-tunnel
    days). On ANY probe failure — timeout, spawn error, crash — calls
    ``jax.config.update("jax_platforms", "cpu")`` in THIS process (which must
    not have initialized a backend yet) and returns ``"cpu"``, so unattended
    runs always degrade instead of hanging or crashing.

    On success the platform is NOT pinned (except the trivially safe "cpu"):
    pinning the reported name is unsafe with the hosted plugin — the probe's
    ``jax.default_backend()`` reports "tpu", but ``jax_platforms=tpu``
    routes initialization to the local libtpu path instead of the tunnel
    plugin and fails with "No jellyfish device found" (measured on this
    image). The probe-then-use race therefore stays open by design; it only
    costs a hang when the tunnel dies within the probe-to-init window.
    Set GRIDMM_SKIP_TPU_PROBE=1 to skip (e.g. in tests that force CPU).
    """
    if os.environ.get("GRIDMM_SKIP_TPU_PROBE") == "1":
        return "unprobed"
    if timeout_s is None:
        try:
            timeout_s = float(os.environ.get("GRIDMM_TPU_PROBE_TIMEOUT", 90))
        except ValueError:
            timeout_s = 90.0
    import jax

    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE], capture_output=True,
            timeout=timeout_s, text=True, cwd=os.getcwd())
        if out.returncode == 0 and out.stdout.strip():
            platform = out.stdout.strip().splitlines()[-1]
            if platform == "cpu":
                jax.config.update("jax_platforms", "cpu")
            if platform != "none":
                return platform
    except Exception:  # TimeoutExpired, OSError spawning the child, ...
        pass
    jax.config.update("jax_platforms", "cpu")
    print("[tpu_probe] accelerator backend unreachable "
          f"(probe exceeded {timeout_s:.0f}s or errored); "
          "falling back to CPU", file=sys.stderr)
    return "cpu"
