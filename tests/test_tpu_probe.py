"""tpu_probe: bounded backend liveness probe + CPU fallback."""

import jax

from gridmm_tpu.utils import tpu_probe


def test_skip_env(monkeypatch):
    monkeypatch.setenv("GRIDMM_SKIP_TPU_PROBE", "1")
    assert tpu_probe.ensure_live_backend(timeout_s=0.01) == "unprobed"


def test_healthy_probe(monkeypatch):
    monkeypatch.delenv("GRIDMM_SKIP_TPU_PROBE", raising=False)
    monkeypatch.setattr(tpu_probe, "_PROBE", "print('cpu')")
    assert tpu_probe.ensure_live_backend(timeout_s=30.0) == "cpu"


def test_hung_probe_falls_back_to_cpu(monkeypatch):
    monkeypatch.delenv("GRIDMM_SKIP_TPU_PROBE", raising=False)
    monkeypatch.setattr(tpu_probe, "_PROBE",
                        "import time; time.sleep(60); print('tpu')")
    assert tpu_probe.ensure_live_backend(timeout_s=1.0) == "cpu"
    # the fallback pinned this process to the CPU backend (conftest already
    # does the same for the suite, so this is a no-op assert of the config)
    assert jax.config.jax_platforms == "cpu"


def test_errored_probe_falls_back_to_cpu(monkeypatch):
    monkeypatch.delenv("GRIDMM_SKIP_TPU_PROBE", raising=False)
    monkeypatch.setattr(tpu_probe, "_PROBE", "raise RuntimeError('boom')")
    assert tpu_probe.ensure_live_backend(timeout_s=30.0) == "cpu"


def test_spawn_failure_falls_back_to_cpu(monkeypatch):
    """An OSError spawning the child (not just a timeout) must also take the
    CPU fallback, never propagate into the unattended bench run."""
    monkeypatch.delenv("GRIDMM_SKIP_TPU_PROBE", raising=False)

    def boom(*a, **k):
        raise OSError("spawn failed")

    monkeypatch.setattr(tpu_probe.subprocess, "run", boom)
    assert tpu_probe.ensure_live_backend(timeout_s=30.0) == "cpu"


def test_timeout_env_override(monkeypatch):
    """GRIDMM_TPU_PROBE_TIMEOUT bounds the probe when no timeout is passed."""
    monkeypatch.delenv("GRIDMM_SKIP_TPU_PROBE", raising=False)
    monkeypatch.setenv("GRIDMM_TPU_PROBE_TIMEOUT", "1")
    monkeypatch.setattr(tpu_probe, "_PROBE",
                        "import time; time.sleep(60); print('tpu')")
    assert tpu_probe.ensure_live_backend() == "cpu"


def test_successful_probe_pins_only_cpu(monkeypatch):
    """A cpu-probed platform is pinned (trivially safe); an accelerator name
    is returned UNPINNED — jax_platforms=tpu routes init to local libtpu
    instead of the tunnel plugin and fails (measured; see module docstring)."""
    import jax as _jax

    monkeypatch.delenv("GRIDMM_SKIP_TPU_PROBE", raising=False)
    monkeypatch.setattr(tpu_probe, "_PROBE", "print('cpu')")
    assert tpu_probe.ensure_live_backend(timeout_s=30.0) == "cpu"
    assert _jax.config.jax_platforms == "cpu"
    monkeypatch.setattr(tpu_probe, "_PROBE", "print('tpu')")
    assert tpu_probe.ensure_live_backend(timeout_s=30.0) == "tpu"
    # conftest pinned cpu for the suite; the probe must not have re-pinned it
    assert _jax.config.jax_platforms == "cpu"
