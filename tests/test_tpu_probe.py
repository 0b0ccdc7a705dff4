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
