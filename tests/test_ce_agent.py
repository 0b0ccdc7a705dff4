"""Continuous-env (VLN-CE) agent end-to-end on the synthetic arena."""

import dataclasses
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ce.env import SyntheticContinuousEnv, ce_episode_metrics  # noqa: E402


def build_ce_agent(img=56, depth_sz=256):
    from gridmm_tpu.ce.factory import build_ce_agent as _build

    return _build(img=img, depth_sz=depth_sz, tiny=True)


def test_ce_rollout_runs():
    cfg, agent = build_ce_agent()
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=0)
    metrics = agent.rollout(env, max_steps=4, feedback="argmax")
    assert len(metrics) == 2
    for m in metrics:
        assert 0.0 <= m["sr"] <= 1.0
        assert np.isfinite(m["nDTW"]) and m["tl"] >= 0


def test_ce_teacher_beats_or_matches_random():
    cfg, agent = build_ce_agent()
    env_t = SyntheticContinuousEnv(num_envs=3, image_size=56, depth_size=256,
                                   seed=7)
    m_teacher = agent.rollout(env_t, max_steps=6, feedback="teacher")
    ne_teacher = np.mean([m["ne"] for m in m_teacher])
    # teacher rollouts must reduce distance-to-goal vs the ~5m start
    assert ne_teacher < 4.0, m_teacher


def test_ce_metrics_shapes():
    path = [np.array([0.0, 0.0]), np.array([1.0, 0.0]), np.array([2.0, 0.0])]
    gt = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    m = ce_episode_metrics(path, gt)
    assert m["sr"] == 1.0 and m["spl"] > 0.99 and m["nDTW"] > 0.99
