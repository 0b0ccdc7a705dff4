"""Continuous-env (VLN-CE) agent end-to-end on the synthetic arena."""

import dataclasses
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ce.agent import CEAgent  # noqa: E402
from gridmm_tpu.ce.encoders import DepthTower, RgbTower  # noqa: E402
from gridmm_tpu.ce.env import SyntheticContinuousEnv, ce_episode_metrics  # noqa: E402
from gridmm_tpu.config import (GridMMConfig, ModelConfig,  # noqa: E402
                               NavigatorShapes, TrainConfig, r2r_ce_config)
from gridmm_tpu.models.clip_vit import ClipVisionConfig, ClipVisionTransformer  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.models.waypoint import WaypointConfig, WaypointPredictor  # noqa: E402


def build_ce_agent(img=64, depth_sz=256):
    base = r2r_ce_config()
    cfg = dataclasses.replace(
        base,
        model=ModelConfig(
            vocab_size=30522, hidden_size=64, num_attention_heads=4,
            intermediate_size=128, num_l_layers=1, num_x_layers=1,
            num_pano_layers=1, image_feat_size=64,
            max_position_embeddings=32),
        grid=dataclasses.replace(base.grid, feature_dim=64, max_steps=4),
        shapes=NavigatorShapes(max_txt_len=16, max_gmap_len=16, max_vp_len=20,
                               max_points=4 * 588),
        train=TrainConfig(max_action_len=4),
    )
    navigator = GridMMNavigator(cfg.model)
    nav_params = init_navigator(navigator, cfg.shapes, jax.random.PRNGKey(0))

    wp_cfg = WaypointConfig(hidden_dim=64, num_heads=4, num_layers=1,
                            rgb_feat_dim=2048 * 7 * 7 // 49,  # tiny tower dim
                            depth_feat_dim=128 * 16)
    wp = WaypointPredictor(wp_cfg)
    # tower output dims must match the predictor's input contract
    rgb_tower = RgbTower(out_ch=wp_cfg.rgb_feat_dim // 49, grid=7)
    depth_tower = DepthTower(out_ch=128)

    import jax.numpy as jnp
    rgb0 = jnp.zeros((12, img, img, 3), jnp.uint8)
    dep0 = jnp.zeros((12, depth_sz, depth_sz, 1))
    rgb_params = rgb_tower.init(jax.random.PRNGKey(1), rgb0)
    depth_params = depth_tower.init(jax.random.PRNGKey(2), dep0)
    rgb_f = rgb_tower.apply(rgb_params, rgb0)
    dep_f = depth_tower.apply(depth_params, dep0)
    wp_params = wp.init(jax.random.PRNGKey(3), rgb_f, dep_f)

    # exactly 7x7 patches + cls = 50 tokens feed the 49 points/view contract
    clip_cfg = ClipVisionConfig(input_resolution=56, patch_size=8, width=64,
                                layers=1, heads=4, compute_dtype="float32")
    clip = ClipVisionTransformer(clip_cfg)
    clip_params = clip.init(jax.random.PRNGKey(4),
                            jnp.zeros((1, 56, 56, 3)))

    agent = CEAgent(cfg, navigator, nav_params, wp, wp_params,
                    clip_model=clip, clip_params=clip_params,
                    rgb_tower=rgb_tower, rgb_params=rgb_params,
                    depth_tower=depth_tower, depth_params=depth_params)
    return cfg, agent


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
