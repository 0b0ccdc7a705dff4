"""Waypoint predictor + NMS tests."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.models.waypoint import (WaypointConfig, WaypointPredictor,  # noqa: E402
                                        neighbor_attention_mask, waypoint_nms)


def test_neighbor_mask_circular():
    m = np.asarray(neighbor_attention_mask(12, 1))
    assert m[0, 0] and m[0, 1] and m[0, 11]        # wraps around
    assert not m[0, 2] and not m[0, 6]
    assert (m.sum(1) == 3).all()


def test_predictor_shapes_and_finiteness():
    cfg = WaypointConfig(hidden_dim=64, rgb_feat_dim=96, depth_feat_dim=48,
                         num_layers=1, num_heads=4)
    model = WaypointPredictor(cfg)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((2 * 12, 96)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((2 * 12, 48)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), rgb, depth)
    out = model.apply(params, rgb, depth)
    assert out.shape == (2, 120, 12)
    assert bool(jnp.isfinite(out).all())


def test_depth_only_variant():
    cfg = WaypointConfig(hidden_dim=64, depth_feat_dim=48, num_layers=1,
                         num_heads=4, use_rgb=False)
    model = WaypointPredictor(cfg)
    depth = jnp.ones((12, 48))
    params = model.init(jax.random.PRNGKey(0), None, depth)
    out = model.apply(params, None, depth)
    assert out.shape == (1, 120, 12)


def test_nms_selects_separated_peaks():
    a, d = 120, 12
    hm = np.zeros((1, a, d), np.float32)
    hm[0, 10, 5] = 3.0
    hm[0, 11, 5] = 2.5   # within suppression radius of the first -> dropped
    hm[0, 60, 2] = 2.0
    hm[0, 118, 8] = 1.5
    out = np.asarray(waypoint_nms(jnp.asarray(hm), max_predictions=3,
                                  sigma=(4.0, 4.0)))
    kept = sorted(zip(*np.nonzero(out[0])))
    assert (10, 5) in kept and (60, 2) in kept and (118, 8) in kept
    assert (11, 5) not in kept
    assert len(kept) == 3


def test_nms_circular_suppression():
    a, d = 120, 12
    hm = np.zeros((1, a, d), np.float32)
    hm[0, 0, 5] = 3.0
    hm[0, 118, 5] = 2.5  # circularly within radius 4 of angle 0 -> suppressed
    out = np.asarray(waypoint_nms(jnp.asarray(hm), max_predictions=2,
                                  sigma=(4.0, 4.0)))
    assert out[0, 0, 5] > 0
    assert out[0, 118, 5] == 0
