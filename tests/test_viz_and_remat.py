"""Grid visualization + remat trajectory loss smoke."""

import dataclasses
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_agent_e2e import tiny_cfg  # noqa: E402


def test_grid_png(tmp_path):
    from gridmm_tpu.utils.visualize import grid_occupancy_image, save_grid_png

    mask = np.zeros((196,), bool)
    mask[[0, 50, 100, 195]] = True
    scores = np.zeros((196,))
    scores[50] = 1.0
    img = grid_occupancy_image(mask, scores)
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    p = tmp_path / "grid.png"
    save_grid_png(str(p), mask, scores)
    assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


@pytest.mark.slow
def test_remat_matches_no_remat():
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.train.step import trajectory_loss
    from gridmm_tpu.train.synthetic import synthetic_trajectory_batch

    cfg = tiny_cfg()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    batch = synthetic_trajectory_batch(cfg, batch=2, num_steps=2)

    cfg_r = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat_steps=True))
    cfg_n = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat_steps=False))
    l_r, g_r = jax.value_and_grad(
        lambda p: trajectory_loss(model, cfg_r, p, batch))(params)
    l_n, g_n = jax.value_and_grad(
        lambda p: trajectory_loss(model, cfg_n, p, batch))(params)
    assert abs(float(l_r) - float(l_n)) < 1e-5
    leaves_r = jax.tree_util.tree_leaves(g_r)
    leaves_n = jax.tree_util.tree_leaves(g_n)
    for a, b in zip(leaves_r, leaves_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_soon_preset():
    from gridmm_tpu.config import soon_config

    cfg = soon_config()
    assert cfg.model.obj_feat_size > 0
    assert cfg.shapes.max_txt_len == 100  # run_soon.sh --max_instr_len


def test_top_down_trajectory_image(tmp_path):
    from gridmm_tpu.utils.visualize import (save_png,
                                            top_down_trajectory_image)

    gt = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0)]
    pred = [(0.0, 0.0), (1.5, 0.5), (2.5, 1.5)]
    img = top_down_trajectory_image(gt, pred, size=128)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    flat = img.reshape(-1, 3)
    # both path colors present, start marker present
    assert (flat == (60, 200, 60)).all(-1).any()
    assert (flat == (220, 60, 60)).all(-1).any()
    assert (flat == (40, 90, 220)).all(-1).any()
    save_png(str(tmp_path / "map.png"), img)
    assert (tmp_path / "map.png").read_bytes()[:4] == b"\x89PNG"
