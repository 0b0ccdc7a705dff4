"""REVERIE-style object grounding: obj tokens, og teacher/loss, det metrics."""

import dataclasses
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_agent_e2e import tiny_cfg  # noqa: E402

from gridmm_tpu.env.discrete import DiscreteNavEnv, synthetic_episodes  # noqa: E402
from gridmm_tpu.env.metrics import point_in_polygon  # noqa: E402
from gridmm_tpu.env.world import SyntheticWorld  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.train.agent import NavAgent  # noqa: E402
from gridmm_tpu.train.step import create_train_state, make_train_step  # noqa: E402


def build_reverie(seed=0):
    base = tiny_cfg()
    cfg = dataclasses.replace(
        base, model=dataclasses.replace(base.model, obj_feat_size=128))
    world = SyntheticWorld(num_scans=1, nodes_per_scan=10, feat_dim=768,
                           seed=seed)
    # REVERIE episodes always carry a gt object at the goal viewpoint:
    # with_objects resamples until every goal exposes one (det_sr shares
    # sr's support) and attaches objId + gt_obj_id/gt_end_vps
    episodes = synthetic_episodes(world, num=10, seed=seed, max_len=4,
                                  with_objects=True)
    env = DiscreteNavEnv(world, world.graphs, episodes, batch_size=3,
                         seed=seed)
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(seed))
    agent = NavAgent(model, cfg, env, params)
    return cfg, env, model, agent


def test_reverie_rollout_and_det_metrics():
    cfg, env, model, agent = build_reverie()
    traj, batch, _ = agent.rollout(feedback="teacher", record=True)
    assert batch is not None
    # obj supervision present for items whose goal has objects
    assert batch.steps.vp_obj_mask.shape[-1] == cfg.shapes.max_vp_len
    preds = [{"instr_id": t["instr_id"], "trajectory": t["trajectory"],
              "pred_obj_id": t.get("pred_obj_id")} for t in traj]
    avg, _ = env.eval_metrics(preds)
    assert "det_sr" in avg and "det_spl" in avg
    assert 0.0 <= avg["det_sr"] <= avg["sr"] + 1e-9 or avg["sr"] == 0.0


@pytest.mark.slow
def test_reverie_training_step_with_og_loss():
    cfg, env, model, agent = build_reverie()
    _, batch, _ = agent.rollout(feedback="teacher", record=True)
    state = create_train_state(cfg, agent.params)
    step = jax.jit(make_train_step(model, cfg))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_reverie_eval_reference_semantics():
    """reverie/env.py:685-709: success = stop AT an object-visible vp,
    oracle = pass THROUGH one (membership, not distance), rgs = unconditional
    str(pred)==str(gt)."""
    from gridmm_tpu.env.metrics import (aggregate_metrics,
                                        evaluate_reverie_trajectory)

    vps = ["a", "b", "c", "d"]  # collinear, 2 m apart
    shortest = {u: {v: abs(i - j) * 2.0 for j, v in enumerate(vps)}
                for i, u in enumerate(vps)}
    # object visible at {b, c}; agent passes b, stops at d, grounds the gt id
    s = evaluate_reverie_trajectory(
        shortest, [["a"], ["b"], ["d"]], ["a", "b", "c"], ["b", "c"],
        "obj1", "obj1")
    assert s["success"] == 0.0
    assert s["oracle_success"] == 1.0
    assert s["rgs"] == 1.0 and s["rgspl"] > 0.0  # not gated on success
    # stop at goal but ground nothing: str(None) != "obj1"
    s2 = evaluate_reverie_trajectory(
        shortest, [["a"], ["b"], ["c"]], ["a", "b", "c"], ["b", "c"],
        None, "obj1")
    assert s2["success"] == 1.0 and s2["rgs"] == 0.0 and s2["rgspl"] == 0.0
    avg = aggregate_metrics([s, s2])
    assert avg["rgs"] == 50.0 and "rgspl" in avg
    assert avg["oracle_sr"] == 100.0


def test_point_in_polygon():
    square = [(0, 0), (2, 0), (2, 2), (0, 2)]
    assert point_in_polygon(1, 1, square)
    assert not point_in_polygon(3, 1, square)
    assert not point_in_polygon(-0.1, 1, square)
