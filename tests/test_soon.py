"""SOON detection-metric flow: bbox-polygon scoring + object pseudo-labels.

Golden semantics from map_nav_src/soon/env.py:331-424: stopping at ANY
bbox-carrying viewpoint updates the goal; det success = predicted object
direction inside the GT polygon; spl uses the shortest-dist gt length.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.env.discrete import (DiscreteNavEnv,  # noqa: E402
                                     synthetic_episodes)
from gridmm_tpu.env.metrics import evaluate_soon_trajectory  # noqa: E402
from gridmm_tpu.env.world import SyntheticWorld  # noqa: E402


def _bbox(h, e, dh=0.3, de=0.2):
    return {"heading": h, "elevation": e, "target": {
        "left_top": {"heading": h - dh, "elevation": e + de},
        "right_top": {"heading": h + dh, "elevation": e + de},
        "right_bottom": {"heading": h + dh, "elevation": e - de},
        "left_bottom": {"heading": h - dh, "elevation": e - de}}}


def _line_world():
    """4 nodes in a line, 1m apart."""
    from gridmm_tpu.env.nav_graph import NavGraph

    g = NavGraph()
    vps = ["a", "b", "c", "d"]
    for i, vp in enumerate(vps):
        g.add_node(vp, (float(i), 0.0, 0.0))
    for u, v in zip(vps[:-1], vps[1:]):
        g.add_edge(u, v)
    return g.all_pairs_distances()


def test_soon_det_success_and_goal_update():
    shortest = _line_world()
    gt_path = ["a", "b", "c"]
    bboxes = {"c": _bbox(1.0, 0.1)}

    # stop at goal, predicted direction inside the polygon
    s = evaluate_soon_trajectory(shortest, [["a", "b", "c"]], gt_path,
                                 bboxes, 1.1, 0.05)
    assert s["success"] == 1.0 and s["det_success"] == 1.0
    assert s["det_spl"] == s["spl"] > 0
    assert s["goal_progress"] == 2.0

    # inside navigation margin but direction outside the polygon
    s = evaluate_soon_trajectory(shortest, [["a", "b", "c"]], gt_path,
                                 bboxes, 2.0, 0.05)
    assert s["success"] == 1.0 and s["det_success"] == 0.0
    assert s["det_spl"] == 0.0

    # stopping at a DIFFERENT bbox viewpoint updates the goal (env.py:345-349)
    bboxes2 = {"c": _bbox(1.0, 0.1), "d": _bbox(-1.0, 0.0)}
    s = evaluate_soon_trajectory(shortest, [["a", "b", "c", "d"]], gt_path,
                                 bboxes2, -1.0, 0.0)
    assert s["nav_error"] == 0.0 and s["success"] == 1.0
    assert s["det_success"] == 1.0

    # no bbox at the stop node -> det fails regardless of direction
    # (nav success may still hold: 1m from goal < 3m margin)
    s = evaluate_soon_trajectory(shortest, [["a", "b"]], gt_path,
                                 bboxes, 1.0, 0.1)
    assert s["det_success"] == 0.0 and s["success"] == 1.0
    assert s["nav_error"] == 1.0 and s["goal_progress"] == 1.0


def test_soon_env_eval_emits_det_metrics():
    world = SyntheticWorld(num_scans=1, nodes_per_scan=10, seed=4)
    eps = synthetic_episodes(world, num=6, seed=4, max_len=4,
                             with_objects=True, soon_bboxes=True)
    env = DiscreteNavEnv(world, world.graphs, eps, batch_size=2, seed=0)
    preds = []
    for item in eps:
        goal = item["path"][-1]
        bb = item["bboxes"][goal]
        preds.append({
            "instr_id": item["instr_id"],
            "trajectory": [[vp] for vp in item["path"]],  # perfect nav
            "pred_obj_heading": bb["heading"],
            "pred_obj_elevation": bb["elevation"],
        })
    avg, detail = env.eval_metrics(preds)
    assert avg["sr"] == 100.0
    assert avg["det_sr"] == 100.0 and avg["det_spl"] > 0
    assert "goal_progress" in avg


def test_soon_pseudo_obj_labels():
    """Pseudo-labeling recovers the object the bbox was drawn around."""
    from gridmm_tpu.data.datasets import soon_pseudo_obj_labels

    world = SyntheticWorld(num_scans=1, nodes_per_scan=10, seed=5)
    eps = synthetic_episodes(world, num=8, seed=5, max_len=4,
                             with_objects=True, soon_bboxes=True)
    truth = {e["instr_id"]: e.pop("objId") for e in eps}
    soon_pseudo_obj_labels(eps, world)
    labeled = [e for e in eps if "objId" in e]
    assert labeled, "pseudo-labeling found no objects"
    for e in labeled:
        assert e["objId"] == truth[e["instr_id"]]
        assert e["gt_obj_id"] == e["objId"]


def test_soon_agent_end_to_end():
    """Rollout -> evaluate on a SOON-style synthetic env emits det metrics
    and the og-predicted object direction feeds the polygon scoring."""
    import jax

    from tests.test_agent_e2e import tiny_cfg
    import dataclasses

    from gridmm_tpu.data.datasets import soon_pseudo_obj_labels
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.train.agent import NavAgent

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, obj_feat_size=128),
        shapes=dataclasses.replace(cfg.shapes, max_obj_len=4))
    world = SyntheticWorld(num_scans=1, nodes_per_scan=10, feat_dim=768,
                           seed=6)
    eps = synthetic_episodes(world, num=6, seed=6, max_len=4,
                             with_objects=True, soon_bboxes=True)
    soon_pseudo_obj_labels(eps, world)
    env = DiscreteNavEnv(world, world.graphs, eps,
                         batch_size=cfg.train.batch_size, seed=0)
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    agent = NavAgent(model, cfg, env, params)
    avg, preds = agent.evaluate(None)
    assert "det_sr" in avg and 0.0 <= avg["det_sr"] <= 100.0
    assert any(p.get("pred_obj_heading") is not None for p in preds)
