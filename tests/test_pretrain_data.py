"""Real-format pretraining dataset: trajectory expansion + task collates."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_agent_e2e import tiny_cfg  # noqa: E402

from gridmm_tpu.data.pretrain_data import (TextPathDataset,  # noqa: E402
                                           random_word_masking)
from gridmm_tpu.env.discrete import synthetic_episodes  # noqa: E402
from gridmm_tpu.env.world import SyntheticWorld  # noqa: E402


def build_dataset(seed=0):
    cfg = tiny_cfg()
    world = SyntheticWorld(num_scans=1, nodes_per_scan=10, seed=seed)
    eps = synthetic_episodes(world, num=8, seed=seed, max_len=4)
    return cfg, TextPathDataset(eps, world, world.graphs, cfg, seed=seed)


def test_get_input_shapes_and_labels():
    cfg, ds = build_dataset()
    it = ds.get_input(0, "pos")
    s = it["traj_view_fts"].shape[0]
    assert it["traj_step_mask"].sum() >= 2
    assert it["grid_cells"].shape == (cfg.shapes.max_points,)
    # pos end -> agent at goal -> stop labels
    assert it["global_act"] == 0 and it["local_act"] == 0
    assert it["grid_target"] == 0


def test_neg_end_has_nonstop_labels():
    cfg, ds = build_dataset()
    found = False
    for i in range(len(ds.data)):
        if len(ds.data[i]["path"]) >= 3:
            it = ds.get_input(i, "neg_in_gt_path")
            if it["global_act"] > 0:
                found = True
                assert 1 <= it["grid_target"] <= 196
                assert it["gmap_mask"][it["global_act"]]
                assert not it["gmap_visited_mask"][it["global_act"]]
    assert found


def test_batches_feed_pretrain_model():
    import dataclasses
    cfg, ds = build_dataset()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, image_prob_size=16))
    ds.cfg = cfg
    from gridmm_tpu.models.pretrain import GridMMPretrain
    from gridmm_tpu.train.pretrain import init_pretrain_params, task_loss

    model = GridMMPretrain(cfg.model)
    batch = ds.build_batch([0, 1], "mlm")
    params = init_pretrain_params(model, cfg, jax.random.PRNGKey(0), batch)
    for task in ("mlm", "sap", "mrc"):
        b = ds.build_batch([0, 1], task)
        loss = float(task_loss(model, params, b, task))
        assert np.isfinite(loss) and loss >= 0, (task, loss)


def test_random_word_masking():
    import random

    ids = np.asarray([101] + list(range(2000, 2030)) + [102], np.int32)
    rng = random.Random(0)
    masked, labels = random_word_masking(ids, rng)
    sel = labels != -1
    assert sel.sum() > 0
    assert not sel[0] and not sel[-1]          # specials untouched
    np.testing.assert_array_equal(labels[sel], ids[sel])
    # at least some selected tokens replaced by [MASK]
    assert (masked[sel] == 103).sum() >= 1


def test_neg_others_trajectory():
    """Flavor semantics (pretrain_src/data/dataset.py): REVERIE neg_others
    walks the shortest path to an off-GT node (:242-246); R2R neg_others is
    just a random GT-path prefix like neg_in_gt_path (:698-701)."""
    cfg = tiny_cfg()
    world = SyntheticWorld(num_scans=1, nodes_per_scan=10, seed=0)
    eps = synthetic_episodes(world, num=8, seed=0, max_len=4)
    ds = TextPathDataset(eps, world, world.graphs, cfg, seed=0,
                         flavor="reverie")
    found_off_path = False
    for i in range(len(ds.data)):
        it_item = ds.data[i]
        traj, ref_path, end_vp, end_idx = ds.sample_trajectory(
            it_item, "neg_others")
        assert end_idx is None and traj[-1] == end_vp
        if traj[-1] not in set(it_item["path"]):
            found_off_path = True
            assert traj[0] == it_item["path"][0]
        # aliasing guard: mutating the returned trajectory must not corrupt
        # the shortest-path cache
        traj.append("junk")
        assert "junk" not in ds.shortest_paths[it_item["scan"]][
            it_item["path"][0]].get(traj[-2] if len(traj) > 1 else traj[0],
                                    [])
    assert found_off_path

    # r2r flavor: neg_others == random proper prefix of the GT path
    cfg2, ds2 = build_dataset()
    for i in range(len(ds2.data)):
        item = ds2.data[i]
        for _ in range(4):
            traj, ref_path, end_vp, end_idx = ds2.sample_trajectory(
                item, "neg_others")
            assert ref_path == list(item["path"])
            assert traj == item["path"][: end_idx + 1]
            assert end_idx < len(item["path"]) - 1 or len(item["path"]) < 2


def build_object_dataset(seed=0):
    """REVERIE-style dataset: object tokens + OG labels."""
    import dataclasses
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, obj_feat_size=128,
                                  image_prob_size=16),
        shapes=dataclasses.replace(cfg.shapes, max_obj_len=4))
    world = SyntheticWorld(num_scans=1, nodes_per_scan=10, feat_dim=128,
                           seed=seed)
    eps = synthetic_episodes(world, num=8, seed=seed, max_len=4,
                             with_objects=True)
    return cfg, TextPathDataset(eps, world, world.graphs, cfg, seed=seed)


def test_og_labels_and_object_tokens():
    """Object trajectories emit nav_type-2 tokens and a real OG target
    (ref pretrain_src/data/dataset.py:90-230, tasks.py:381-430)."""
    cfg, ds = build_object_dataset()
    got_label = False
    for i in range(len(ds.data)):
        it = ds.get_input(i, "pos")
        s_last = int(it["traj_step_mask"].sum()) - 1
        obj_tok = it["traj_nav_types"][s_last] == 2
        # goal node was sampled to have objects
        assert obj_tok.sum() >= 1
        # vp_obj_mask mirrors last-step object tokens at +1 ([stop] offset)
        np.testing.assert_array_equal(
            it["vp_obj_mask"][1: 1 + len(obj_tok)], obj_tok)
        lab = int(it["obj_label"])
        if lab >= 0:
            got_label = True
            assert it["vp_obj_mask"][lab]
    assert got_label


@pytest.mark.slow
def test_og_task_trains():
    """task_loss('og') on non-degenerate labels is finite and decreases."""
    import jax
    import optax

    from gridmm_tpu.models.pretrain import GridMMPretrain
    from gridmm_tpu.train.pretrain import init_pretrain_params, task_loss

    cfg, ds = build_object_dataset()
    model = GridMMPretrain(cfg.model)
    batch = ds.build_batch(list(range(6)), "og")
    labels = np.asarray(batch.obj_labels)
    assert (labels >= 0).sum() >= 2, "fixture must have real OG targets"
    params = init_pretrain_params(model, cfg, jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    loss0 = None
    for _ in range(5):
        loss, grads = jax.value_and_grad(
            lambda p: task_loss(model, p, batch, "og"))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        loss0 = loss0 if loss0 is not None else float(loss)
    assert np.isfinite(loss0) and loss0 > 0
    final = float(task_loss(model, params, batch, "og"))
    assert final < loss0


def test_mrc_never_masks_object_tokens():
    cfg, ds = build_object_dataset()
    batch = ds.build_batch(list(range(6)), "mrc")
    masks = np.asarray(batch.view_mrc_masks)
    nav_types = np.asarray(batch.traj_nav_types)
    step_mask = np.asarray(batch.traj_step_mask)
    for i in range(masks.shape[0]):
        last = int(step_mask[i].sum()) - 1
        assert not (masks[i] & (nav_types[i, last] == 2)).any()


def test_neg_others_labels_never_visited():
    """The SAP teacher must never label a visited (masked-to--inf) node — an
    infinite loss would poison pretraining (reference restricts the teacher to
    unvisited nodes, dataset.py get_act_labels)."""
    cfg, ds = build_dataset()
    for i in range(len(ds.data)):
        for _ in range(6):
            inp = ds.get_input(i, "neg_others")
            ga = int(inp["global_act"])
            if ga > 0:
                assert inp["gmap_mask"][ga]
                assert not inp["gmap_visited_mask"][ga], i
