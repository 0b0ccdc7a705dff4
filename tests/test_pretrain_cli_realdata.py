"""Real-data pretraining CLI: fixture jsonl + HDF5 shard end-to-end.

Builds the reference's preprocess artifact contract on disk (view/depth/grid
HDF5 keyed "{scan}_{vp}", viewpoint_info.json, {scan}_connectivity.json —
SURVEY.md 2.8) and drives cli/pretrain.py over it, matching
pretrain_src/train_r2r.py:162-333 semantics.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

h5py = pytest.importorskip("h5py")

SCAN = "scanF0"
NODES = 6
D = 128  # tiny-preset image_feat_size


def _poses(rng):
    # ring of 6 nodes; pose matrix layout: x=pose[3], y=pose[7], z=pose[11]
    pts = []
    for i in range(NODES):
        a = 2 * np.pi * i / NODES
        pts.append((4 * np.cos(a), 4 * np.sin(a), 0.1 * rng.random()))
    return pts


def build_fixture(root: Path, with_objects: bool = False):
    rng = np.random.default_rng(7)
    vps = [f"vpF{i:02d}" for i in range(NODES)]
    pts = _poses(rng)

    # connectivity (MP3D contract, utils/data.py:78-103)
    conn = []
    for i, vp in enumerate(vps):
        pose = [0.0] * 16
        pose[3], pose[7], pose[11] = pts[i]
        unob = [False] * NODES
        unob[(i + 1) % NODES] = True
        unob[(i - 1) % NODES] = True
        conn.append({"image_id": vp, "included": True,
                     "unobstructed": unob, "pose": pose, "height": 1.5})
    conn_dir = root / "connectivity"
    conn_dir.mkdir()
    (conn_dir / f"{SCAN}_connectivity.json").write_text(json.dumps(conn))

    # viewpoint info (r2r/env.py:168)
    vp_info = {f"{SCAN}_{vp}": {"x": p[0], "y": p[1], "z": p[2]}
               for vp, p in zip(vps, pts)}
    (root / "viewpoint_info.json").write_text(json.dumps(vp_info))

    # HDF5 stores (utils/data.py:29, r2r/env.py:166-167)
    with h5py.File(root / "views.hdf5", "w") as f:
        for vp in vps:
            f[f"{SCAN}_{vp}"] = rng.standard_normal(
                (36, D)).astype(np.float32) * 0.4
    with h5py.File(root / "depth.hdf5", "w") as f:
        for vp in vps:
            d = rng.integers(1500, 8000, size=(36, 128, 128)).astype(np.uint16)
            f[f"{SCAN}_{vp}"] = d
    with h5py.File(root / "grid.hdf5", "w") as f:
        for vp in vps:
            f[f"{SCAN}_{vp}"] = rng.standard_normal(
                (12, 50, D)).astype(np.float16)
    if with_objects:
        with h5py.File(root / "objects.hdf5", "w") as f:
            for vp in vps:
                dset = f.create_dataset(
                    f"{SCAN}_{vp}",
                    data=rng.standard_normal((2, D)).astype(np.float32) * 0.4)
                dset.attrs["directions"] = rng.uniform(
                    -1, 1, (2, 2)).astype(np.float32)
                dset.attrs["sizes"] = rng.uniform(
                    20, 200, (2, 2)).astype(np.float32)
                dset.attrs["obj_ids"] = np.asarray(
                    [f"o{vp}{j}" for j in range(2)], dtype="S16")

    # trajectory jsonl (R2R_*_enc contract, dataset.py:101-108)
    items = []
    for k in range(10):
        i = int(rng.integers(0, NODES))
        length = int(rng.integers(2, 5))
        path = [vps[(i + j) % NODES] for j in range(length)]
        item = {
            "instr_id": f"fx_{k}", "path_id": f"fx_{k}", "scan": SCAN,
            "path": path, "heading": float(rng.uniform(0, 6.28)),
            "instr_encoding": [101] + [int(x) for x in rng.integers(
                2000, 29000, size=int(rng.integers(6, 14)))] + [102],
        }
        if with_objects:
            item["objId"] = f"o{path[-1]}0"
        items.append(item)
    traj = root / "train.jsonl"
    traj.write_text("\n".join(json.dumps(it) for it in items))
    return traj


def _base_args(root: Path, traj: Path):
    return [
        "--traj_files", str(traj),
        "--connectivity_dir", str(root / "connectivity"),
        "--view_ft_file", str(root / "views.hdf5"),
        "--depth_file", str(root / "depth.hdf5"),
        "--grid_ft_file", str(root / "grid.hdf5"),
        "--viewpoint_info", str(root / "viewpoint_info.json"),
        "--output_dir", str(root / "out"),
        "--batch_size", "2",
    ]


@pytest.mark.slow
def test_pretrain_cli_real_data(tmp_path, capsys):
    from gridmm_tpu.cli.pretrain import main

    traj = build_fixture(tmp_path)
    state = main(_base_args(tmp_path, traj) +
                 ["--steps", "4", "--valid_every", "4"])
    assert int(state.step) == 4
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines and {"mlm_acc", "mrc_acc", "sap_acc"} <= set(lines[-1])


@pytest.mark.slow
def test_pretrain_cli_og_task(tmp_path, capsys):
    """--obj_ft_file enables object tokens + the og proxy task
    (pretrain_src/train_reverie_obj.py semantics)."""
    from gridmm_tpu.cli.pretrain import main

    traj = build_fixture(tmp_path, with_objects=True)
    main(_base_args(tmp_path, traj) + [
        "--obj_ft_file", str(tmp_path / "objects.hdf5"),
        "--tasks", "sap,og", "--mix_ratio", "1,1",
        "--steps", "3", "--valid_every", "3"])
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines and "og_acc" in lines[-1]


def test_mlm_improves_on_real_data(tmp_path):
    """Task accuracy moves with training on the fixture shard — evidence the
    MLM pipeline consumes the jsonl/HDF5 contract, not just synthetic noise."""
    from gridmm_tpu.cli.pretrain import (DatasetBatcher, build_dataset,
                                         parse_args, _resolve_config, validate)
    import jax

    from gridmm_tpu.models.pretrain import GridMMPretrain
    from gridmm_tpu.train.optimizers import build_optimizer
    from gridmm_tpu.train.pretrain import (init_pretrain_params,
                                           make_pretrain_step)
    from gridmm_tpu.train.step import create_train_state

    traj = build_fixture(tmp_path)
    args = parse_args(_base_args(tmp_path, traj))
    cfg = _resolve_config(args)
    train_ds, val_ds = build_dataset(args, cfg)
    assert len(train_ds) >= 8 and len(val_ds) >= 1

    model = GridMMPretrain(cfg.model)
    batcher = DatasetBatcher(train_ds, 4, seed=0)
    batch0 = batcher.batch("mlm")
    params = init_pretrain_params(model, cfg, jax.random.PRNGKey(0), batch0)
    tx = build_optimizer("adamw", cfg.train, 5e-4)
    state = create_train_state(cfg, params, tx)
    step = make_pretrain_step(model, cfg, "mlm", tx)
    rng = jax.random.PRNGKey(1)

    losses = []
    batch = batch0
    for it in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss_mlm"]))
    assert losses[-1] < losses[0], losses
    acc = validate(model, state.params, {"mlm": [batch0]})
    assert 0.0 <= acc["mlm_acc"] <= 1.0


def _soonify_fixture(root: Path, pseudo_idx: bool):
    """Rewrite the object store to the SOON attr contract (bboxes, no sizes;
    dataset.py:868-884) and the trajectories to SOON annotations: GT bbox
    polygons per goal viewpoint, or a precomputed obj_pseudo_label.idx."""
    rng = np.random.default_rng(11)
    with h5py.File(root / "objects.hdf5", "a") as f:
        for key in list(f.keys()):
            d = f[key]
            del d.attrs["sizes"]
            d.attrs["bboxes"] = rng.uniform(
                0, 600, (2, 4)).astype(np.float32)

    items = [json.loads(ln)
             for ln in (root / "train.jsonl").read_text().splitlines()]
    for it in items:
        del it["objId"]
        goal = it["path"][-1]
        if pseudo_idx:
            it["obj_pseudo_label"] = {"idx": 0}
        else:
            # polygon covering the full direction space -> first object at
            # the goal always matches (soon_pseudo_obj_labels contract)
            corners = {"left_top": {"heading": -7, "elevation": 7},
                       "right_top": {"heading": 7, "elevation": 7},
                       "right_bottom": {"heading": 7, "elevation": -7},
                       "left_bottom": {"heading": -7, "elevation": -7}}
            it["bboxes"] = {goal: {"target": corners}}
    (root / "train.jsonl").write_text(
        "\n".join(json.dumps(it) for it in items))


@pytest.mark.parametrize("pseudo_idx", [False, True])
@pytest.mark.slow
def test_pretrain_cli_soon_og(tmp_path, capsys, pseudo_idx):
    """SOON pretraining: og supervision from bbox pseudo-labels (derived via
    polygon matching, soon/env.py:331-424) or a precomputed
    obj_pseudo_label.idx (SoonTextPathData.get_obj_label, dataset.py:888-892).
    The object store carries SOON-style `bboxes` attrs (sizes derived)."""
    from gridmm_tpu.cli.pretrain import main

    traj = build_fixture(tmp_path, with_objects=True)
    _soonify_fixture(tmp_path, pseudo_idx)
    main(_base_args(tmp_path, traj) + [
        "--obj_ft_file", str(tmp_path / "objects.hdf5"),
        "--tasks", "og", "--mix_ratio", "1",
        "--steps", "2", "--valid_every", "2"])
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines and "og_acc" in lines[-1]


def test_pretrain_dataset_soon_labels(tmp_path):
    """The og labels produced from SOON annotations are non-degenerate: a
    'pos' trajectory ending at the goal must label a real object token."""
    from gridmm_tpu.cli.pretrain import (build_dataset, parse_args,
                                         _resolve_config)

    traj = build_fixture(tmp_path, with_objects=True)
    _soonify_fixture(tmp_path, pseudo_idx=False)
    args = parse_args(_base_args(tmp_path, traj) + [
        "--obj_ft_file", str(tmp_path / "objects.hdf5")])
    cfg = _resolve_config(args)
    train_ds, _ = build_dataset(args, cfg)
    labeled = 0
    for i in range(len(train_ds)):
        it = train_ds.get_input(i, "pos")
        if int(it["obj_label"]) >= 0:
            labeled += 1
            assert bool(it["vp_obj_mask"][int(it["obj_label"])])
    assert labeled > 0


@pytest.mark.slow
def test_pretrain_cli_aug_views(tmp_path, capsys):
    """--aug_view_ft_file swaps train views with the EnvEdit bank p=0.5
    (SoonTextPathData.get_scanvp_feature is_train branch)."""
    from gridmm_tpu.cli.pretrain import main

    traj = build_fixture(tmp_path)
    rng = np.random.default_rng(3)
    with h5py.File(tmp_path / "aug_views.hdf5", "w") as f:
        for i in range(NODES):
            f[f"{SCAN}_vpF{i:02d}"] = rng.standard_normal(
                (36, D)).astype(np.float32) * 0.4
    main(_base_args(tmp_path, traj) + [
        "--aug_view_ft_file", str(tmp_path / "aug_views.hdf5"),
        "--tasks", "mlm", "--mix_ratio", "1",
        "--steps", "2", "--valid_every", "2"])
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines and "mlm_acc" in lines[-1]
