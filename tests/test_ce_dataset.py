"""VLN-CE dataset loaders + obs transforms vs the reference contracts."""

import gzip
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ce.dataset import (VLNCEEpisode, load_gt_trajectories,  # noqa: E402
                                   load_rxr_dataset, load_vlnce_dataset,
                                   scenes_to_load, strided_trajectory_split)
from gridmm_tpu.ce.obs_transforms import (CenterCropperPerSensor,  # noqa: E402
                                          ResizerPerSensor, center_crop,
                                          resize_area)


def _episode(i, scene, language=None):
    instr = {"instruction_text": f"walk {i}", "instruction_tokens": [1, 2]}
    if language:
        instr["language"] = language
    return {
        "episode_id": i,
        "scene_id": f"data/scene_datasets/mp3d/{scene}/{scene}.glb",
        "start_position": [0.0, 0.0, 0.0],
        "start_rotation": [0.0, 0.0, 0.0, 1.0],
        "instruction": instr,
        "goals": [{"position": [1.0, 0.0, 0.0], "radius": 3.0}],
        "reference_path": [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]],
        "trajectory_id": i,
        "info": {"geodesic_distance": 1.0},
    }


def _write_split(path, episodes):
    with gzip.open(path, "wt") as f:
        json.dump({"episodes": episodes,
                   "instruction_vocab": {"word_list": ["walk", "to"]}}, f)


def test_vlnce_loader_filters(tmp_path):
    eps = [_episode(i, "sceneA" if i % 2 == 0 else "sceneB")
           for i in range(8)]
    _write_split(tmp_path / "val_unseen.json.gz", eps)
    episodes, vocab = load_vlnce_dataset(
        str(tmp_path / "{split}.json.gz"), "val_unseen",
        scenes_dir="/scenes")
    assert len(episodes) == 8 and vocab == ["walk", "to"]
    # scene_id prefix remapped under scenes_dir (task.py:117-124)
    assert episodes[0].scene_id.startswith("/scenes/mp3d/")
    assert scenes_to_load(episodes) == ["sceneA", "sceneB"]

    only_a, _ = load_vlnce_dataset(
        str(tmp_path / "{split}.json.gz"), "val_unseen",
        content_scenes=["sceneA"])
    assert {e.scene for e in only_a} == {"sceneA"}

    allowed, _ = load_vlnce_dataset(
        str(tmp_path / "{split}.json.gz"), "val_unseen",
        episodes_allowed=[1, 3])
    assert sorted(e.episode_id for e in allowed) == [1, 3]


def test_rxr_loader_roles_and_languages(tmp_path):
    for role, lang in (("guide", "en-US"), ("follower", "hi-IN")):
        _write_split(tmp_path / f"val_{role}.json.gz",
                     [_episode(i, "sceneC", language=lang)
                      for i in range(3)])
    episodes, _ = load_rxr_dataset(
        str(tmp_path / "{split}_{role}.json.gz"), "val")
    assert len(episodes) == 6
    en_only, _ = load_rxr_dataset(
        str(tmp_path / "{split}_{role}.json.gz"), "val",
        languages=["en-US"])
    assert len(en_only) == 3 and all(e.language == "en-US" for e in en_only)
    guide_only, _ = load_rxr_dataset(
        str(tmp_path / "{split}_{role}.json.gz"), "val", roles=["guide"])
    assert len(guide_only) == 3
    with pytest.raises(ValueError):
        load_rxr_dataset(str(tmp_path / "{split}_{role}.json.gz"), "val",
                         roles=["pilot"])


def test_gt_trajectories_and_strided_split(tmp_path):
    gt = {str(i): {"locations": [[0, 0, 0]], "actions": [1],
                   "forward_steps": 3} for i in range(7)}
    with gzip.open(tmp_path / "val_gt.json.gz", "wt") as f:
        json.dump(gt, f)
    data = load_gt_trajectories(str(tmp_path / "{split}_gt.json.gz"), "val")
    assert len(data) == 7
    # per-role merge (collect_val_traj rxr branch)
    for role in ("guide", "follower"):
        with gzip.open(tmp_path / f"val_{role}_gt.json.gz", "wt") as f:
            json.dump({f"{role}_{i}": gt["0"] for i in range(2)}, f)
    merged = load_gt_trajectories(
        str(tmp_path / "{split}_{role}_gt.json.gz"), "val")
    assert len(merged) == 4
    # rank-strided split covers all keys exactly once across ranks
    parts = [strided_trajectory_split(data, r, 3) for r in range(3)]
    flat = [k for p in parts for k in p]
    assert sorted(flat) == sorted(data.keys())
    assert abs(len(parts[0]) - len(parts[2])) <= 1


def _eps_for_scenes(sizes):
    """[(scene, n), ...] -> VLNCEEpisode list with ids '<scene><k>'."""
    out = []
    for scene, n in sizes:
        for k in range(1, n + 1):
            raw = _episode(f"{scene.lower()}{k}", scene)
            out.append(VLNCEEpisode(**{k2: v for k2, v in raw.items()
                                       if k2 != "info"}, info=raw["info"]))
    return out


def test_allocate_episodes_by_scene_hand_checked():
    """Greedy scene bin-packing (allocate_allowed_episode_by_scene,
    ss_trainer_GridMap.py:77-139), traced by hand: scenes A(4) B(3) C(3)
    D(2), world=2, average=6. A (largest) is held back as filler; C (last
    3-sized) goes to rank0, B to rank1, D to rank0 (first-min tie), then A
    tops rank0 up by 1 and rank1 by 3."""
    from gridmm_tpu.ce.dataset import allocate_episodes_by_scene

    eps = _eps_for_scenes([("A", 4), ("B", 3), ("C", 3), ("D", 2)])
    groups = allocate_episodes_by_scene(eps, 2)
    assert groups[0] == ["c1", "c2", "c3", "d1", "d2", "a1"]
    assert groups[1] == ["b1", "b2", "b3", "a2", "a3", "a4"]


def test_allocate_episodes_by_scene_properties():
    """world_size*average episodes exactly, disjoint ranks, equal counts,
    and every non-filler scene lands whole on one rank."""
    from gridmm_tpu.ce.dataset import allocate_episodes_by_scene

    sizes = [("S%02d" % i, n) for i, n in enumerate(
        [17, 3, 9, 9, 4, 12, 1, 6, 5, 2])]  # 68 episodes
    eps = allocate_episodes_by_scene(_eps_for_scenes(sizes), 4)
    assert len(eps) == 4
    assert all(len(g) == 68 // 4 for g in eps)
    flat = [e for g in eps for e in g]
    assert len(flat) == len(set(flat)) == 68  # 68 divisible: nothing dropped
    for scene, n in sizes:
        if scene == "S00":
            continue  # S00 is the largest scene -> the filler, may split
        ids = {f"{scene.lower()}{k}" for k in range(1, n + 1)}
        homes = [i for i, g in enumerate(eps) if ids & set(g)]
        assert len(homes) == 1, f"scene {scene} split across ranks {homes}"
    # single-scene and world_size=1 degenerate cases round-trip everything
    one = allocate_episodes_by_scene(_eps_for_scenes([("Z", 5)]), 1)
    assert one == [["z1", "z2", "z3", "z4", "z5"]]


def test_center_crop_golden():
    img = np.arange(6 * 8 * 1).reshape(6, 8, 1)
    out = center_crop(img, (4, 4))
    assert out.shape == (4, 4, 1)
    np.testing.assert_array_equal(out[:, :, 0], img[1:5, 2:6, 0])
    batched = center_crop(np.stack([img, img]), (4, 4))
    assert batched.shape == (2, 4, 4, 1)


def test_resize_area_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    for in_hw, out_hw in (((12, 16), (6, 8)), ((10, 10), (4, 4)),
                          ((7, 9), (5, 6)), ((4, 4), (8, 8))):
        img = rng.random((2, *in_hw, 3)).astype(np.float32)
        ours = resize_area(img, out_hw)
        t = torch.nn.functional.interpolate(
            torch.from_numpy(img).permute(0, 3, 1, 2), size=out_hw,
            mode="area").permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5,
                                   err_msg=f"{in_hw}->{out_hw}")
    # uint8: the reference float->uint8 cast TRUNCATES; match bit-exactly
    img_u8 = rng.integers(0, 255, (1, 8, 8, 3)).astype(np.uint8)
    ours = resize_area(img_u8, (4, 4))
    t = torch.nn.functional.interpolate(
        torch.from_numpy(img_u8).permute(0, 3, 1, 2).float(), size=(4, 4),
        mode="area").to(torch.uint8).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(ours, t)


def test_per_sensor_transforms():
    rng = np.random.default_rng(1)
    obs = {"rgb": rng.integers(0, 255, (8, 8, 3)).astype(np.uint8),
           "depth": rng.random((8, 8, 1)).astype(np.float32),
           "gps": np.zeros(2)}
    out = CenterCropperPerSensor([("rgb", 4), ("depth", (4, 6))])(dict(obs))
    assert out["rgb"].shape == (4, 4, 3)
    assert out["depth"].shape == (4, 6, 1)
    assert out["gps"].shape == (2,)  # untouched
    out = ResizerPerSensor([("rgb", 2)])(out)
    assert out["rgb"].shape == (2, 2, 3) and out["rgb"].dtype == np.uint8
