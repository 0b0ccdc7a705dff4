"""Continuous-env (VLN-CE) agent end-to-end on the synthetic arena."""

import dataclasses
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ce.env import SyntheticContinuousEnv, ce_episode_metrics  # noqa: E402


def build_ce_agent(img=56, depth_sz=256):
    from gridmm_tpu.ce.factory import build_ce_agent as _build

    return _build(img=img, depth_sz=depth_sz, tiny=True)


@pytest.mark.slow
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
    # num_envs=2 matches the batch shape every other CE test compiles, so the
    # persistent compile cache serves this rollout's graphs intra-run
    env_t = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
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


def test_ce_metrics_reference_semantics():
    """base_il_trainer.py:583-611 details: success needs the agent's STOP and
    distance <= 3.0 (inclusive); oracle success ignores stopping; SPL's
    reference length is the STARTING distance-to-goal distance[0]; eval-mode
    collision flags reduce to their mean."""
    path = [np.zeros(2), np.array([5.0, 0.0])]
    gt = np.array([[0.0, 0.0], [6.0, 0.0]])
    dists = [6.0, 1.0]  # supplied series wins over euclidean fallback
    m_stop = ce_episode_metrics(path, gt, stopped=True, dists=dists)
    m_nostop = ce_episode_metrics(path, gt, stopped=False, dists=dists)
    assert m_stop["sr"] == 1.0 and m_nostop["sr"] == 0.0
    assert m_nostop["oracle_sr"] == 1.0
    assert m_nostop["spl"] == 0.0  # spl carries the success factor
    # spl = sr * distance[0] / max(distance[0], tl) = 6 / max(6, 5)
    assert np.isclose(m_stop["spl"], 1.0)
    # a path longer than the start distance divides by its own length
    m_long = ce_episode_metrics(
        [np.zeros(2), np.array([8.0, 0.0]), np.array([6.0, 0.0])], gt,
        stopped=True, dists=[6.0, 2.5, 1.0])
    assert np.isclose(m_long["spl"], 6.0 / 10.0)
    # boundary: exactly success_dist counts (the reference tests <=)
    m_edge = ce_episode_metrics(path, gt, stopped=True, dists=[6.0, 3.0])
    assert m_edge["ne"] == 3.0 and m_edge["sr"] == 1.0
    m_c = ce_episode_metrics(path, gt, collisions=[True, False])
    assert m_c["collisions"] == 0.5


def test_ce_inference_writer(tmp_path):
    """Prediction files in both leaderboard formats
    (base_il_trainer.inference, :1336-1367)."""
    import json

    from gridmm_tpu.ce.env import SyntheticContinuousEnv
    from gridmm_tpu.ce.factory import build_ce_agent
    from gridmm_tpu.ce.trainer import CETrainer

    cfg, agent = build_ce_agent()
    # finite 3-episode split: inference defaults to batches=0 = full split
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=0, num_episodes=3)
    trainer = CETrainer(cfg, agent)

    r2r = tmp_path / "preds_r2r.json"
    n = trainer.inference(env, str(r2r), fmt="r2r", max_steps=3)
    data = json.loads(r2r.read_text())
    assert n == len(data) == 3  # every split episode predicted exactly once
    for eid, infos in data.items():
        # get_info record shape (habitat_extensions/nav.py:127-137): 3D
        # position + heading + stop hardcoded False (the reference never
        # flips it)
        for rec in infos:
            assert len(rec["position"]) == 3
            assert rec["stop"] is False
            assert "heading" in rec

    rxr = tmp_path / "preds.jsonl"
    trainer.inference(env, str(rxr), fmt="rxr", max_steps=3)
    lines = [json.loads(ln) for ln in rxr.read_text().splitlines()]
    assert lines and all({"instruction_id", "path"} <= set(l) for l in lines)
    ids = [l["instruction_id"] for l in lines]
    assert ids == sorted(ids)
    for l in lines:  # consecutive duplicates dropped
        assert all(a != b for a, b in zip(l["path"][:-1], l["path"][1:]))


def test_ce_ckpt_polling(tmp_path):
    """poll_checkpoint_dir ordering + evaluate_checkpoints_polling sweep
    (base_il_trainer.py:896-912)."""
    from gridmm_tpu.ce.env import SyntheticContinuousEnv
    from gridmm_tpu.ce.factory import build_ce_agent
    from gridmm_tpu.ce.trainer import (CETrainer, evaluate_checkpoints_polling,
                                       poll_checkpoint_dir)
    from gridmm_tpu.utils.checkpoint import save_checkpoint

    cfg, agent = build_ce_agent()
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    assert poll_checkpoint_dir(str(ckpt_dir), -1) is None
    for i in (0, 1):
        save_checkpoint(str(ckpt_dir / f"ckpt.{i}"), agent.nav_params)
    first = poll_checkpoint_dir(str(ckpt_dir), -1)
    second = poll_checkpoint_dir(str(ckpt_dir), 0)
    assert first.endswith("ckpt.0") and second.endswith("ckpt.1")
    assert poll_checkpoint_dir(str(ckpt_dir), 1) is None
    # an AsyncSaver write in flight ('<name>.orbax-checkpoint-tmp-<digits>',
    # pre-rename) must never be listed as a restorable checkpoint even
    # though its name ends in digits
    (ckpt_dir / "ckpt.2.orbax-checkpoint-tmp-1755598123").mkdir()
    assert poll_checkpoint_dir(str(ckpt_dir), 1) is None

    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=1)
    trainer = CETrainer(cfg, agent)
    results = evaluate_checkpoints_polling(trainer, env, str(ckpt_dir),
                                           batches=1, max_steps=2)
    assert len(results) == 2
    assert all("sr" in r and "checkpoint" in r for r in results)


def test_full_split_eval_rejects_unbounded_env():
    """batches=0 on an env that DECLARES an unbounded episode stream must
    fail fast instead of grinding through the 10000-rollout backstop; and
    num_episodes=0 normalizes to unbounded (run_ce's 0 convention) instead
    of a ZeroDivisionError at reset."""
    import pytest

    from gridmm_tpu.ce.factory import build_ce_agent
    from gridmm_tpu.ce.trainer import CETrainer

    cfg, agent = build_ce_agent(tiny=True)
    trainer = CETrainer(cfg, agent)
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 num_episodes=0)
    assert env.num_episodes is None
    with pytest.raises(ValueError, match="unbounded"):
        trainer.evaluate(env, batches=0, max_steps=2)
    with pytest.raises(ValueError, match="unbounded"):
        trainer.inference(env, "/dev/null", batches=0, max_steps=2)


def test_full_split_eval_every_episode_once(tmp_path):
    """batches=0 (the CLI eval default) covers the finite episode split
    exactly once: rollouts continue until the env's cycling episode iterator
    wraps, repeats are dropped (the reference's stats_episodes dedup,
    base_il_trainer.py:336,666), and every episode runs to agent stop or the
    reference's IL.max_traj_len=20 step cap (run_GridMap.yaml:23,
    ss_trainer_GridMap.py:503)."""
    import json

    from gridmm_tpu.ce.trainer import CETrainer

    cfg, agent = build_ce_agent()
    # 3 episodes over 2 envs: the second rollout serves ep3 + a repeat of
    # ep1, exercising the wraparound dedup
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=2, num_episodes=3)
    trainer = CETrainer(cfg, agent)
    avg = trainer.evaluate(env, results_dir=str(tmp_path))  # all defaults

    stats = json.loads(
        (tmp_path / "stats_ep_ckpt_0_val_unseen_r0_w1.json").read_text())
    assert sorted(stats) == ["ep00001", "ep00002", "ep00003"]
    for m in stats.values():  # ran to agent stop or the 20-step reference
        assert 0 <= m["steps_taken"] <= 20  # cap (0 = stopped at once)
    assert np.isclose(avg["steps_taken"],
                      np.mean([m["steps_taken"] for m in stats.values()]))


def test_synthetic_env_split_cycles_identically():
    """A finite split regenerates each episode bit-identically on revisit —
    the property full-split wraparound detection rests on."""
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=64,
                                 seed=9, num_episodes=3)
    seen = {}
    for _ in range(3):  # 6 episodes over a 3-episode split: one full wrap
        for ob in env.reset():
            if ob.episode_id in seen:
                prev = seen[ob.episode_id]
                np.testing.assert_array_equal(prev[0], ob.gt_path)
                np.testing.assert_array_equal(prev[1], ob.instruction_ids)
                assert prev[2] == ob.heading
            else:
                seen[ob.episode_id] = (ob.gt_path.copy(),
                                       ob.instruction_ids.copy(), ob.heading)
    assert sorted(seen) == ["ep00001", "ep00002", "ep00003"]


@pytest.mark.slow
def test_ce_rollout_with_view_tower():
    """view_tower=True routes panorama tokens through the timm-ViT cls path
    (Policy:335-343) instead of CLIP cls."""
    from gridmm_tpu.ce.factory import build_ce_agent as _build

    cfg, agent = _build(img=56, depth_sz=256, tiny=True, view_tower=True)
    assert agent.view_encoder is not None
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=3)
    metrics = agent.rollout(env, max_steps=3, feedback="argmax")
    assert len(metrics) == 2 and all(np.isfinite(m["ne"]) for m in metrics)


@pytest.mark.slow
def test_ce_eval_stats_and_video_artifacts(tmp_path):
    """evaluate(results_dir=..., video_dir=...) writes the reference's
    observability set: per-rank per-episode stats JSON, rank-0 aggregate
    JSON (base_il_trainer.py:725-746), and one video per episode
    (:631-644)."""
    import json
    import os

    from gridmm_tpu.ce.trainer import CETrainer

    cfg, agent = build_ce_agent()
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=5)
    trainer = CETrainer(cfg, agent)
    res = tmp_path / "results"
    vid = tmp_path / "videos"
    avg = trainer.evaluate(env, batches=1, max_steps=3,
                           results_dir=str(res), checkpoint_index=7,
                           split="val_unseen", video_dir=str(vid))
    assert "sr" in avg and np.isfinite(avg["nDTW"])

    per_rank = res / "stats_ep_ckpt_7_val_unseen_r0_w1.json"
    agg = res / "stats_ckpt_7_val_unseen.json"
    assert per_rank.exists() and agg.exists()
    ep_stats = json.loads(per_rank.read_text())
    assert len(ep_stats) == 2
    for stats in ep_stats.values():
        assert "spl" in stats and "sr" in stats
    agg_stats = json.loads(agg.read_text())
    assert abs(agg_stats["sr"] - avg["sr"]) < 1e-9

    vids = os.listdir(vid)
    assert len(vids) == 2, vids
    assert all(v.endswith((".gif", ".png")) for v in vids)


def test_ce_teacher_oracle_semantics():
    """Oracle contract (ss_trainer_GridMap.py:288-310): stop iff the current
    geodesic distance is < 1.5 m; otherwise argmin over candidate
    end-distances UNCONDITIONALLY — the teacher moves to the least-bad
    candidate even when every candidate is worse than standing still."""
    from types import SimpleNamespace

    from gridmm_tpu.ce.agent import CEAgent
    from gridmm_tpu.config import GridMMConfig

    cfg = GridMMConfig()

    class _OracleEnv:
        def __init__(self, cur, cand):
            self.cur, self.cand = cur, cand

        def dist_to_goal(self, i):
            return self.cur[i]

        def cand_dist_to_goal(self, i, heading, distance):
            # headings encode the candidate index for the lookup
            return self.cand[i][int(heading)]

    cur = [1.4, 1.6, 2.0, 9.9]
    cand = [
        [0.1],            # env0: improving candidate — but cur < 1.5: stop
        [5.0, 4.0, 6.0],  # env1: ALL worse than cur=1.6 — still argmin
        [1.9, 0.5],       # env2: ordinary improving argmin
        [0.0],            # env3: ended — ignored entirely
    ]
    cand_lists = [[(float(j), 1.0, 0.0) for j in range(len(c))]
                  for c in cand]
    env = _OracleEnv(cur, cand)
    obs = [None] * 4
    ended = [False, False, False, True]
    a = CEAgent._teacher(SimpleNamespace(cfg=cfg), env, obs, cand_lists,
                         ended)
    # slot 0 = [stop]; candidate j maps to action j+1
    assert a[0] == 0                          # < 1.5 m: stop
    assert a[1] == 2                          # least-bad (4.0) at index 1
    assert a[2] == 2                          # best (0.5) at index 1
    assert a[3] == cfg.train.ignoreid         # ended env untouched


def test_ce_schedule_decay_matches_reference():
    """ratio = schedule_ratio^(epoch // ceil(epochs/decay_time) + 1)
    (ss_trainer_GridMap.py:570,619) with the run_GridMap.yaml defaults
    schedule_ratio=0.50, decay_time=20."""
    from gridmm_tpu.ce.trainer import CETrainer
    from gridmm_tpu.cli.run_ce import epochs_per_ratio, parse_args

    args = parse_args([])
    assert args.schedule_ratio == 0.5 and args.decay_time == 20
    assert epochs_per_ratio(50, 20) == 3   # ceil(50/20)
    assert epochs_per_ratio(1, 20) == 1    # never 0 (division guard)

    t = CETrainer.__new__(CETrainer)  # formula only; no model build
    t.schedule_ratio, t.epochs_per_ratio = 0.5, 3
    # reference: epochs 0-2 -> 0.5^1, 3-5 -> 0.5^2, ...
    assert [t.ss_ratio(e) for e in (0, 2, 3, 5, 6)] == [
        0.5, 0.5, 0.25, 0.25, 0.125]


def test_rxr_ce_preset_normalizers():
    """RxR-CE preset: MAX_DIST 40 / MAX_STEP 30 + xlm vocab (Policy:280-286)."""
    from gridmm_tpu.config import rxr_ce_config

    cfg = rxr_ce_config()
    assert cfg.grid.max_dist == 40.0 and cfg.grid.pos_step_norm == 30.0
    assert cfg.model.vocab_size == 250002
    # tiny build keeps the preset's grid normalizers
    from gridmm_tpu.ce.factory import build_ce_agent

    tiny_cfg, _ = build_ce_agent(tiny=True, preset="rxr",
                                 waypoint_rgb=False)
    assert tiny_cfg.grid.max_dist == 40.0
    assert tiny_cfg.grid.pos_step_norm == 30.0


def test_derive_batches_per_epoch_from_split():
    """batches_per_epoch = ceil(dataset_length/batch_size)
    (ss_trainer_GridMap.py:606-607) when --batches_per_epoch is left at its
    derive-from-split default of 0."""
    import pytest

    from gridmm_tpu.ce.env import SyntheticContinuousEnv
    from gridmm_tpu.ce.trainer import derive_batches_per_epoch
    from gridmm_tpu.cli.run_ce import parse_args

    assert parse_args([]).batches_per_epoch == 0  # default = derive

    env = SyntheticContinuousEnv(num_envs=2, image_size=16, depth_size=16,
                                 num_episodes=7)
    assert derive_batches_per_epoch(env, 2) == 4   # ceil(7/2)
    assert derive_batches_per_epoch(env, 7) == 1
    assert derive_batches_per_epoch(env, 16) == 1  # never 0

    # episodes_allowed whitelist counts as the split (habitat path)
    class _Allowed:
        episodes_allowed = ["a", "b", "c"]
    assert derive_batches_per_epoch(_Allowed(), 2) == 2

    # unbounded stream: refuse rather than silently train on 2 episodes
    unbounded = SyntheticContinuousEnv(num_envs=1, image_size=16,
                                       depth_size=16, num_episodes=0)
    with pytest.raises(ValueError):
        derive_batches_per_epoch(unbounded, 1)
