"""Single-dispatch CE step (ce/device_step.py) vs the host assembly path.

The fused step must be an exact re-expression of candidates_from_nms +
_build_step (themselves golden-tested against the reference's loops), so
these tests drive both paths in lockstep on the synthetic arena and compare
every StepInputs field, then whole greedy rollouts action-for-action."""

import math
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ce.agent import (CEAgent, NUM_ANGLES, DIST_BIN,  # noqa: E402
                                 start_pos_features, traj_pos_features)
from gridmm_tpu.ce.device_step import (  # noqa: E402
    device_build_step, device_candidates, device_start_pos_features,
    device_traj_pos_features)
from gridmm_tpu.ce.env import SyntheticContinuousEnv  # noqa: E402
from gridmm_tpu.train.step import StepInputs  # noqa: E402


def _tiny_agent(view_tower: bool = False):
    from gridmm_tpu.ce.factory import build_ce_agent

    return build_ce_agent(img=56, depth_sz=256, tiny=True,
                          view_tower=view_tower)


def test_device_candidates_match_host():
    from gridmm_tpu.models.waypoint import waypoint_nms

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, NUM_ANGLES * 12)).astype(np.float32) * 3
    probs = jax.nn.softmax(jnp.asarray(logits), -1).reshape(4, NUM_ANGLES, 12)
    nms = waypoint_nms(probs, max_predictions=5, sigma=(7.0, 5.0))
    nms_h = np.asarray(nms)
    dev = device_candidates(nms, 5)
    for i in range(4):
        heading = float(rng.uniform(0, 2 * np.pi))
        host = CEAgent.candidates_from_nms(nms_h[i], heading, 5)
        n = int(np.asarray(dev.mask[i]).sum())
        assert n == len(host)
        for j, (h, dst, sc) in enumerate(host):
            a = int(dev.ang_bins[i, j])
            d = int(dev.dist_bins[i, j])
            assert abs(heading + a * (2 * math.pi / NUM_ANGLES) - h) < 1e-9
            assert abs((d + 1) * DIST_BIN - dst) < 1e-9
            assert abs(float(dev.scores[i, j]) - sc) < 1e-6


def test_train_sampling_sector_mapping():
    """Train-time waypoint augmentation (Policy_ViewSelection_GridMap.py
    :393-425): a peak's (angle, dist) is re-sampled from its 30-degree
    sector of the ROLLED heatmap. The within-sector row k maps to angle
    (img-1)*10+5+k for img != 0, but for sector 0 the reference's
    angle_pointer is 0 so the sample is labeled angle k verbatim even
    though rows {0..4} of the rolled sector hold original angles
    {115..119} (:417-421) — the off-by-5 is reproduced deliberately."""

    class _Pick:
        def __init__(self, pick):
            self.pick = pick

        def choice(self, n, p=None):
            assert p.shape == (120,) and abs(p.sum() - 1.0) < 1e-6
            return self.pick

    probs = np.full((NUM_ANGLES, 12), 1.0 / (NUM_ANGLES * 12), np.float32)

    # peak at angle 57 -> sector img = (57+5)//10 = 6, rows 55..64
    nms = np.zeros((NUM_ANGLES, 12), np.float32)
    nms[57, 3] = 1.0
    # pick flat 2*12+7 -> k=2, d=7 -> angle (6-1)*10+5+2 = 57
    (h, dst, _sc), = CEAgent.candidates_from_nms(
        nms, 0.0, 5, probs=probs, rng=_Pick(2 * 12 + 7))
    assert abs(h - 57 * (2 * math.pi / NUM_ANGLES)) < 1e-9
    assert abs(dst - (7 + 1) * DIST_BIN) < 1e-9

    # peak at angle 117 -> sector img = (117+5)//10 = 12 -> 0 (wraps)
    nms0 = np.zeros((NUM_ANGLES, 12), np.float32)
    nms0[117, 3] = 1.0
    # pick k=1 (rolled row = original angle 116) -> labeled angle 1
    (h0, dst0, _), = CEAgent.candidates_from_nms(
        nms0, 0.0, 5, probs=probs, rng=_Pick(1 * 12 + 4))
    assert abs(h0 - 1 * (2 * math.pi / NUM_ANGLES)) < 1e-9
    assert abs(dst0 - (4 + 1) * DIST_BIN) < 1e-9
    # pick k=7 (rolled row = original angle 2) -> labeled angle 7
    (h1, _, _), = CEAgent.candidates_from_nms(
        nms0, 0.0, 5, probs=probs, rng=_Pick(7 * 12))
    assert abs(h1 - 7 * (2 * math.pi / NUM_ANGLES)) < 1e-9


def test_device_traj_and_start_features_match_host():
    rng = np.random.default_rng(1)
    af, max_dist, max_step = 4, 25.0, 20.0
    b, cap = 3, 8
    lens = np.array([1, 4, 8])
    heads = rng.uniform(0, 2 * np.pi, b).astype(np.float32)
    tp = np.zeros((b, cap, 3), np.float32)
    td = np.zeros((b, cap), np.float32)
    for i in range(b):
        tp[i, : lens[i]] = rng.normal(size=(lens[i], 3)) * 3
        td[i, 1: lens[i]] = rng.uniform(0.1, 2.0, max(lens[i] - 1, 0))
    dev_tf = np.asarray(device_traj_pos_features(
        jnp.asarray(tp), jnp.asarray(td), jnp.asarray(lens),
        jnp.asarray(heads), af, max_dist, max_step))
    dev_sf = np.asarray(device_start_pos_features(
        jnp.asarray(tp), jnp.asarray(td), jnp.asarray(lens),
        jnp.asarray(heads), af, max_dist, max_step))
    for i in range(b):
        pos_list = [tp[i, j].astype(np.float64) for j in range(lens[i])]
        dist_list = [float(td[i, j]) for j in range(lens[i])]
        host_tf = traj_pos_features(pos_list, dist_list, float(heads[i]),
                                    af, max_dist, max_step)
        np.testing.assert_allclose(dev_tf[i, : lens[i]], host_tf, atol=2e-5)
        host_sf = start_pos_features(pos_list, dist_list, float(heads[i]),
                                     af, max_dist, max_step)
        np.testing.assert_allclose(dev_sf[i], host_sf, atol=2e-5)


@pytest.mark.parametrize("view_tower", [False, True])
def test_device_build_step_matches_host_over_episode(view_tower):
    # view_tower=True exercises the timm view-cls panorama branch
    # (view_src = view_feats[..., :d]) on both paths
    cfg, agent = _tiny_agent(view_tower)
    b = 2
    env = SyntheticContinuousEnv(num_envs=b, image_size=56, depth_size=256,
                                 seed=3)
    obs = env.reset()
    centers = np.asarray([19 + 36 * i for i in range(7)])
    next_slot = np.full((b,), 1, np.int32)
    cap = cfg.model.max_action_steps
    tpos = np.zeros((b, cap, 3), np.float32)
    tdist = np.zeros((b, cap), np.float32)
    exact = {"nav_types", "view_mask", "gmap_step_ids", "gmap_mask",
             "gmap_visited_mask", "cur_node_idx", "cand_gmap_idx",
             "vp_nav_mask", "fused_add_idx", "cand_backtrack_mask",
             "target", "grid_target", "vp_obj_mask", "obj_target"}
    for t in range(3):
        rgb = jnp.asarray(np.stack([ob.rgb for ob in obs]))
        depth = jnp.asarray(np.stack([ob.depth for ob in obs]))
        nms, _probs, _patch, view_cls, view_feats = agent._jit_perception(
            agent.wp_params, agent.rgb_params, agent.depth_params,
            agent.clip_params, agent.view_params, rgb, depth)
        nms_h = np.asarray(nms)
        cand_lists = [
            agent.candidates_from_nms(nms_h[i], obs[i].heading, 5)
            for i in range(b)]
        x_host, _cur = agent._build_step(
            obs, cand_lists, np.asarray(view_cls), centers, next_slot, t,
            view_feats=(np.asarray(view_feats)
                        if view_feats is not None else None))
        for i, ob in enumerate(obs):
            p3 = np.array([ob.position[0], 0.0, ob.position[1]], np.float32)
            tdist[i, t] = (0.0 if t == 0 else
                           float(np.linalg.norm(p3 - tpos[i, t - 1])))
            tpos[i, t] = p3
        x_dev = device_build_step(
            cfg, device_candidates(nms, 5), view_cls, depth,
            jnp.asarray(np.stack(
                [ob.position for ob in obs]).astype(np.float32)),
            jnp.asarray(np.asarray([ob.heading for ob in obs], np.float32)),
            jnp.asarray(tpos), jnp.asarray(tdist),
            jnp.full((b,), t + 1, jnp.int32), np.int32(t),
            view_feats=view_feats)
        for f in StepInputs._fields:
            a_h = np.asarray(getattr(x_host, f))
            a_d = np.asarray(getattr(x_dev, f))
            assert a_h.shape == a_d.shape, f
            if f in exact:
                np.testing.assert_array_equal(a_d, a_h, err_msg=f)
            else:
                np.testing.assert_allclose(a_d, a_h, atol=1e-4,
                                           err_msg=f"step {t}: {f}")
        # walk each env to its best candidate so later steps see a real
        # trajectory history
        for i in range(b):
            if cand_lists[i]:
                h, dst, _ = cand_lists[i][0]
                env.step_to(i, h, dst)
        obs = env.observations()


@pytest.mark.parametrize("view_tower", [False, True])
def test_fused_rollout_matches_legacy_actions(view_tower):
    cfg, agent = _tiny_agent(view_tower)

    def run(fused: bool):
        env = SyntheticContinuousEnv(num_envs=2, image_size=56,
                                     depth_size=256, seed=11)
        agent.fused_rollout = fused
        m = agent.rollout(env, max_steps=4, feedback="argmax")
        return m, [np.asarray(p) for p in env.paths]

    m_fused, paths_fused = run(True)
    m_legacy, paths_legacy = run(False)
    for p1, p2 in zip(paths_fused, paths_legacy):
        assert len(p1) == len(p2)
        np.testing.assert_allclose(p1, p2, atol=1e-9)
    for mf, ml in zip(m_fused, m_legacy):
        for k in mf:
            np.testing.assert_allclose(mf[k], ml[k], atol=1e-7, err_msg=k)


def test_candidate_sector_bins_robust_at_midpoints():
    """30-degree sector selection: midpoint angle bins (a % 10 == 5) used to
    flip sectors on f32-vs-f64 rounding noise; both paths now derive the
    sector from the INTEGER bin, and the host's bin recovery from the float
    heading difference is exact for every bin and heading."""
    delta = 2 * math.pi / NUM_ANGLES
    for heading in [0.0, 0.37, 5.93, 2 * math.pi - 1e-9]:
        for a in range(NUM_ANGLES):
            rel = (heading + a * delta) - heading  # host's cancellation
            a_bin = int(round((rel % (2 * math.pi)) / delta)) % NUM_ANGLES
            assert a_bin == a, (heading, a)
    per_img = NUM_ANGLES // 12
    dev = np.asarray(((jnp.arange(NUM_ANGLES) + per_img // 2) // per_img)
                     % 12)
    host = [((a + per_img // 2) // per_img) % 12 for a in range(NUM_ANGLES)]
    np.testing.assert_array_equal(dev, host)


def test_device_build_step_zero_candidates():
    """An all-zero NMS map (no waypoint peaks) must produce the same
    view-only panorama and masks on both paths — the n=0 edge the arena
    rollouts rarely hit."""
    cfg, agent = _tiny_agent()
    b = 2
    env = SyntheticContinuousEnv(num_envs=b, image_size=56, depth_size=256,
                                 seed=5)
    obs = env.reset()
    centers = np.asarray([19 + 36 * i for i in range(7)])
    next_slot = np.full((b,), 1, np.int32)
    cap = cfg.model.max_action_steps
    tpos = np.zeros((b, cap, 3), np.float32)
    for i, ob in enumerate(obs):
        tpos[i, 0] = [ob.position[0], 0.0, ob.position[1]]
    tdist = np.zeros((b, cap), np.float32)

    rgb = jnp.asarray(np.stack([ob.rgb for ob in obs]))
    depth = jnp.asarray(np.stack([ob.depth for ob in obs]))
    _nms, _probs, _patch, view_cls, view_feats = agent._jit_perception(
        agent.wp_params, agent.rgb_params, agent.depth_params,
        agent.clip_params, agent.view_params, rgb, depth)
    zero_nms = jnp.zeros((b, NUM_ANGLES, 12), jnp.float32)

    cand = device_candidates(zero_nms, 5)
    assert not bool(np.asarray(cand.mask).any())
    # the host path must derive the SAME empty candidate list from the
    # zero map (not a hand-fed []) so the equivalence claim covers it
    host_cands = [CEAgent.candidates_from_nms(np.asarray(zero_nms[i]),
                                              obs[i].heading, 5)
                  for i in range(b)]
    assert all(c == [] for c in host_cands)
    x_host, _ = agent._build_step(obs, host_cands,
                                  np.asarray(view_cls), centers, next_slot, 0)
    x_dev = device_build_step(
        cfg, cand, view_cls, depth,
        jnp.asarray(np.stack([ob.position for ob in obs]).astype(np.float32)),
        jnp.asarray(np.asarray([ob.heading for ob in obs], np.float32)),
        jnp.asarray(tpos), jnp.asarray(tdist), jnp.ones((b,), jnp.int32),
        np.int32(0))
    for f in StepInputs._fields:
        a_h, a_d = np.asarray(getattr(x_host, f)), np.asarray(getattr(x_dev, f))
        np.testing.assert_allclose(a_d, a_h, atol=1e-4, err_msg=f)


def test_fused_auto_selection_by_batch():
    """fused_rollout="auto" (the default) fuses single-env greedy rollouts
    and takes the legacy overlapped-upload path at B>1 — the round-4
    tunnel measurement (PARITY.md): fused wins at B=1 (312 vs 362 ms p50)
    and loses at B=4 (1707 vs 950 ms, observation-upload-bound). The paths
    are action-equivalent (test above); this pins which one runs."""
    from gridmm_tpu.utils.logging import SectionTimer

    _, agent = _tiny_agent()
    assert agent.fused_rollout == "auto"

    def sections(num_envs):
        env = SyntheticContinuousEnv(num_envs=num_envs, image_size=56,
                                     depth_size=256, seed=3)
        timer = SectionTimer()
        agent.rollout(env, max_steps=2, feedback="argmax", timer=timer)
        return set(timer.totals)

    one = sections(1)
    assert "fused_step" in one and "perception" not in one
    two = sections(2)
    assert "perception" in two and "fused_step" not in two


def test_angle_table_chain_skips_ended_envs():
    """The per-env angle-table aliasing chain (Policy:461,470-480) covers
    only ACTIVE envs: the reference pauses ended envs out of the batch
    (ss_trainer_GridMap.py:436-450), so env i's non-candidate rows read the
    chain formed by the previous active env, skipping ended slots. Host and
    device twins must agree."""
    import gridmm_tpu.ce.agent as agent_mod
    from gridmm_tpu.ce.factory import build_ce_agent

    cfg, agent = build_ce_agent(tiny=True)
    b, af = 3, cfg.model.angle_feat_size
    d = cfg.model.image_feat_size
    centers = np.asarray([19 + 36 * i for i in range(7)])
    rng = np.random.default_rng(5)
    view_cls = rng.standard_normal((b, 12, d)).astype(np.float32)
    obs = [
        type("O", (), {"position": np.zeros(2, np.float32), "heading": 0.0,
                       "depth": np.ones((12, 256, 256), np.float32),
                       "height": 0.0})()
        for _ in range(b)]
    # env0 has a candidate (mutates the chain if active), envs 1-2 have none
    cands = [[(0.3, 1.0, 0.9)], [], []]

    ended = np.array([True, False, False])
    x_skip, _ = agent._build_step(obs, cands, view_cls, centers,
                                  np.ones(b, np.int32), 0, ended=ended)
    x_all, _ = agent._build_step(obs, cands, view_cls, centers,
                                 np.ones(b, np.int32), 0,
                                 ended=np.zeros(b, bool))
    pristine = np.stack([
        np.asarray(agent_mod.angle_features(ix * 2 * np.pi / 12, 0.0, af))
        for ix in range(12)])
    # with env0 ended, env1 reads the PRISTINE table
    np.testing.assert_allclose(
        np.asarray(x_skip.loc_fts)[1, :12, :af], pristine, atol=1e-6)
    # with env0 active, env1's chain was mutated by env0's candidate row
    assert not np.allclose(np.asarray(x_all.loc_fts)[1, :12, :af], pristine)
    # env2 chains off env1's assembled rows (env1 has no candidates, so in
    # the skip case env2 also reads the pristine table through it)
    np.testing.assert_allclose(
        np.asarray(x_skip.loc_fts)[2, :12, :af], pristine, atol=1e-6)
    # device twin agrees with the host on the skip case
    from gridmm_tpu.ce.device_step import DeviceCandidates
    k = agent.max_candidates
    ang = np.zeros((b, k), np.int32)
    dbin = np.zeros((b, k), np.int32)
    mask = np.zeros((b, k), bool)
    sc = np.zeros((b, k), np.float32)
    rel = (cands[0][0][0] - obs[0].heading) % (2 * np.pi)
    ang[0, 0] = int(round(rel / (2 * np.pi / 120))) % 120
    dbin[0, 0] = int(round(cands[0][0][1] / DIST_BIN)) - 1
    mask[0, 0] = True
    sc[0, 0] = cands[0][0][2]
    dc = DeviceCandidates(jnp.asarray(ang), jnp.asarray(dbin),
                          jnp.asarray(sc), jnp.asarray(mask))
    cap = cfg.model.max_action_steps
    x_dev = device_build_step(
        cfg, dc, jnp.asarray(view_cls),
        jnp.asarray(np.ones((b, 12, 256, 256), np.float32)),
        jnp.zeros((b, 2)), jnp.zeros((b,)),
        jnp.zeros((b, cap, 3)), jnp.zeros((b, cap)),
        jnp.ones((b,), jnp.int32), jnp.int32(0),
        ended=jnp.asarray(ended))
    np.testing.assert_allclose(np.asarray(x_dev.loc_fts)[1:, :12, :af],
                               np.asarray(x_skip.loc_fts)[1:, :12, :af],
                               atol=1e-6)
