"""Golden test for the CE trajectory positional features against an
independent numpy transcription of the reference loop
(VLN_CE/.../Policy_ViewSelection_GridMap.py:525-601)."""

import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ce.agent import (rel_pos_features, start_pos_features,  # noqa: E402
                                 traj_pos_features)

MAX_DIST, MAX_STEP = 25.0, 20.0


# --- reference transcription (models/utils.py:110-151 + Policy:549-601) -----
def _ref_calculate_vp_rel_pos_fts(a, b, base_heading=0.0, base_elevation=0.0):
    dx, dz, dy = b[0] - a[0], b[1] - a[1], b[2] - a[2]
    if dx == dz == dy == 0:
        return 0, 0, 0
    xy_dist = max(np.sqrt(dx ** 2 + dy ** 2), 1e-8)
    xyz_dist = max(np.sqrt(dx ** 2 + dy ** 2 + dz ** 2), 1e-8)
    heading = np.arcsin(dx / xy_dist)
    if b[2] < a[2]:
        heading = np.pi - heading
    heading -= base_heading
    elevation = np.arcsin(dz / xyz_dist)
    elevation -= base_elevation
    return heading, elevation, xyz_dist


def _ref_get_angle_fts(headings, elevations):
    ang = [np.sin(headings), np.cos(headings), np.sin(elevations),
           np.cos(elevations)]
    return np.vstack(ang).transpose().astype(np.float32)


def _ref_traj_rows(positions, cur_heading, traj_map, action_step):
    """Policy:549-560: iterate visited nodes REVERSE-chronologically,
    accumulating path_dist; traj_map[j] = (pos_j, dist from node j-1)."""
    cur = positions
    rel_angles, rel_dists = [], []
    order = []
    path_dist = 0.0
    for j in range(len(traj_map) - 1, -1, -1):
        rh, re, rd = _ref_calculate_vp_rel_pos_fts(
            cur, traj_map[j][0], base_heading=cur_heading, base_elevation=0.0)
        rel_angles.append([rh, re])
        rel_dists.append([rd / MAX_DIST, path_dist / MAX_DIST,
                          (action_step - j - 1) / MAX_STEP])
        path_dist += traj_map[j][1]
        order.append(j)
    rel_angles = np.array(rel_angles, np.float32)
    rel_dists = np.array(rel_dists, np.float32)
    rows = np.concatenate(
        [_ref_get_angle_fts(rel_angles[:, 0], rel_angles[:, 1]), rel_dists],
        1)
    return rows, order, path_dist


def _random_traj(rng, steps):
    pos = [rng.normal(size=3) * np.array([4.0, 0.3, 4.0])]
    traj_map = [(pos[0], 0.0)]
    for _ in range(steps - 1):
        nxt = pos[-1] + rng.normal(size=3) * np.array([1.5, 0.1, 1.5])
        traj_map.append((nxt, float(np.linalg.norm(nxt - pos[-1]))))
        pos.append(nxt)
    return pos, traj_map


def test_traj_pos_features_match_reference_loop():
    rng = np.random.default_rng(0)
    for steps in (1, 2, 5, 9):
        positions, traj_map = _random_traj(rng, steps)
        cur_heading = float(rng.uniform(-math.pi, math.pi))
        # reference: at step t (0-based), action_step = t+1 = len(traj_map)
        ref_rows, order, _ = _ref_traj_rows(
            positions[-1], cur_heading, traj_map, action_step=len(traj_map))

        got = traj_pos_features(
            positions, [d for _, d in traj_map], cur_heading,
            af=4, max_dist=MAX_DIST, max_step=MAX_STEP)

        assert got.shape == (steps, 7)
        for row, j in zip(ref_rows, order):  # ref rows are reverse-chrono
            np.testing.assert_allclose(got[j], row, atol=1e-6, err_msg=f"node {j}")


def test_start_pos_features_match_reference():
    rng = np.random.default_rng(1)
    positions, traj_map = _random_traj(rng, 6)
    cur_heading = 0.7
    # Policy:590-601: rel to start, total path dist, action_step/MAX_STEP
    _, _, total_path = _ref_traj_rows(positions[-1], cur_heading, traj_map,
                                      action_step=len(traj_map))
    rh, re, rd = _ref_calculate_vp_rel_pos_fts(
        positions[-1], positions[0], base_heading=cur_heading)
    want = np.concatenate([
        _ref_get_angle_fts(np.array([rh]), np.array([re]))[0],
        [rd / MAX_DIST, total_path / MAX_DIST, len(traj_map) / MAX_STEP]])

    got = start_pos_features(positions, [d for _, d in traj_map], cur_heading,
                             af=4, max_dist=MAX_DIST, max_step=MAX_STEP)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rel_pos_features_degenerate_and_behind():
    # identical points -> exact zeros (reference early-return)
    assert rel_pos_features((1.0, 2.0, 3.0), (1.0, 2.0, 3.0), 0.5) == \
        (0.0, 0.0, 0.0)
    # target behind (dy < 0) flips past pi/2
    h, e, d = rel_pos_features((0, 0, 0), (0.0, 0.0, -2.0), 0.0)
    assert abs(h - math.pi) < 1e-9 and e == 0.0 and abs(d - 2.0) < 1e-9


def test_build_step_fills_visited_and_start_fts():
    """After two steps, visited gmap slots and vp start columns are live."""
    from gridmm_tpu.ce.env import SyntheticContinuousEnv
    from gridmm_tpu.ce.factory import build_ce_agent

    cfg, agent = build_ce_agent(tiny=True)
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=3)
    obs = env.reset()
    centers = np.asarray([19 + 36 * i for i in range(7)])
    view_cls = np.zeros((2, 12, cfg.model.image_feat_size), np.float32)
    next_slot = np.full((2,), 1, np.int32)
    cands = [[(0.3, 1.0, 0.9)], [(1.0, 2.0, 0.8)]]

    x0, _ = agent._build_step(obs, cands, view_cls, centers, next_slot, 0)
    for i in range(2):
        env.step_to(i, cands[i][0][0], cands[i][0][1])
    obs = env.observations()
    x1, _ = agent._build_step(obs, cands, view_cls, centers, next_slot, 1)

    af = cfg.model.angle_feat_size
    gp = np.asarray(x1.gmap_pos_fts)
    # slot 0 ([stop]) carries the constant zero-angle fts [0,1,0,1,0,0,0]
    np.testing.assert_allclose(gp[0, 0, :af], [0, 1, 0, 1], atol=0)
    # slot 1 = past node: nonzero rel dist + one-step recency
    for i in range(2):
        assert gp[i, 1, af] > 0.0, "visited node line-dist must be filled"
        assert gp[i, 1, af + 1] > 0.0, "visited node path-dist must be filled"
        np.testing.assert_allclose(gp[i, 1, af + 2],
                                   1.0 / cfg.grid.pos_step_norm)
        # slot 2 = current node: exact zeros in dists, recency 0
        np.testing.assert_allclose(gp[i, 2, af:], 0.0, atol=0)
        np.testing.assert_allclose(gp[i, 2, :af], [0, 1, 0, 1], atol=0)
    # frontier slot sits after the chain with step id len(traj)+1 and
    # 1/MAX_STEP recency
    for i in range(2):
        s = 3
        assert np.asarray(x1.gmap_mask)[i, s]
        np.testing.assert_allclose(gp[i, s, af + 2],
                                   1.0 / cfg.grid.pos_step_norm)
        assert np.asarray(x1.gmap_step_ids)[i, s] == 3
    # vp rows all lead with the same start features; recency = T/MAX_STEP
    vp = np.asarray(x1.vp_pos_fts)
    for i in range(2):
        assert np.ptp(vp[i, :, : af + 3], axis=0).max() == 0.0
        np.testing.assert_allclose(vp[i, 0, af + 2],
                                   2.0 / cfg.grid.pos_step_norm)
        assert vp[i, 0, af] > 0.0  # moved away from start
        # candidate rows carry cur_cand_pos_fts' triple, whose "distance"
        # entries are the CCW ANGLE value — the trainer passes
        # batch_distances=batch_angles into the navigation forward
        # (ss_trainer_GridMap.py:275; Policy:576-584)
        rel = cands[i][0][0] - obs[i].heading
        a_bin = int(round((rel % (2 * math.pi)) / (2 * math.pi / 120))) % 120
        ang_cc = 2 * math.pi - a_bin * (2 * math.pi / 120)
        d = ang_cc / cfg.grid.max_dist
        np.testing.assert_allclose(vp[i, 1, 2 * af + 3], d, rtol=1e-6)
        np.testing.assert_allclose(vp[i, 1, 2 * af + 4], d, rtol=1e-6)
        np.testing.assert_allclose(vp[i, 1, 2 * af + 5],
                                   1.0 / cfg.grid.pos_step_norm)
