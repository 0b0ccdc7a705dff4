"""Numpy oracle for golden tests.

A from-scratch transcription of the reference SEMANTICS (map_nav_src/r2r/env.py
grid build, models/vilmodel.py cell pooling, models/graph_utils.py geometry) in
plain numpy, written loop-style for auditability. The production jnp code in
gridmm_tpu/ must agree with this to tight tolerances.
"""

import math

import numpy as np

GRID_W = GRID_H = 14
MAX_DIST = 30.0


def ref_rel_position(depth_row, angle, depth_scale=4000.0, tan_half=math.tan(math.pi / 6)):
    """env.py:115-121 — back-project one view's 49 depth patches."""
    depth_y = depth_row.astype(np.float32) / depth_scale
    offs = np.array([-6 / 7, -4 / 7, -2 / 7, 0.0, 2 / 7, 4 / 7, 6 / 7] * 7, np.float32)
    depth_x = depth_y * (offs * tan_half)
    rel_x = depth_x * math.cos(angle) + depth_y * math.sin(angle)
    rel_y = depth_y * math.cos(angle) - depth_x * math.sin(angle)
    return rel_x, rel_y


def ref_vp_rel_pos(a, b, base_heading=0.0, base_elevation=0.0):
    """graph_utils.py:15-32."""
    dx, dy, dz = b[0] - a[0], b[1] - a[1], b[2] - a[2]
    xy = max(np.sqrt(dx * dx + dy * dy), 1e-8)
    xyz = max(np.sqrt(dx * dx + dy * dy + dz * dz), 1e-8)
    heading = np.arcsin(dx / xy)
    if b[1] < a[1]:
        heading = np.pi - heading
    heading -= base_heading
    elevation = np.arcsin(dz / xyz) - base_elevation
    return heading, elevation, xyz


def ref_angle_fts(headings, elevations, angle_feat_size=4):
    """graph_utils.py:34-40."""
    fts = [np.sin(headings), np.cos(headings), np.sin(elevations), np.cos(elevations)]
    fts = np.vstack(fts).transpose().astype(np.float32)
    reps = angle_feat_size // 4
    if reps > 1:
        fts = np.concatenate([fts] * reps, 1)
    return fts


def ref_gridmap_pos_fts(half_len):
    """env.py:242-265."""
    rel_angles, rel_dists = [], []
    cell = half_len * 2 / GRID_W
    for i in range(GRID_W):
        for j in range(GRID_H):
            pos = [i * cell - half_len + cell / 2.0, j * cell - half_len + cell / 2.0, 0.0]
            h, e, d = ref_vp_rel_pos([0.0, 0.0, 0.0], pos)
            rel_angles.append([h, e])
            rel_dists.append([d / MAX_DIST])
    rel_angles = np.array(rel_angles, np.float32)
    rel_dists = np.array(rel_dists, np.float32)
    return np.concatenate([ref_angle_fts(rel_angles[:, 0], rel_angles[:, 1]), rel_dists], 1)


class RefGridBuilder:
    """Stateful per-episode grid build (env.py:267-374), one episode."""

    def __init__(self, depth_scale=4000.0, tan_half=math.tan(math.pi / 6)):
        self.depth_scale = depth_scale
        self.tan_half = tan_half
        self.px, self.py, self.mask = [], [], []
        self.max_x = self.max_y = -10000.0
        self.min_x = self.min_y = 10000.0

    def step(self, depth, position, heading):
        """depth: (12, 49) raw; position: dict x/y; heading: radians.

        Returns (global_map (N,), half_len, gridmap_pos_fts (196, 5)).
        """
        for ix in range(12):
            rx, ry = ref_rel_position(depth[ix], ix * math.pi / 6,
                                      self.depth_scale, self.tan_half)
            self.px.append(rx + position["x"])
            self.py.append(ry + position["y"])
            self.mask.append((depth[ix] > 0).astype(np.float64))

        px = np.concatenate(self.px)
        py = np.concatenate(self.py)
        mask = np.concatenate(self.mask)

        new_x = np.concatenate(self.px[-12:])
        new_y = np.concatenate(self.py[-12:])
        self.max_x = max(self.max_x, new_x.max())
        self.min_x = min(self.min_x, new_x.min())
        self.max_y = max(self.max_y, new_y.max())
        self.min_y = min(self.min_y, new_y.min())

        x_half = max(position["x"] - self.min_x, self.max_x - position["x"])
        y_half = max(position["y"] - self.min_y, self.max_y - position["y"])
        half_len = max(x_half, y_half) * 2 / 3

        angle = -heading
        tx = px - position["x"]
        ty = py - position["y"]
        map_x = tx * math.cos(angle) + ty * math.sin(angle)
        map_y = ty * math.cos(angle) - tx * math.sin(angle)
        map_x = ((map_x + half_len) / (2 * half_len) * (GRID_W - 1)).astype(np.int32)
        map_y = ((map_y + half_len) / (2 * half_len) * (GRID_H - 1)).astype(np.int32)
        map_x = np.clip(map_x, 0, GRID_W - 1)
        map_y = np.clip(map_y, 0, GRID_H - 1)

        global_map = np.full((len(px),), -1.0)
        idx = map_x * 14 + map_y
        sel = mask == 1
        global_map[sel] = idx[sel]
        return global_map, half_len, ref_gridmap_pos_fts(half_len)


class RefGridBuilderCE:
    """Continuous-env grid build (Policy_ViewSelection_GridMap.py:689-807):
    depth in metres, HFOV 90 (tan pi/4), view angles heading-relative,
    global_y = pos_y - rel_y, rotation angle = -heading + pi, map_x negated."""

    def __init__(self, tan_half=math.tan(math.pi / 4)):
        self.tan_half = tan_half
        self.px, self.py, self.mask = [], [], []
        self.max_x = self.max_y = -10000.0
        self.min_x = self.min_y = 10000.0

    def step(self, depth, position, heading):
        for ix in range(12):
            rx, ry = ref_rel_position(depth[ix], ix * math.pi / 6 - heading,
                                      1.0, self.tan_half)
            self.px.append(rx + position["x"])
            self.py.append(-ry + position["y"])
            self.mask.append((depth[ix] > 0).astype(np.float64))

        px = np.concatenate(self.px)
        py = np.concatenate(self.py)
        mask = np.concatenate(self.mask)
        new_x = np.concatenate(self.px[-12:])
        new_y = np.concatenate(self.py[-12:])
        self.max_x = max(self.max_x, new_x.max())
        self.min_x = min(self.min_x, new_x.min())
        self.max_y = max(self.max_y, new_y.max())
        self.min_y = min(self.min_y, new_y.min())

        x_half = max(position["x"] - self.min_x, self.max_x - position["x"])
        y_half = max(position["y"] - self.min_y, self.max_y - position["y"])
        half_len = max(x_half, y_half) * 2 / 3

        angle = -heading + math.pi
        tx = px - position["x"]
        ty = py - position["y"]
        map_x = -(tx * math.cos(angle) + ty * math.sin(angle))
        map_y = ty * math.cos(angle) - tx * math.sin(angle)
        map_x = np.clip(((map_x + half_len) / (2 * half_len) *
                         (GRID_W - 1)).astype(np.int32), 0, GRID_W - 1)
        map_y = np.clip(((map_y + half_len) / (2 * half_len) *
                         (GRID_H - 1)).astype(np.int32), 0, GRID_H - 1)
        global_map = np.full((len(px),), -1.0)
        idx = map_x * 14 + map_y
        global_map[mask == 1] = idx[mask == 1]
        return global_map, half_len


def ref_cell_pooling(grid_fts, grid_map, txt, wt, bt, wg, bg):
    """vilmodel.py:788-824 pooling loop, single item, numpy.

    grid_fts: (N, D); grid_map: (N,) float cell ids (-1 invalid);
    txt: (T, D); text_proj = txt @ wt + bt; grid_proj = grid_fts @ wg + bg.
    Returns (grid_map_input (196, D), grid_masks (196,)).
    """
    d = grid_fts.shape[1]
    text_fts = (txt @ wt + bt).T  # (D, T)
    weight = (grid_fts @ text_fts).max(axis=-1)  # (N,)
    proj = grid_fts @ wg + bg

    out = np.zeros((196, d), np.float32)
    masks = np.zeros((196,), np.int32)
    for i in range(196):
        sel = grid_map == i
        if sel.sum() == 0:
            continue
        masks[i] = 1
        w = weight[sel]
        sm = np.exp(w - w.max())
        sm = sm / sm.sum()
        out[i] = (proj[sel] * sm[:, None]).sum(0)
    return out, masks
