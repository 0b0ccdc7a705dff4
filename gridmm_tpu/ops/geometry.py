"""Grid-memory geometry core: pure, batched, jit-friendly functions.

This module is the single parameterized implementation of the grid-map math that
the reference repo copies three times with slightly different constants
(map_nav_src/r2r/env.py:115-121,242-374; pretrain_src/data/dataset.py:351-473;
VLN_CE/vlnce_baselines/models/Policy_ViewSelection_GridMap.py:632-807).
Everything here is shape-static and differentiable-safe so it can live inside a
single jitted per-step graph; golden tests in tests/test_geometry.py check the
functions against a numpy transcription of the reference semantics to <=1e-5.

Conventions (matching the reference):
  * World frame: x, y in metres (MatterSim / Habitat world coordinates).
  * A panorama contributes `num_views` horizon views; view k faces
    angle = k * pi/6 relative to... the panorama's base orientation
    (env.py:289-290: views ix 12..24, angle (ix-12)*pi/6).
  * Each view contributes a 7x7 grid of depth-patch centers; the lateral offset
    of column c is ((2c-6)/7) * tan(half_hfov) (env.py:118).
  * The egocentric map window is a square of half-side
    half_len = (2/3) * max extent of all observed points around the agent
    (env.py:322-331), rotated by -heading (env.py:337).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gridmm_tpu.config import GridConfig


def lateral_offsets(patches_per_side: int = 7) -> jnp.ndarray:
    """Per-column lateral ray offsets, tiled row-major over the 7x7 patch grid.

    Reference: env.py:118 builds [-6/7, -4/7, ..., 6/7] * 7.
    """
    c = jnp.arange(patches_per_side, dtype=jnp.float32)
    offs = (2.0 * c - (patches_per_side - 1)) / patches_per_side
    return jnp.tile(offs, patches_per_side)  # (49,)


def backproject_view(
    depth_raw: jnp.ndarray,  # (..., P) raw depth (uint16 counts or metres)
    view_angle: jnp.ndarray,  # (...,) view azimuth in radians
    *,
    depth_scale: float,
    tan_half_hfov: float,
    patches_per_side: int = 7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Back-project one view's depth patches into viewpoint-relative x/y.

    Reference: get_rel_position (env.py:115-121).
    Returns (rel_x, rel_y) of shape (..., P).
    """
    depth_y = depth_raw.astype(jnp.float32) / depth_scale
    offs = lateral_offsets(patches_per_side)  # (P,)
    depth_x = depth_y * (offs * tan_half_hfov)
    cos_a = jnp.cos(view_angle)[..., None]
    sin_a = jnp.sin(view_angle)[..., None]
    rel_x = depth_x * cos_a + depth_y * sin_a
    rel_y = depth_y * cos_a - depth_x * sin_a
    return rel_x, rel_y


def backproject_panorama(
    depth_raw: jnp.ndarray,  # (V, P) raw horizon-view depth patches
    cfg: GridConfig,
    heading: jnp.ndarray | float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Back-project all `V` horizon views of a panorama.

    Returns (rel_x, rel_y, valid) each of shape (V*P,) where `valid` masks
    zero-depth pixels (env.py:283-285). In the continuous variant view
    azimuths are heading-relative and rel_y is negated
    (Policy_ViewSelection_GridMap.py:779-782).
    """
    v = jnp.arange(cfg.num_views, dtype=jnp.float32)
    angles = v * (2.0 * jnp.pi / cfg.num_views)  # (ix-12) * pi/6 for 12 views
    if cfg.view_angles_relative:
        angles = angles - heading
    rel_x, rel_y = backproject_view(
        depth_raw,
        angles,
        depth_scale=cfg.depth_scale,
        tan_half_hfov=cfg.tan_half_hfov,
    )
    valid = depth_raw > 0
    return rel_x.reshape(-1), cfg.y_sign * rel_y.reshape(-1), valid.reshape(-1)


def compute_half_len(
    min_x: jnp.ndarray,
    max_x: jnp.ndarray,
    min_y: jnp.ndarray,
    max_y: jnp.ndarray,
    pos_x: jnp.ndarray,
    pos_y: jnp.ndarray,
    window_scale: float = 2.0 / 3.0,
) -> jnp.ndarray:
    """Egocentric window half-side (env.py:322-331)."""
    x_half = jnp.maximum(pos_x - min_x, max_x - pos_x)
    y_half = jnp.maximum(pos_y - min_y, max_y - pos_y)
    return jnp.maximum(x_half, y_half) * window_scale


def rotate_into_agent_frame(
    px: jnp.ndarray,
    py: jnp.ndarray,
    pos_x: jnp.ndarray,
    pos_y: jnp.ndarray,
    heading: jnp.ndarray,
    *,
    heading_sign: float = -1.0,
    heading_offset: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Translate world points to the agent and rotate by the heading convention.

    Reference: env.py:337-348 uses angle = -heading; the continuous variant uses
    a different sign/offset (Policy_ViewSelection_GridMap.py:785,797).
    """
    angle = heading_sign * heading + heading_offset
    tx = px - pos_x
    ty = py - pos_y
    cos_a, sin_a = jnp.cos(angle), jnp.sin(angle)
    map_x = tx * cos_a + ty * sin_a
    map_y = ty * cos_a - tx * sin_a
    return map_x, map_y


def quantize_to_cells(
    map_x: jnp.ndarray,
    map_y: jnp.ndarray,
    half_len: jnp.ndarray,
    grid_width: int = 14,
    grid_height: int = 14,
) -> jnp.ndarray:
    """Quantize agent-frame points to cell ids in [0, W*H) (env.py:349-361).

    The reference truncates with .astype(int32) then clips; floor+clip is
    identical after clipping to [0, W-1].
    """
    denom = jnp.maximum(2.0 * half_len, 1e-8)
    gx = jnp.floor((map_x + half_len) / denom * (grid_width - 1)).astype(jnp.int32)
    gy = jnp.floor((map_y + half_len) / denom * (grid_height - 1)).astype(jnp.int32)
    gx = jnp.clip(gx, 0, grid_width - 1)
    gy = jnp.clip(gy, 0, grid_height - 1)
    return gx * grid_height + gy


def rel_heading_elevation(
    dx: jnp.ndarray, dy: jnp.ndarray, dz: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Relative heading/elevation/distance (models/graph_utils.py:15-32).

    heading = arcsin(dx / |dxy|), reflected to pi - heading when dy < 0
    (the simulator's x-y axes are transposed, per the reference comment).
    """
    xy_dist = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), 1e-8)
    xyz_dist = jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-8)
    heading = jnp.arcsin(jnp.clip(dx / xy_dist, -1.0, 1.0))
    heading = jnp.where(dy < 0, jnp.pi - heading, heading)
    elevation = jnp.arcsin(jnp.clip(dz / xyz_dist, -1.0, 1.0))
    return heading, elevation, xyz_dist


def angle_fts(headings: jnp.ndarray, elevations: jnp.ndarray, angle_feat_size: int = 4) -> jnp.ndarray:
    """[sin h, cos h, sin e, cos e] tiled to angle_feat_size (graph_utils.py:34-40)."""
    base = jnp.stack(
        [jnp.sin(headings), jnp.cos(headings), jnp.sin(elevations), jnp.cos(elevations)],
        axis=-1,
    )
    reps = angle_feat_size // 4
    if reps > 1:
        base = jnp.concatenate([base] * reps, axis=-1)
    return base


@functools.partial(jax.jit, static_argnames=("grid_width", "grid_height",
                                              "max_dist", "convention"))
def gridmap_pos_fts(
    half_len: jnp.ndarray,  # (...,) scalar or batch of window half-sides
    grid_width: int = 14,
    grid_height: int = 14,
    max_dist: float = 30.0,
    convention: str = "discrete",
) -> jnp.ndarray:
    """Per-cell positional features (..., W*H, 5): angle fts + dist/max_dist.

    Reference: get_gridmap_pos_fts (env.py:242-265) loops i over width and j
    over height with flat index i*H + j and cell centers at
    (i*cell - half + cell/2, j*cell - half + cell/2, 0).

    convention:
      * "discrete": map_nav's calculate_vp_rel_pos_fts unpacks (x, y, z) —
        cell centers [cx, cy, 0] give the full arcsin heading with the dy<0
        reflection and elevation 0 (r2r/env.py:60-77).
      * "ce": VLN_CE's helper unpacks (x, z, y) (models/utils.py:125-144),
        so [cx, cy, 0] degenerates to heading = arcsin(cx/|cx|) = +/-pi/2
        (the reflection tests the always-equal third component) and the cy
        component lands in ELEVATION = arcsin(cy/dist). The released CE
        checkpoints trained through this; reproduced deliberately
        (executed-oracle: test_ref_oracle_grid_build_ce).
    """
    half = jnp.asarray(half_len, jnp.float32)[..., None]
    cell = half * 2.0 / grid_width
    i = jnp.arange(grid_width * grid_height, dtype=jnp.float32) // grid_height
    j = jnp.arange(grid_width * grid_height, dtype=jnp.float32) % grid_height
    cx = i * cell - half + cell / 2.0
    cy = j * cell - half + cell / 2.0
    if convention == "ce":
        xy = jnp.maximum(jnp.abs(cx), 1e-8)
        dist = jnp.maximum(jnp.sqrt(cx * cx + cy * cy), 1e-8)
        heading = jnp.arcsin(jnp.clip(cx / xy, -1.0, 1.0))
        elevation = jnp.arcsin(jnp.clip(cy / dist, -1.0, 1.0))
    else:
        heading, elevation, dist = rel_heading_elevation(
            cx, cy, jnp.zeros_like(cx))
    ang = angle_fts(heading, elevation)
    return jnp.concatenate([ang, (dist / max_dist)[..., None]], axis=-1)


def target_cell_id(
    target_x: jnp.ndarray,
    target_y: jnp.ndarray,
    pos_x: jnp.ndarray,
    pos_y: jnp.ndarray,
    heading: jnp.ndarray,
    half_len: jnp.ndarray,
    grid_width: int = 14,
    grid_height: int = 14,
    heading_sign: float = -1.0,
) -> jnp.ndarray:
    """Supervision target: grid cell of the next GT viewpoint, 1-indexed
    (0 = stop). Reference: get_global_target (env.py:196-240); note it
    quantizes with *14 // (2*half_len) — a different rounding than the map
    build's *(W-1) — kept faithfully.
    """
    angle = heading_sign * heading
    dx = target_x - pos_x
    dy = target_y - pos_y
    rx = dx * jnp.cos(angle) + dy * jnp.sin(angle)
    ry = dy * jnp.cos(angle) - dx * jnp.sin(angle)
    denom = jnp.maximum(2.0 * half_len, 1e-8)
    tx = jnp.floor((rx + half_len) * grid_width / denom).astype(jnp.int32)
    ty = jnp.floor((ry + half_len) * grid_height / denom).astype(jnp.int32)
    tx = jnp.clip(tx, 0, grid_width - 1)
    ty = jnp.clip(ty, 0, grid_height - 1)
    return 1 + tx * grid_height + ty


class PointCloudState(NamedTuple):
    """Fixed-capacity per-episode point buffer: the TPU-native replacement for
    the reference's dynamically growing numpy lists (env.py:142-151,298-310).

    `features` may hold raw CLIP patch features OR already-projected
    (grid_proj) features — the reference reprojects the entire accumulated
    cloud every step (vilmodel.py:793-807); projecting once at insertion is
    exact (the projection is linear and its parameters are fixed within a
    trajectory) and removes the O(steps * N * D^2) recompute. `weights`
    likewise caches each point's instruction-relevance logit (the instruction
    is constant across an episode).

    All arrays are batched over episodes (leading dim B).
    """

    xy: jnp.ndarray       # (B, N, 2) world-frame point positions, f32
    features: jnp.ndarray  # (B, N, D) point features (raw or projected)
    weights: jnp.ndarray  # (B, N) cached relevance logits (0 when unused)
    valid: jnp.ndarray    # (B, N) bool — inserted AND nonzero depth
    inserted: jnp.ndarray  # (B, N) bool — slot holds a real point (any depth)
    count: jnp.ndarray    # (B,) int32 — number of inserted points

    @classmethod
    def create(cls, batch: int, cfg: GridConfig, max_points: int | None = None,
               feature_dtype=None) -> "PointCloudState":
        n = max_points if max_points is not None else cfg.max_points
        if feature_dtype is None:
            feature_dtype = jnp.dtype(cfg.feature_dtype)
        return cls(
            xy=jnp.zeros((batch, n, 2), jnp.float32),
            features=jnp.zeros((batch, n, cfg.feature_dim), feature_dtype),
            weights=jnp.zeros((batch, n), jnp.float32),
            valid=jnp.zeros((batch, n), bool),
            inserted=jnp.zeros((batch, n), bool),
            count=jnp.zeros((batch,), jnp.int32),
        )


def append_panorama(
    state: PointCloudState,
    depth_raw: jnp.ndarray,     # (B, V, P) raw depth patches for this step
    patch_features: jnp.ndarray,  # (B, V*P, D) point features (cls dropped)
    pos_xy: jnp.ndarray,        # (B, 2) agent world position
    cfg: GridConfig,
    point_weights: jnp.ndarray | None = None,  # (B, V*P) relevance logits
    headings: jnp.ndarray | None = None,  # (B,) needed when view angles are
                                          # heading-relative (continuous env)
) -> PointCloudState:
    """Append one panorama's back-projected points to every episode's buffer.

    Because every step inserts exactly V*P points (env.py:298-304 concatenates
    588 each step), the write offset is `count` and the update is a
    dynamic_update_slice per batch row — static-shaped and jit-friendly.
    """
    b, n, _ = state.xy.shape
    ppstep = cfg.points_per_step
    if point_weights is None:
        point_weights = jnp.zeros(patch_features.shape[:2], jnp.float32)
    if headings is None:
        headings = jnp.zeros((b,), jnp.float32)

    def per_item(depth_i, feats_i, w_in_i, pos_i, heading_i, xy_i, f_i, w_i,
                 val_i, ins_i, cnt_i):
        rel_x, rel_y, dvalid = backproject_panorama(depth_i, cfg, heading_i)
        pts = jnp.stack([rel_x + pos_i[0], rel_y + pos_i[1]], axis=-1)  # (VP, 2)
        xy_i = jax.lax.dynamic_update_slice(xy_i, pts, (cnt_i, 0))
        f_i = jax.lax.dynamic_update_slice(
            f_i, feats_i.astype(f_i.dtype), (cnt_i, 0))
        w_i = jax.lax.dynamic_update_slice(
            w_i, w_in_i.astype(w_i.dtype), (cnt_i,))
        val_i = jax.lax.dynamic_update_slice(val_i, dvalid, (cnt_i,))
        ins_i = jax.lax.dynamic_update_slice(
            ins_i, jnp.ones((ppstep,), bool), (cnt_i,))
        return xy_i, f_i, w_i, val_i, ins_i, cnt_i + ppstep

    xy, feats, weights, valid, inserted, count = jax.vmap(per_item)(
        depth_raw, patch_features, point_weights, pos_xy, headings,
        state.xy, state.features, state.weights, state.valid, state.inserted,
        state.count,
    )
    return PointCloudState(xy, feats, weights, valid, inserted, count)


def egocentric_grid_assignment(
    state: PointCloudState,
    pos_xy: jnp.ndarray,   # (B, 2) current agent position
    heading: jnp.ndarray,  # (B,) current agent heading
    cfg: GridConfig,
    num_active: jnp.ndarray | None = None,  # (B,) or scalar: only the first
                                            # num_active slots participate
                                            # (stacked-replay step masking)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Recompute every point's egocentric cell id for the current pose.

    Returns (cell_ids (B,N) int32 with -1 for invalid/uninserted slots,
             half_len (B,), pos_fts (B, W*H, 5)).

    Matches env.py:322-374: the window extent is taken over ALL inserted points
    (zero-depth points back-project onto the agent position and legitimately
    participate in the min/max), while only nonzero-depth points receive a cell.

    `num_active` restricts both the window extents and the cell assignment to
    a prefix of the buffer — used by the stacked replay formulation, where one
    shared full-trajectory buffer stands in for every step's incremental
    buffer (train/step.py).
    """
    px, py = state.xy[..., 0], state.xy[..., 1]
    big = jnp.float32(1e4)  # reference initializes extents to +/-10000 (env.py:146-149)
    ins = state.inserted
    valid = state.valid
    if num_active is not None:
        lim = jnp.arange(px.shape[1])[None, :] < jnp.asarray(
            num_active).reshape(-1, 1)
        ins = ins & lim
        valid = valid & lim
    min_x = jnp.min(jnp.where(ins, px, big), axis=1)
    max_x = jnp.max(jnp.where(ins, px, -big), axis=1)
    min_y = jnp.min(jnp.where(ins, py, big), axis=1)
    max_y = jnp.max(jnp.where(ins, py, -big), axis=1)

    half_len = compute_half_len(
        min_x, max_x, min_y, max_y, pos_xy[:, 0], pos_xy[:, 1], cfg.window_scale
    )

    map_x, map_y = rotate_into_agent_frame(
        px, py, pos_xy[:, 0:1], pos_xy[:, 1:2], heading[:, None],
        heading_sign=cfg.heading_sign, heading_offset=cfg.heading_offset,
    )
    cells = quantize_to_cells(
        cfg.map_x_sign * map_x, map_y, half_len[:, None],
        cfg.grid_width, cfg.grid_height
    )
    cells = jnp.where(valid, cells, -1)
    pos_fts = gridmap_pos_fts(
        half_len, cfg.grid_width, cfg.grid_height, cfg.max_dist,
        convention=cfg.pos_fts_convention,
    )
    return cells, half_len, pos_fts


def stacked_point_state(
    depth_raw: jnp.ndarray,       # (S, B, V, P) per-step raw depth patches
    features: jnp.ndarray,        # (B, S*V*P, D) step-major point features
    weights: jnp.ndarray,         # (B, S*V*P) relevance logits
    pos_xy: jnp.ndarray,          # (S, B, 2) agent position per step
    headings: jnp.ndarray,        # (S, B)
    cfg: GridConfig,
) -> PointCloudState:
    """Build the FULL-trajectory point buffer in one shot (stacked replay).

    Step s's points occupy rows [s*V*P, (s+1)*V*P) — exactly the layout the
    incremental `append_panorama` chain produces from a fresh buffer, so a
    prefix of this buffer (egocentric_grid_assignment num_active) is
    bit-identical to the step-s incremental state. Training replay uses this
    to keep the point buffer OUT of the scan carry: the reverse pass then
    saves one buffer instead of one per step (train/step.py).
    """
    s, b = depth_raw.shape[:2]

    def one(depth_sb, pos_sb, heading_sb):
        rel_x, rel_y, dvalid = backproject_panorama(depth_sb, cfg, heading_sb)
        return rel_x + pos_sb[0], rel_y + pos_sb[1], dvalid

    fx, fy, valid = jax.vmap(jax.vmap(one))(depth_raw, pos_xy, headings)
    xy = jnp.stack([fx, fy], axis=-1)          # (S, B, VP, 2)
    n = s * xy.shape[2]
    xy = xy.transpose(1, 0, 2, 3).reshape(b, n, 2)
    valid = valid.transpose(1, 0, 2).reshape(b, n)
    return PointCloudState(
        # same buffer dtype as PointCloudState.create/append_panorama —
        # keeping f32 here when feature_dtype is bf16 would train on
        # un-quantized features while serving pools quantized ones
        xy=xy, features=features.astype(jnp.dtype(cfg.feature_dtype)),
        weights=weights.astype(jnp.float32), valid=valid,
        inserted=jnp.ones((b, n), bool),
        count=jnp.full((b,), n, jnp.int32),
    )
