"""Device-side CE step assembly: the whole VLN-CE policy step as ONE
jitted graph.

The host path (`CEAgent._build_step` + `candidates_from_nms`) re-derives the
reference's per-step numpy/python assembly (Policy_ViewSelection_GridMap.py:
360-391 waypoint thresholding, :509-620 traj/vp positional features). That
costs one extra device round trip per step (perception out -> host assembly
-> navigation in) plus per-env python loops that dominate at batch (measured
in PARITY.md, "VLN-CE per-step policy latency"). Everything in that assembly
is static-shape arithmetic on <=5 candidates and <=G graph slots, so this
module re-expresses it in jnp: waypoint candidates via `lax.top_k` on the
NMS heatmap, positional features from padded trajectory arrays, masks from
`arange` comparisons. Greedy rollouts then run perception + candidate
extraction + step assembly + navigation in a single XLA dispatch.

Exact-equivalence tests against the host path: tests/test_ce_device_step.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gridmm_tpu.config import GridMMConfig
from gridmm_tpu.train.step import StepInputs

NUM_ANGLES, NUM_DISTS = 120, 12
DIST_BIN = 0.25  # metres per distance bin


def device_angle_features(heading: jnp.ndarray, elevation: jnp.ndarray,
                          af: int = 4) -> jnp.ndarray:
    """jnp twin of env/graph.angle_features, broadcast over leading dims."""
    base = jnp.stack([jnp.sin(heading), jnp.cos(heading),
                      jnp.sin(elevation), jnp.cos(elevation)], axis=-1)
    return jnp.concatenate([base] * (af // 4), axis=-1).astype(jnp.float32)


def device_rel_pos_features(a: jnp.ndarray, b: jnp.ndarray,
                            base_heading: jnp.ndarray):
    """Vectorized ce/agent.rel_pos_features over (..., 3) habitat triples.

    Returns (rel_heading, rel_elevation, dist); exactly (0, 0, 0) when the
    positions coincide, BEFORE the base-heading subtraction (matching the
    host early-return)."""
    dx = b[..., 0] - a[..., 0]
    dz = b[..., 1] - a[..., 1]
    dy = b[..., 2] - a[..., 2]
    xy = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), 1e-8)
    xyz = jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-8)
    h = jnp.arcsin(jnp.clip(dx / xy, -1.0, 1.0))
    h = jnp.where(dy < 0, jnp.pi - h, h) - base_heading
    e = jnp.arcsin(jnp.clip(dz / xyz, -1.0, 1.0))
    zero = (dx == 0) & (dz == 0) & (dy == 0)
    return (jnp.where(zero, 0.0, h), jnp.where(zero, 0.0, e),
            jnp.where(zero, 0.0, xyz))


def device_traj_pos_features(traj_pos: jnp.ndarray, traj_dist: jnp.ndarray,
                             traj_len: jnp.ndarray, cur_heading: jnp.ndarray,
                             af: int, max_dist: float,
                             max_step: float) -> jnp.ndarray:
    """ce/agent.traj_pos_features over padded (B, T, 3) trajectories.

    traj_len (B,) counts valid chronological rows (last valid = current
    node); rows >= traj_len are garbage the caller must mask."""
    b, tcap = traj_dist.shape
    idx = jnp.arange(tcap)
    valid = idx[None, :] < traj_len[:, None]
    d = jnp.where(valid, traj_dist, 0.0)
    # path_dist[j] = sum_{k>j, k<len} dist[k] (host loop accumulates from the
    # current node backwards)
    suffix = jnp.cumsum(d[:, ::-1], axis=1)[:, ::-1]
    path_dist = suffix - d
    cur = jnp.take_along_axis(
        traj_pos, jnp.maximum(traj_len - 1, 0)[:, None, None], axis=1)
    h, e, dist = device_rel_pos_features(cur, traj_pos,
                                         cur_heading[:, None])
    recency = (traj_len[:, None] - 1 - idx).astype(jnp.float32) / max_step
    return jnp.concatenate([
        device_angle_features(h, e, af),
        (dist / max_dist)[..., None].astype(jnp.float32),
        (path_dist / max_dist)[..., None].astype(jnp.float32),
        recency[..., None],
    ], axis=-1)


def device_start_pos_features(traj_pos: jnp.ndarray, traj_dist: jnp.ndarray,
                              traj_len: jnp.ndarray,
                              cur_heading: jnp.ndarray, af: int,
                              max_dist: float,
                              max_step: float) -> jnp.ndarray:
    """ce/agent.start_pos_features over padded trajectories -> (B, af+3)."""
    b, tcap = traj_dist.shape
    idx = jnp.arange(tcap)
    valid = idx[None, :] < traj_len[:, None]
    cur = jnp.take_along_axis(
        traj_pos, jnp.maximum(traj_len - 1, 0)[:, None, None], axis=1)[:, 0]
    h, e, dist = device_rel_pos_features(cur, traj_pos[:, 0], cur_heading)
    total = jnp.sum(jnp.where(valid, traj_dist, 0.0), axis=1)
    return jnp.concatenate([
        device_angle_features(h, e, af),
        (dist / max_dist)[:, None].astype(jnp.float32),
        (total / max_dist)[:, None].astype(jnp.float32),
        (traj_len.astype(jnp.float32) / max_step)[:, None],
    ], axis=-1)


class DeviceCandidates(NamedTuple):
    ang_bins: jnp.ndarray   # (B, K) i32 heatmap angle bin (rel to heading)
    dist_bins: jnp.ndarray  # (B, K) i32 distance bin
    scores: jnp.ndarray     # (B, K) f32 NMS score, descending
    mask: jnp.ndarray       # (B, K) bool valid candidate


def device_candidates(nms_maps: jnp.ndarray,
                      max_candidates: int) -> DeviceCandidates:
    """Nonzero NMS peaks in the reference's enumeration order -> fixed-K
    candidate slots.

    Twin of CEAgent.candidates_from_nms (no sampling): the host enumerates
    nonzero entries row-major (Policy:446-449 nonzero() = angle-major
    ascending). Nonzero peaks get their flat index as sort key, zeros sort
    to the back; NMS bounds the count at max_predictions."""
    b = nms_maps.shape[0]
    flat = nms_maps.reshape(b, -1)
    n_flat = flat.shape[1]
    key = jnp.where(flat > 0, jnp.arange(n_flat)[None, :], n_flat)
    order = jnp.argsort(key, axis=1)[:, :max_candidates]
    scores = jnp.take_along_axis(flat, order, axis=1)
    return DeviceCandidates(
        ang_bins=(order // NUM_DISTS).astype(jnp.int32),
        dist_bins=(order % NUM_DISTS).astype(jnp.int32),
        scores=scores,
        mask=scores > 0,
    )


def device_build_step(
    cfg: GridMMConfig,
    cand: DeviceCandidates,
    view_cls: jnp.ndarray,            # (B, 12, d) per-view cls features
    depth: jnp.ndarray,               # (B, 12, Hd, Wd) metric depth
    pos_xy: jnp.ndarray,              # (B, 2)
    heading: jnp.ndarray,             # (B,)
    traj_pos: jnp.ndarray,            # (B, T, 3) padded habitat triples
    traj_dist: jnp.ndarray,           # (B, T) padded per-step distances
    traj_len: jnp.ndarray,            # (B,) valid rows (incl. current)
    t: jnp.ndarray,                   # scalar i32 step index
    view_feats: Optional[jnp.ndarray] = None,  # (B, 12, d_view) timm cls
    ended: Optional[jnp.ndarray] = None,       # (B,) bool ended episodes
) -> StepInputs:
    """jnp twin of CEAgent._build_step (candidate/graph/vp assembly).

    Returns StepInputs with a zero patch_fts placeholder (the caller wires
    the device-resident CLIP patch tokens, like the host path does)."""
    sh, gc = cfg.shapes, cfg.grid
    b = view_cls.shape[0]
    v, g = sh.max_vp_len, sh.max_gmap_len
    vm1 = v - 1
    af = cfg.model.angle_feat_size
    d = cfg.model.image_feat_size
    k = cand.ang_bins.shape[1]
    ign = cfg.train.ignoreid
    mas = cfg.model.max_action_steps

    view_src = (view_feats[..., :d] if view_feats is not None
                else view_cls)  # (B, 12, d)
    n = cand.mask.sum(axis=1).astype(jnp.int32)  # (B,) candidate count

    # candidate geometry. The reference's candidate angle is the CCW
    # conversion 2pi - bin*3deg with NO modulo (Policy:451-452), and its
    # view index is the COUNTER-clockwise sector over the clockwise-ordered
    # frames (Policy:456-459: 12 - (a+5)//10, 12 -> 0). The integer bin
    # space keeps half-up ties exact (float rounding of rel would flip
    # midpoint bins on f32-vs-f64 noise).
    ang_cc = (2 * jnp.pi -
              cand.ang_bins.astype(jnp.float32) * (2 * jnp.pi / NUM_ANGLES))
    per_img = NUM_ANGLES // 12
    img_idx = (12 - (cand.ang_bins + per_img // 2) // per_img) % 12  # (B, K)
    cand_ang = device_angle_features(ang_cc, jnp.zeros_like(ang_cc), af)

    # ---- panorama tokens: candidates first, then the views NOT claimed by
    # a candidate, in ascending view order (Policy:466-476) ----------------
    rows = jnp.arange(vm1)
    is_cand = rows[None, :] < n[:, None]                       # (B, vm1)
    crow = jnp.minimum(rows, k - 1)                            # cand index
    # per-view used mask: view claimed by any valid candidate
    vix = jnp.arange(12)
    used = jnp.any((img_idx[:, None, :] == vix[None, :, None]) &
                   cand.mask[:, None, :], axis=2)              # (B, 12)
    n_unused = (12 - used.sum(axis=1)).astype(jnp.int32)
    # unused views first in ascending order, used views sorted to the back
    view_order = jnp.argsort(
        vix[None, :] + used.astype(jnp.int32) * 100, axis=1)   # (B, 12)
    vslot = jnp.clip(rows[None, :] - n[:, None], 0, 11)
    vrow = jnp.take_along_axis(view_order, vslot, axis=1)      # actual view
    in_view = (rows[None, :] >= n[:, None]) & \
        (rows[None, :] < (n + n_unused)[:, None])
    cand_img = jnp.take_along_axis(
        view_src, jnp.take_along_axis(
            img_idx, jnp.broadcast_to(crow, (b, vm1)), axis=1)[..., None],
        axis=1)                                                # (B, vm1, d)
    view_img = jnp.take_along_axis(view_src, vrow[..., None], axis=1)
    view_img_fts = jnp.where(is_cand[..., None], cand_img,
                             jnp.where(in_view[..., None], view_img, 0.0))

    cand_ang_rows = jnp.take_along_axis(
        cand_ang, jnp.broadcast_to(crow, (b, vm1))[..., None], axis=1)
    # non-candidate angle rows come from a RUNNING table: the reference
    # initializes the 12-view angle table once before its per-env loop and
    # overwrites the variable with each env's assembled rows
    # (Policy:461,470-480) — env i >= 1 reads the previous env's sequence.
    # Batch-position-dependent aliasing reproduced deliberately (host twin
    # in ce/agent._build_step; executed-oracle test_ref_oracle_ce_full_step)
    table = device_angle_features(
        jnp.arange(12, dtype=jnp.float32) * (2 * jnp.pi / 12),
        jnp.zeros((12,), jnp.float32), af)              # (12, af)
    loc_ang_rows = []
    for i in range(b):
        view_ang_i = table[vrow[i]]                     # (vm1, af)
        loc_ang_i = jnp.where(is_cand[i][:, None], cand_ang_rows[i],
                              jnp.where(in_view[i][:, None], view_ang_i,
                                        0.0))
        loc_ang_rows.append(loc_ang_i)
        # only ACTIVE envs feed the chain (the reference pauses ended envs
        # out of the batch, ss_trainer_GridMap.py:436-450)
        if ended is None:
            table = loc_ang_i[:12]
        else:
            table = jnp.where(ended[i], table, loc_ang_i[:12])
    loc_ang = jnp.stack(loc_ang_rows)
    loc_box = jnp.where((is_cand | in_view)[..., None],
                        jnp.ones((b, vm1, 3), jnp.float32), 0.0)
    loc_fts = jnp.concatenate([loc_ang, loc_box], axis=-1)
    nav_types = is_cand.astype(jnp.int32)
    view_mask = is_cand | in_view

    # ---- grid-memory ingredients ------------------------------------------
    if gc.depth_normalized:
        # habitat [0,1] depth -> metres with the reference's column-max zero
        # substitution + x100/100 scale (GridMap.preprocess_depth,
        # Policy:225-247); the waypoint towers upstream consume the raw maps
        colmax = jnp.max(depth, axis=2, keepdims=True)
        depth = jnp.where(depth == 0, colmax, depth)
        depth = (gc.min_depth * 100.0 +
                 depth * (gc.max_depth - gc.min_depth) * 100.0) / 100.0
    # depth patch centers (Policy:728-730): 19 + 36*i over 256px maps
    side = int(round(gc.patches_per_view ** 0.5))
    centers = 19 + 36 * jnp.arange(side)
    dm = depth[:, :, centers][:, :, :, centers]
    depth_p = dm.reshape(b, gc.num_views, gc.patches_per_view)

    # ---- topological graph slots ------------------------------------------
    cur = jnp.minimum(t + 1, g - 1).astype(jnp.int32)  # same for all envs
    s = jnp.arange(g)
    chain = (s[None, :] >= 1) & (s[None, :] <= cur)            # (1→B, g)
    fr_j = s[None, :] - cur - 1                                # frontier idx
    frontier = (fr_j >= 0) & (fr_j < n[:, None])
    gmap_mask = (s[None, :] == 0) | chain | frontier
    gmap_visited = jnp.broadcast_to(chain, (b, g))
    gmap_step_ids = jnp.where(
        frontier, jnp.minimum(cur + 1, mas - 1),
        jnp.where(s[None, :] == cur, jnp.minimum(t + 1, mas - 1),
                  jnp.where(chain, jnp.minimum(s[None, :], mas - 1), 0)),
    ).astype(jnp.int32)

    tf = device_traj_pos_features(traj_pos, traj_dist, traj_len, heading,
                                  af, gc.max_dist, gc.pos_step_norm)
    # chain slot s holds node s-1; the clamped last slot holds the CURRENT
    # node (host: gmap_pos_fts[cur] = tf[-1])
    tmax = tf.shape[1]
    tf_idx = jnp.where(s[None, :] == cur,
                       jnp.maximum(traj_len - 1, 0)[:, None],
                       jnp.clip(s[None, :] - 1, 0, tmax - 1))
    chain_fts = jnp.take_along_axis(tf, tf_idx[..., None], axis=1)
    fr_ang = jnp.take_along_axis(
        cand_ang, jnp.clip(fr_j, 0, k - 1)[..., None], axis=1)
    # the trainer passes batch_distances=batch_ANGLES into the navigation
    # forward (ss_trainer_GridMap.py:275), so the candidate pos-feature
    # "distance" entries carry the CCW angle value — a reference bug the
    # released checkpoints trained through (env stepping keeps true dists)
    fr_dist = jnp.take_along_axis(ang_cc, jnp.clip(fr_j, 0, k - 1), axis=1)
    fr_fts = jnp.concatenate([
        fr_ang,
        (fr_dist / gc.max_dist)[..., None],
        (fr_dist / gc.max_dist)[..., None],
        jnp.full((b, g, 1), 1.0 / gc.pos_step_norm),
    ], axis=-1)
    stop_fts = jnp.concatenate([
        device_angle_features(jnp.zeros((b, g)), jnp.zeros((b, g)), af),
        jnp.zeros((b, g, 3), jnp.float32)], axis=-1)
    gmap_pos_fts = jnp.where(
        frontier[..., None], fr_fts,
        jnp.where(chain[..., None], chain_fts,
                  jnp.where((s[None, :] == 0)[..., None], stop_fts, 0.0)))

    # candidate j <-> frontier slot cur+1+j index maps
    j = jnp.arange(vm1)
    slot = cur + 1 + j[None, :]
    cand_ok = (j[None, :] < n[:, None]) & (slot < g)
    cand_gmap_idx = jnp.where(cand_ok, slot, -1).astype(jnp.int32)
    fused_add_idx = jnp.where(frontier, fr_j + 1, -2).astype(jnp.int32)

    # ---- local (vp) branch --------------------------------------------------
    start = device_start_pos_features(traj_pos, traj_dist, traj_len, heading,
                                      af, gc.max_dist, gc.pos_step_norm)
    vp_pos_fts = jnp.zeros((b, v, 2 * af + 6), jnp.float32)
    vp_pos_fts = vp_pos_fts.at[:, :, : af + 3].set(start[:, None, :])
    jv = jnp.arange(v)
    vp_is_cand = (jv[None, :] >= 1) & (jv[None, :] <= n[:, None])
    vj = jnp.clip(jv[None, :] - 1, 0, k - 1)
    vp_cand_ang = jnp.take_along_axis(cand_ang, vj[..., None], axis=1)
    # same batch_distances=batch_angles substitution as the frontier rows
    vp_cand_dist = jnp.take_along_axis(ang_cc, vj, axis=1)
    vp_tail = jnp.concatenate([
        vp_cand_ang,
        (vp_cand_dist / gc.max_dist)[..., None],
        (vp_cand_dist / gc.max_dist)[..., None],
        jnp.full((b, v, 1), 1.0 / gc.pos_step_norm),
    ], axis=-1)
    vp_pos_fts = vp_pos_fts.at[:, :, af + 3:].set(
        jnp.where(vp_is_cand[..., None], vp_tail, 0.0))
    vp_nav_mask = (jv[None, :] == 0) | vp_is_cand

    ig = jnp.full((b,), ign, jnp.int32)
    return StepInputs(
        view_img_fts=view_img_fts.astype(jnp.float32), loc_fts=loc_fts,
        nav_types=nav_types, view_mask=view_mask,
        depth=depth_p.astype(jnp.float32),
        patch_fts=jnp.zeros((b, gc.points_per_step, d), jnp.float32),
        pos_xy=pos_xy.astype(jnp.float32),
        heading=heading.astype(jnp.float32),
        gmap_step_ids=gmap_step_ids, gmap_pos_fts=gmap_pos_fts,
        gmap_mask=gmap_mask, gmap_visited_mask=gmap_visited,
        cur_node_idx=jnp.broadcast_to(cur, (b,)).astype(jnp.int32),
        cand_gmap_idx=cand_gmap_idx,
        vp_pos_fts=vp_pos_fts, vp_nav_mask=vp_nav_mask,
        fused_add_idx=fused_add_idx,
        cand_backtrack_mask=jnp.zeros((b, v), bool),
        target=ig, grid_target=ig,
        vp_obj_mask=jnp.zeros((b, v), bool), obj_target=ig,
    )


def ce_action_logits(global_logits: jnp.ndarray, local_logits: jnp.ndarray,
                     cand_gmap_idx: jnp.ndarray) -> jnp.ndarray:
    """The CE action head: fused = global + local over the [stop]+candidates
    columns (gridmap/vilmodel.py:788-800 truncates global_logits to
    max(candidate_lengths) and adds local_logits; both masked by
    vp_nav_masks). Under the reference's CE token layout the traj-gmap leads
    with [stop]+candidates, so column j IS candidate j; under our stable-slot
    layout candidate j's gmap column is cand_gmap_idx[:, j] (the ephemeral
    frontier slot) and [stop] is column 0.

    A candidate whose waypoint slot overflowed the gmap capacity
    (cand_gmap_idx == -1, impossible in the reference's unpadded layout)
    falls back to its local logit alone."""
    b, v = local_logits.shape
    valid = cand_gmap_idx >= 0
    g_cand = jnp.take_along_axis(global_logits,
                                 jnp.maximum(cand_gmap_idx, 0), axis=1)
    g_cand = jnp.where(valid, g_cand, 0.0)
    add = jnp.concatenate([global_logits[:, :1], g_cand], axis=1)[:, :v]
    # local is already -inf outside [stop]+candidates; x + -inf stays -inf
    return local_logits + add
