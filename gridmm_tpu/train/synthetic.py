"""Synthetic batch generators for tests, dry runs, and benchmarks."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gridmm_tpu.config import GridMMConfig
from gridmm_tpu.train.step import StepInputs, TrajectoryBatch


def synthetic_pretrain_batch(cfg: GridMMConfig, batch: int, num_steps: int,
                             seed: int = 0):
    """Self-consistent trajectory batch for the pretraining proxy tasks."""
    from gridmm_tpu.train.pretrain import PretrainBatch

    rng = np.random.default_rng(seed)
    b, s = batch, num_steps
    t = cfg.shapes.max_txt_len
    g = cfg.shapes.max_gmap_len
    v = cfg.shapes.max_vp_len
    vm1 = v - 1
    d = cfg.model.image_feat_size
    gc = cfg.grid
    n = cfg.shapes.max_points
    f32 = np.float32
    assert g > s + 3, "gmap must hold the visited chain plus frontier"

    txt_len = rng.integers(8, t, size=(b,))
    txt_ids = rng.integers(5, cfg.model.vocab_size, size=(b, t)).astype(np.int32)
    txt_mask = np.arange(t)[None] < txt_len[:, None]
    # MLM labels: 15% of real tokens
    mlm_sel = (rng.random((b, t)) < 0.15) & txt_mask
    txt_labels = np.where(mlm_sel, txt_ids, -1).astype(np.int32)
    masked_ids = np.where(mlm_sel, 103, txt_ids).astype(np.int32)  # [MASK]

    n_tok = rng.integers(10, vm1, size=(b, s))
    token_mask = np.arange(vm1)[None, None] < n_tok[..., None]
    n_cand = rng.integers(2, 6, size=(b, s))
    nav_types = (np.arange(vm1)[None, None] < n_cand[..., None]).astype(np.int32)

    # visited chain: step t -> slot t+1; frontier slots s+1 .. s+3
    visited_idx = np.where(
        token_mask, (np.arange(s) + 1)[None, :, None], -1).astype(np.int32)
    frontier = np.stack([rng.integers(s + 1, s + 4, size=(b, s))
                         for _ in range(vm1)], axis=-1)
    cand_idx = np.where(nav_types == 1, frontier, -1).astype(np.int32)

    gmap_mask = np.zeros((b, g), bool)
    gmap_mask[:, : s + 4] = True
    gmap_visited = np.zeros((b, g), bool)
    gmap_visited[:, 1: s + 1] = True
    gmap_step_ids = np.zeros((b, g), np.int32)
    gmap_step_ids[:, 1: s + 1] = np.arange(1, s + 1)

    vp_nav_mask = np.zeros((b, v), bool)
    vp_nav_mask[:, 0] = True
    for i in range(b):
        vp_nav_mask[i, 1: 1 + n_cand[i, -1]] = True

    fused_add_idx = np.full((b, g), -2, np.int32)
    for i in range(b):
        for slot in range(s + 1, s + 4):
            fused_add_idx[i, slot] = (
                -1 if rng.random() < 0.5
                else 1 + rng.integers(0, n_cand[i, -1]))

    global_act = np.where(rng.random(b) < 0.3, 0,
                          rng.integers(s + 1, s + 4, size=b)).astype(np.int32)
    local_act = np.where(global_act == 0, 0,
                         1 + rng.integers(0, 2, size=b)).astype(np.int32)

    view_mrc_masks = (rng.random((b, vm1)) < 0.15)
    for i in range(b):
        view_mrc_masks[i, n_tok[i, -1]:] = False
    probs = rng.random((b, vm1, cfg.model.image_prob_size)).astype(f32)
    probs /= probs.sum(-1, keepdims=True)

    return PretrainBatch(
        txt_ids=jnp.asarray(masked_ids), txt_mask=jnp.asarray(txt_mask),
        traj_view_fts=jnp.asarray(
            rng.standard_normal((b, s, vm1, d)).astype(f32) * 0.3),
        traj_loc_fts=jnp.asarray(rng.standard_normal(
            (b, s, vm1, cfg.model.angle_feat_size + 3)).astype(f32) * 0.3),
        traj_nav_types=jnp.asarray(nav_types),
        traj_token_mask=jnp.asarray(token_mask),
        traj_step_mask=jnp.ones((b, s), bool),
        visited_idx=jnp.asarray(visited_idx),
        cand_idx=jnp.asarray(cand_idx),
        gmap_step_ids=jnp.asarray(gmap_step_ids),
        gmap_pos_fts=jnp.asarray(rng.standard_normal(
            (b, g, cfg.model.angle_feat_size + 3)).astype(f32) * 0.3),
        gmap_mask=jnp.asarray(gmap_mask),
        gmap_visited_mask=jnp.asarray(gmap_visited),
        vp_pos_fts=jnp.asarray(rng.standard_normal(
            (b, v, 2 * cfg.model.angle_feat_size + 6)).astype(f32) * 0.3),
        vp_nav_mask=jnp.asarray(vp_nav_mask),
        fused_add_idx=jnp.asarray(fused_add_idx),
        cand_backtrack_mask=jnp.zeros((b, v), bool),
        grid_fts=jnp.asarray(
            rng.standard_normal((b, n, d)).astype(f32) * 0.3),
        grid_cells=jnp.asarray(np.where(
            np.arange(n)[None] < s * gc.points_per_step,
            rng.integers(0, 196, size=(b, n)), -1).astype(np.int32)),
        gridmap_pos_fts=jnp.asarray(rng.standard_normal(
            (b, cfg.shapes.num_cells, 5)).astype(f32) * 0.1),
        txt_labels=jnp.asarray(txt_labels),
        view_mrc_masks=jnp.asarray(view_mrc_masks),
        view_probs=jnp.asarray(probs),
        global_act_labels=jnp.asarray(global_act),
        local_act_labels=jnp.asarray(local_act),
        obj_labels=jnp.zeros((b,), jnp.int32),
        vp_obj_mask=jnp.zeros((b, v), bool),
    )


def synthetic_trajectory_batch(
    cfg: GridMMConfig, batch: int, num_steps: int, seed: int = 0,
    views: int | None = None,
) -> TrajectoryBatch:
    rng = np.random.default_rng(seed)
    b, s = batch, num_steps
    t = cfg.shapes.max_txt_len
    g = cfg.shapes.max_gmap_len
    v = views if views is not None else cfg.shapes.max_vp_len
    vm1 = v - 1
    d = cfg.model.image_feat_size
    gc = cfg.grid

    f32 = np.float32
    txt_len = rng.integers(8, t, size=(b,))
    txt_ids = rng.integers(1, cfg.model.vocab_size, size=(b, t)).astype(np.int32)
    txt_mask = np.arange(t)[None, :] < txt_len[:, None]

    gmap_len = rng.integers(4, g, size=(s, b))
    gmap_mask = np.arange(g)[None, None, :] < gmap_len[..., None]
    visited = np.zeros((s, b, g), bool)
    for ti in range(s):
        for bi in range(b):
            # visit slots 1..t+1 but always leave the last slot unvisited so a
            # valid (finite-logit) teacher action exists
            visited[ti, bi, 1:min(ti + 2, gmap_len[ti, bi] - 1)] = True
    visited[..., 0] = False

    n_cand = rng.integers(2, 8, size=(s, b))
    view_mask = np.zeros((s, b, vm1), bool)
    view_mask[..., :36] = True
    nav_types = np.zeros((s, b, vm1), np.int32)
    for ti in range(s):
        for bi in range(b):
            nav_types[ti, bi, :n_cand[ti, bi]] = 1
    vp_nav_mask = np.concatenate(
        [np.ones((s, b, 1), bool), nav_types == 1], axis=-1)

    cand_gmap_idx = np.full((s, b, vm1), -1, np.int32)
    for ti in range(s):
        for bi in range(b):
            k = n_cand[ti, bi]
            cand_gmap_idx[ti, bi, :k] = rng.choice(
                np.arange(1, max(gmap_len[ti, bi], 2)), size=k, replace=True)

    # teacher action: stop (0) or the last (always-unvisited) gmap slot
    stop = rng.random((s, b)) < 0.3
    target = np.where(stop, 0, gmap_len - 1).astype(np.int32)
    target[s - 1:] = cfg.train.ignoreid  # final step marked done

    steps = StepInputs(
        view_img_fts=(rng.standard_normal((s, b, vm1, d)) * 0.3).astype(f32),
        loc_fts=(rng.standard_normal(
            (s, b, vm1, cfg.model.angle_feat_size + 3)) * 0.3).astype(f32),
        nav_types=nav_types,
        view_mask=view_mask,
        depth=rng.integers(
            0, 18000, size=(s, b, gc.num_views, gc.patches_per_view)
        ).astype(f32),
        patch_fts=(rng.standard_normal(
            (s, b, gc.points_per_step, d)) * 0.3).astype(f32),
        pos_xy=rng.uniform(-5, 5, size=(s, b, 2)).astype(f32),
        heading=rng.uniform(-np.pi, np.pi, size=(s, b)).astype(f32),
        gmap_step_ids=np.minimum(
            rng.integers(0, s + 1, size=(s, b, g)), cfg.model.max_action_steps - 1
        ).astype(np.int32),
        gmap_pos_fts=(rng.standard_normal(
            (s, b, g, cfg.model.angle_feat_size + 3)) * 0.3).astype(f32),
        gmap_mask=gmap_mask,
        gmap_visited_mask=visited,
        cur_node_idx=np.minimum(1 + np.arange(s)[:, None], gmap_len - 1).astype(np.int32) * np.ones((s, b), np.int32),
        cand_gmap_idx=cand_gmap_idx,
        vp_pos_fts=(rng.standard_normal(
            (s, b, v, 2 * cfg.model.angle_feat_size + 6)) * 0.3).astype(f32),
        vp_nav_mask=vp_nav_mask,
        # index maps only ever point at real candidates (finite local logits)
        fused_add_idx=np.where(
            rng.random((s, b, g)) < 0.5, -1,
            1 + rng.integers(0, 1 << 30, size=(s, b, g))
            % n_cand[..., None]).astype(np.int32),
        cand_backtrack_mask=(rng.random((s, b, v)) < 0.2) & vp_nav_mask,
        target=target,
        grid_target=rng.integers(0, 197, size=(s, b)).astype(np.int32),
        vp_obj_mask=np.zeros((s, b, v), bool),
        obj_target=np.full((s, b), cfg.train.ignoreid, np.int32),
    )
    steps = StepInputs(*[jnp.asarray(a) for a in steps])
    return TrajectoryBatch(
        txt_ids=jnp.asarray(txt_ids), txt_mask=jnp.asarray(txt_mask), steps=steps)
