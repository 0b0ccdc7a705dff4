"""Jitted training/eval steps.

The reference trains by interleaving host sim stepping with device forwards and
accumulating CE across steps before one backward (map_nav_src/r2r/agent.py:268-451).
Teacher-forced training needs no model-in-the-loop decisions, so here the ENTIRE
trajectory loss — language encode, per-step panorama encode, on-device point
buffer append + grid assignment, graph-node embedding aggregation, navigation
forward, CE — is one jitted `lax.scan` graph. Host work reduces to batch
assembly (index maps for the topological graph).

Gradient flow matches the reference: navigation loss backprops into the pano
encoder through BOTH the vp tokens and the gmap node embeddings (which are
scatter-averaged pano embeddings — agent.py:312-320 / vilmodel.py:592-626).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from gridmm_tpu.config import GridMMConfig
from gridmm_tpu.models.navigator import GridMMNavigator
from gridmm_tpu.ops import geometry as G
from gridmm_tpu.train.losses import cross_entropy_ignore


class StepInputs(NamedTuple):
    """Per-step arrays, each with leading (S, B, ...) when stacked."""

    # panorama tokens (V-1 view/object tokens; stop slot added on device)
    view_img_fts: jnp.ndarray   # (S, B, V-1, D_img)
    loc_fts: jnp.ndarray        # (S, B, V-1, angle+3)
    nav_types: jnp.ndarray      # (S, B, V-1) int
    view_mask: jnp.ndarray      # (S, B, V-1) bool
    # grid memory inputs
    depth: jnp.ndarray          # (S, B, views, patches) raw depth
    patch_fts: jnp.ndarray      # (S, B, views*patches, D_img) CLIP patch fts
    pos_xy: jnp.ndarray         # (S, B, 2) agent world position
    heading: jnp.ndarray        # (S, B)
    # topological graph (host-assembled index maps)
    gmap_step_ids: jnp.ndarray      # (S, B, G)
    gmap_pos_fts: jnp.ndarray       # (S, B, G, angle+3)
    gmap_mask: jnp.ndarray          # (S, B, G) bool
    gmap_visited_mask: jnp.ndarray  # (S, B, G) bool
    cur_node_idx: jnp.ndarray       # (S, B) gmap slot of the current node
    cand_gmap_idx: jnp.ndarray      # (S, B, V-1) gmap slot per candidate view, -1 none
    # local branch
    vp_pos_fts: jnp.ndarray     # (S, B, V, 2*angle+6)
    vp_nav_mask: jnp.ndarray    # (S, B, V) bool
    # fusion index maps
    fused_add_idx: jnp.ndarray        # (S, B, G)
    cand_backtrack_mask: jnp.ndarray  # (S, B, V)
    # supervision
    target: jnp.ndarray         # (S, B) fused-action label, ignore_id when done
    grid_target: jnp.ndarray    # (S, B) grid-cell label (0 stop) or ignore_id
    # object grounding (REVERIE/SOON; zero-filled otherwise)
    vp_obj_mask: jnp.ndarray    # (S, B, V) bool — vp token is an object
    obj_target: jnp.ndarray     # (S, B) object token index or ignore_id


class TrajectoryBatch(NamedTuple):
    txt_ids: jnp.ndarray   # (B, T)
    txt_mask: jnp.ndarray  # (B, T) bool
    steps: StepInputs


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: GridMMConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip 40 (agent_base.py:122-138,205)."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_norm_clip),
        optax.adamw(
            cfg.train.lr,
            b1=cfg.train.betas[0],
            b2=cfg.train.betas[1],
            eps=cfg.train.adam_eps,
            weight_decay=cfg.train.weight_decay,
        ),
    )


def create_train_state(cfg: GridMMConfig, params, tx=None) -> TrainState:
    tx = tx or make_optimizer(cfg)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def _update_node_embeds(gmap_sum, gmap_cnt, pano_embeds, pano_mask,
                        cur_node_idx, cand_gmap_idx, gmap_visited_mask,
                        accumulate: bool = True):
    """On-device GraphMap.update_node_embed (agent.py:312-320):
    current node <- rewrite with masked-average pano embedding;
    unvisited candidate nodes <- running sum of their view embeddings.

    accumulate=False (VLN-CE, ModelConfig.frontier_accumulate): candidate
    slots are EPHEMERAL — every slot past the current node is cleared first,
    so a frontier slot holds exactly this step's candidate pano embedding.
    The CE reference rebuilds its candidate tokens from scratch each step
    (Policy:522-537); without the clear, a slot reused by a later step's
    frontier would average in stale sums from earlier steps."""
    b = pano_embeds.shape[0]
    bi = jnp.arange(b)
    avg = jnp.sum(pano_embeds * pano_mask[..., None], axis=1) / jnp.maximum(
        jnp.sum(pano_mask, axis=1, keepdims=True), 1)

    if not accumulate:
        g = gmap_sum.shape[1]
        future = jnp.arange(g)[None, :] > cur_node_idx[:, None]
        gmap_sum = jnp.where(future[..., None], 0.0, gmap_sum)
        gmap_cnt = jnp.where(future, 0.0, gmap_cnt)

    # rewrite current node
    gmap_sum = gmap_sum.at[bi, cur_node_idx].set(avg)
    gmap_cnt = gmap_cnt.at[bi, cur_node_idx].set(1.0)

    # accumulate candidate views into their (unvisited) gmap slots
    valid = cand_gmap_idx >= 0
    valid = valid & ~jnp.take_along_axis(
        gmap_visited_mask, jnp.maximum(cand_gmap_idx, 0), axis=1)
    tgt = jnp.where(valid, cand_gmap_idx, 0)
    contrib = jnp.where(valid[..., None], pano_embeds, 0.0)
    gmap_sum = gmap_sum.at[bi[:, None], tgt].add(contrib)
    gmap_cnt = gmap_cnt.at[bi[:, None], tgt].add(valid.astype(jnp.float32))
    return gmap_sum, gmap_cnt


def _loss_head_logits(cfg, out, x):
    """Select the training head. 'ce' is the continuous-env action head:
    fused = global+local over [stop]+candidates (gridmap/vilmodel.py:788-800)
    — the ss_trainer takes its loss on exactly the logits it acts on
    (ss_trainer_GridMap.py:269-330)."""
    if cfg.train.loss_head == "ce":
        from gridmm_tpu.ce.device_step import ce_action_logits
        return ce_action_logits(out.global_logits, out.local_logits,
                                x.cand_gmap_idx)
    return getattr(out, f"{cfg.train.loss_head}_logits")


def _nav_inputs(cfg, txt_embeds, txt_mask, gmap_img_embeds, x, pano_embeds,
                grid_fts, grid_cells, grid_weights, gridmap_pos_fts):
    """Assemble the per-step "navigation" batch dict shared by the rollout
    step (nav_device_step) and the stacked replay loss — one definition so
    the trained graph and the served graph cannot silently diverge."""
    b = txt_mask.shape[0]
    d = cfg.model.hidden_size
    vp_img_embeds = jnp.concatenate(
        [jnp.zeros((b, 1, d), pano_embeds.dtype), pano_embeds], axis=1)
    vp_mask = jnp.concatenate([jnp.ones((b, 1), bool), x.view_mask], axis=1)
    return {
        "txt_embeds": txt_embeds, "txt_mask": txt_mask,
        "gmap_img_embeds": gmap_img_embeds.astype(cfg.model.dtype),
        "gmap_step_ids": x.gmap_step_ids, "gmap_pos_fts": x.gmap_pos_fts,
        "gmap_mask": x.gmap_mask, "gmap_visited_mask": x.gmap_visited_mask,
        "vp_img_embeds": vp_img_embeds, "vp_pos_fts": x.vp_pos_fts,
        "vp_mask": vp_mask, "vp_nav_mask": x.vp_nav_mask,
        "grid_fts": grid_fts, "grid_cells": grid_cells,
        "grid_weights": grid_weights, "gridmap_pos_fts": gridmap_pos_fts,
        "fused_add_idx": x.fused_add_idx,
        "cand_backtrack_mask": x.cand_backtrack_mask,
        "vp_obj_mask": x.vp_obj_mask if cfg.model.obj_feat_size > 0 else None,
        # default None = the reference's max over PADDED text
        # (ModelConfig.mask_txt_relevance)
        "txt_relevance_mask":
            txt_mask if cfg.model.mask_txt_relevance else None,
    }


class NavCarry(NamedTuple):
    """Cross-step device state of an episode batch."""

    point_state: G.PointCloudState
    gmap_sum: jnp.ndarray  # (B, G, D) running node-embedding sums (stable slots)
    gmap_cnt: jnp.ndarray  # (B, G)


def init_carry(cfg: GridMMConfig, batch: int,
               gmap_len: int | None = None) -> NavCarry:
    g = gmap_len if gmap_len is not None else cfg.shapes.max_gmap_len
    d = cfg.model.hidden_size
    return NavCarry(
        point_state=G.PointCloudState.create(batch, cfg.grid,
                                             cfg.shapes.max_points),
        gmap_sum=jnp.zeros((batch, g, d), jnp.float32),
        gmap_cnt=jnp.zeros((batch, g), jnp.float32),
    )


def nav_device_step(
    model: GridMMNavigator,
    cfg: GridMMConfig,
    params,
    txt_embeds, txt_mask,
    carry: NavCarry,
    x: StepInputs,
    deterministic: bool = True,
    rngs=None,
):
    """One navigation step on device: panorama encode, point-buffer append +
    grid assignment, node-embedding aggregation, navigation forward.

    Gmap tokens use a STABLE discovery-order slot space (slot 0 = [stop]);
    the reference repacks [stop]+visited+unvisited every step
    (agent.py:104-147), but attention is permutation-equivariant under masks,
    so a stable order is semantically identical and lets the interactive
    rollout and the scanned training loss share this one compiled graph.
    """

    def apply(mode, batch_dict):
        return model.apply(params, mode, batch_dict, deterministic, rngs=rngs)

    pano_embeds, pano_mask = apply("panorama", {
        "view_img_fts": x.view_img_fts, "loc_fts": x.loc_fts,
        "nav_types": x.nav_types, "view_mask": x.view_mask})

    # project + score the 588 NEW points once; the buffer stores them ready
    # to pool (reference reprojects the whole cloud per step,
    # vilmodel.py:793-807 — redundant; see PointCloudState docstring)
    proj_new, w_new = apply("project_grid", {
        "txt_embeds": txt_embeds, "patch_fts": x.patch_fts,
        "txt_relevance_mask":
            txt_mask if cfg.model.mask_txt_relevance else None})
    point_state = G.append_panorama(
        carry.point_state, x.depth, proj_new, x.pos_xy, cfg.grid, w_new,
        headings=x.heading)
    cells, _, grid_pos_fts = G.egocentric_grid_assignment(
        point_state, x.pos_xy, x.heading, cfg.grid)

    gmap_sum, gmap_cnt = _update_node_embeds(
        carry.gmap_sum, carry.gmap_cnt, pano_embeds.astype(jnp.float32),
        pano_mask, x.cur_node_idx, x.cand_gmap_idx, x.gmap_visited_mask,
        accumulate=cfg.model.frontier_accumulate)
    gmap_img_embeds = gmap_sum / jnp.maximum(gmap_cnt, 1.0)[..., None]
    # slot 0 is the [stop] token: zero embedding (agent.py:127-129)
    gmap_img_embeds = gmap_img_embeds.at[:, 0].set(0.0)

    out = apply("navigation", _nav_inputs(
        cfg, txt_embeds, txt_mask, gmap_img_embeds, x, pano_embeds,
        point_state.features, cells, point_state.weights, grid_pos_fts))

    return NavCarry(point_state, gmap_sum, gmap_cnt), out


def _trajectory_loss_stacked(
    model: GridMMNavigator,
    cfg: GridMMConfig,
    params,
    batch: TrajectoryBatch,
    rng: Optional[jax.Array] = None,
    ml_weight: Optional[float] = None,
):
    """Teacher-forced loss with the point buffer OUT of the scan carry.

    The incremental formulation (below) carries the (B, N, D) point buffer
    through lax.scan; scan's reverse pass then saves the 200+ MB buffer once
    PER STEP (an (S, B, N, D) residual — 3.2 GB at the r2r config) plus
    several whole-buffer layout copies per step, which a device profile
    showed dominating the update (~100-150 ms of 416 ms; PARITY.md).

    Replay knows the whole trajectory up front, so instead:
      * project/score ALL steps' patches in ONE call (bigger matmuls),
      * encode ALL panoramas in ONE batched call,
      * run the (cheap, (B,G,D)-sized) gmap accumulation as its own scan,
      * build ONE shared full-trajectory point buffer
        (geometry.stacked_point_state) — a prefix of which is bit-identical
        to every step's incremental buffer — and step-mask it inside the
        loss scan via egocentric_grid_assignment(num_active=...).
    The big buffer is then a scan CONSTANT: saved once, no per-step copies.
    Teacher-forced semantics are identical (test_train_step equivalence).
    """
    deterministic = rng is None
    rngs = None if deterministic else {"dropout": rng}

    def apply(mode, b, step_rngs=None):
        return model.apply(params, mode, b, deterministic,
                           rngs=step_rngs if step_rngs is not None else rngs)

    x = batch.steps
    s, b = x.target.shape
    ppstep = cfg.grid.points_per_step
    assert s * ppstep <= cfg.shapes.max_points, (
        f"point buffer overflow: {s} steps x {ppstep} points/step exceeds "
        f"max_points={cfg.shapes.max_points}")

    txt_embeds = apply("language",
                       {"txt_ids": batch.txt_ids, "txt_mask": batch.txt_mask})

    # all panoramas in one batched call (S folded into batch)
    def fold(a):
        return a.reshape((s * b,) + a.shape[2:])

    pano_embeds, pano_mask = apply("panorama", {
        "view_img_fts": fold(x.view_img_fts), "loc_fts": fold(x.loc_fts),
        "nav_types": fold(x.nav_types), "view_mask": fold(x.view_mask)},
        step_rngs=rngs)
    pano_embeds = pano_embeds.reshape((s, b) + pano_embeds.shape[1:])
    pano_mask = pano_mask.reshape((s, b) + pano_mask.shape[1:])

    # all projections/relevance in one call; step-major point layout
    patch_all = x.patch_fts.transpose(1, 0, 2, 3).reshape(
        b, s * ppstep, x.patch_fts.shape[-1])
    proj_all, w_all = apply("project_grid", {
        "txt_embeds": txt_embeds, "patch_fts": patch_all,
        "txt_relevance_mask":
            batch.txt_mask if cfg.model.mask_txt_relevance else None})
    stacked = G.stacked_point_state(x.depth, proj_all, w_all, x.pos_xy,
                                    x.heading, cfg.grid)

    # gmap node-embedding accumulation: tiny (B, G, D) scan
    def gmap_step(carry, xs):
        gsum, gcnt = carry
        pano_t, mask_t, cur_t, cand_t, vis_t = xs
        gsum, gcnt = _update_node_embeds(
            gsum, gcnt, pano_t.astype(jnp.float32), mask_t, cur_t, cand_t,
            vis_t, accumulate=cfg.model.frontier_accumulate)
        emb = gsum / jnp.maximum(gcnt, 1.0)[..., None]
        emb = emb.at[:, 0].set(0.0)  # slot 0 = [stop] (agent.py:127-129)
        return (gsum, gcnt), emb

    g = x.gmap_mask.shape[-1]
    _, gmap_embeds_all = jax.lax.scan(
        gmap_step,
        (jnp.zeros((b, g, cfg.model.hidden_size), jnp.float32),
         jnp.zeros((b, g), jnp.float32)),
        (pano_embeds, pano_mask, x.cur_node_idx, x.cand_gmap_idx,
         x.gmap_visited_mask))

    # Per-step navigation scan. NOTE a fully-batched alternative was built
    # and measured SLOWER (272 vs 242 ms/update): pool the grid per step
    # into (S, B, C, D) then run ONE navigation forward over the folded
    # (S*B) batch via the "grid_pool" mode + grid_embeds bypass. These ops
    # are bandwidth-bound, not launch-bound — batching didn't reduce bytes
    # and the folds/tiles added copies. The modes remain for callers that
    # want pre-pooled navigation.
    def nav_step(x_t, gmap_emb_t, pano_t, step_idx):
        step_rngs = None if deterministic else {
            "dropout": jax.random.fold_in(rng, step_idx)}
        cells, _, grid_pos_fts = G.egocentric_grid_assignment(
            stacked, x_t.pos_xy, x_t.heading, cfg.grid,
            num_active=jnp.full((b,), (step_idx + 1) * ppstep))
        out = apply("navigation", _nav_inputs(
            cfg, txt_embeds, batch.txt_mask, gmap_emb_t, x_t, pano_t,
            stacked.features, cells, stacked.weights, grid_pos_fts),
            step_rngs=step_rngs)
        head_logits = _loss_head_logits(cfg, out, x_t)
        step_loss = cross_entropy_ignore(
            head_logits, x_t.target, cfg.train.ignoreid, "sum")
        if getattr(cfg.train, "stop_extra_ce", False):
            # RxR doubles the CE on stop decisions (rxr/agent.py:367-373):
            # restrict targets to the [stop]-labelled examples and add
            step_loss = step_loss + cross_entropy_ignore(
                head_logits,
                jnp.where(x_t.target == 0, 0, cfg.train.ignoreid),
                cfg.train.ignoreid, "sum")
        if out.obj_logits is not None:
            step_loss = step_loss + cross_entropy_ignore(
                out.obj_logits, x_t.obj_target, cfg.train.ignoreid, "sum")
        return step_loss

    if getattr(cfg.train, "remat_steps", True):
        nav_step = jax.checkpoint(
            nav_step, policy=jax.checkpoint_policies.nothing_saveable)

    def step_fn(loss, xs):
        x_t, gmap_emb_t, pano_t, step_idx = xs
        return loss + nav_step(x_t, gmap_emb_t, pano_t, step_idx), None

    total, _ = jax.lax.scan(
        step_fn, jnp.float32(0.0),
        (x, gmap_embeds_all, pano_embeds, jnp.arange(s)))
    return _scale_trajectory_loss(cfg, batch, total, b, ml_weight)


def trajectory_loss(
    model: GridMMNavigator,
    cfg: GridMMConfig,
    params,
    batch: TrajectoryBatch,
    rng: Optional[jax.Array] = None,
    ml_weight: Optional[float] = None,
):
    """Teacher-forced loss over a full episode, all on device.

    cfg.train.stacked_replay=True (default) uses the carry-free stacked
    formulation (_trajectory_loss_stacked); False keeps the incremental
    point-buffer scan (the same graph the interactive rollout uses)."""
    if getattr(cfg.train, "stacked_replay", True):
        return _trajectory_loss_stacked(model, cfg, params, batch, rng,
                                        ml_weight)
    deterministic = rng is None
    rngs = None if deterministic else {"dropout": rng}

    def apply(mode, b):
        return model.apply(params, mode, b, deterministic, rngs=rngs)

    txt_embeds = apply("language",
                       {"txt_ids": batch.txt_ids, "txt_mask": batch.txt_mask})

    s, b = batch.steps.target.shape

    # rematerialize per-step activations inside the scan: trades FLOPs for
    # memory so long episodes / big batches fit HBM (jax.checkpoint)
    device_step = nav_device_step
    if getattr(cfg.train, "remat_steps", True):
        device_step = jax.checkpoint(
            nav_device_step, static_argnums=(0, 1, 7),
            policy=jax.checkpoint_policies.nothing_saveable)

    def step_fn(carry_loss, xs):
        x, step_idx = xs
        carry, loss = carry_loss
        # fresh dropout mask per timestep (the reference draws i.i.d. masks;
        # reusing one key would correlate dropout across the whole episode)
        step_rngs = None if deterministic else {
            "dropout": jax.random.fold_in(rng, step_idx)}
        carry, out = device_step(
            model, cfg, params, txt_embeds, batch.txt_mask, carry, x,
            deterministic, step_rngs)
        head_logits = _loss_head_logits(cfg, out, x)
        step_loss = cross_entropy_ignore(
            head_logits, x.target, cfg.train.ignoreid, "sum")
        if getattr(cfg.train, "stop_extra_ce", False):
            # RxR doubles the CE on stop decisions (rxr/agent.py:367-373)
            step_loss = step_loss + cross_entropy_ignore(
                head_logits,
                jnp.where(x.target == 0, 0, cfg.train.ignoreid),
                cfg.train.ignoreid, "sum")
        if out.obj_logits is not None:
            # object-grounding CE (REVERIE agent_obj.py og_loss)
            step_loss = step_loss + cross_entropy_ignore(
                out.obj_logits, x.obj_target, cfg.train.ignoreid, "sum")
        return (carry, loss + step_loss), None

    g = batch.steps.gmap_mask.shape[-1]
    ppstep = cfg.grid.points_per_step
    assert s * ppstep <= cfg.shapes.max_points, (
        f"point buffer overflow: {s} steps x {ppstep} points/step exceeds "
        f"max_points={cfg.shapes.max_points}; raise NavigatorShapes.max_points")
    (_, total), _ = jax.lax.scan(
        step_fn, (init_carry(cfg, b, g), jnp.float32(0.0)),
        (batch.steps, jnp.arange(s)))
    return _scale_trajectory_loss(cfg, batch, total, b, ml_weight)


def _scale_trajectory_loss(cfg, batch, total, b, ml_weight):
    """Discrete fine-tune scales by ml_weight / batch_size (agent.py:447;
    the DAgger student-sampled pass uses weight 1.0, agent_base.py:164-196).
    VLN-CE instead divides by the TOTAL ACTION COUNT — il_loss = ml_loss /
    total_weight, where total_weight accumulates the still-active env count
    each step (ss_trainer_GridMap.py:284,493) == the number of non-ignored
    targets — with no ml_weight factor (cfg.train.loss_norm='actions')."""
    if getattr(cfg.train, "loss_norm", "batch") == "actions":
        denom = jnp.maximum(
            jnp.sum(batch.steps.target != cfg.train.ignoreid), 1)
        return total / denom
    w = cfg.train.ml_weight if ml_weight is None else ml_weight
    return total * w / b


def make_train_step(model: GridMMNavigator, cfg: GridMMConfig, tx=None):
    tx = tx or make_optimizer(cfg)

    def train_step(state: TrainState, batch: TrajectoryBatch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(
            lambda p: trajectory_loss(model, cfg, p, batch, rng))(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_dagger_step(model: GridMMNavigator, cfg: GridMMConfig, tx=None):
    """Reference DAgger gradient shape (agent_base.py:164-196): per iteration
    the teacher-forced loss (weight ml_weight) and the student-sampled-replay
    loss (weight 1.0) are SUMMED into one optimizer step — not alternated."""
    tx = tx or make_optimizer(cfg)

    def train_step(state: TrainState, teacher_batch: TrajectoryBatch,
                   sample_batch: TrajectoryBatch, rng):
        rng = jax.random.fold_in(rng, state.step)
        r_t, r_s = jax.random.split(rng)

        def total(p):
            lt = trajectory_loss(model, cfg, p, teacher_batch, r_t)
            ls = trajectory_loss(model, cfg, p, sample_batch, r_s,
                                 ml_weight=1.0)
            return lt + ls, (lt, ls)

        (loss, (lt, ls)), grads = jax.value_and_grad(
            total, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "loss_teacher": lt,
            "loss_sample": ls,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
