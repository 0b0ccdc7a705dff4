"""Pretraining driver pieces: task batches, jitted task steps, task multiplexer.

Host-side counterpart of pretrain_src/data/{tasks,loader}.py and
train_r2r.py:231-333. The MetaLoader's cross-rank task broadcast
(loader.py:54-59) is replaced by a shared-seed PRNG — every host draws the same
task sequence with no communication (SURVEY.md §2.7)."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gridmm_tpu.config import GridMMConfig
from gridmm_tpu.models.pretrain import GridMMPretrain
from gridmm_tpu.train.losses import mlm_loss, mrc_kl_loss, sap_loss
from gridmm_tpu.train.step import TrainState, make_optimizer


class PretrainBatch(NamedTuple):
    """Trajectory-level inputs shared by all proxy tasks, plus per-task labels
    (zero-filled when unused)."""

    txt_ids: jnp.ndarray         # (B, T)
    txt_mask: jnp.ndarray        # (B, T)
    traj_view_fts: jnp.ndarray   # (B, S, V-1, D_img)
    traj_loc_fts: jnp.ndarray    # (B, S, V-1, A+3)
    traj_nav_types: jnp.ndarray  # (B, S, V-1)
    traj_token_mask: jnp.ndarray  # (B, S, V-1)
    traj_step_mask: jnp.ndarray  # (B, S)
    visited_idx: jnp.ndarray     # (B, S, V-1)
    cand_idx: jnp.ndarray        # (B, S, V-1)
    gmap_step_ids: jnp.ndarray   # (B, G)
    gmap_pos_fts: jnp.ndarray    # (B, G, A+3)
    gmap_mask: jnp.ndarray       # (B, G)
    gmap_visited_mask: jnp.ndarray  # (B, G)
    vp_pos_fts: jnp.ndarray      # (B, V, 2A+6)
    vp_nav_mask: jnp.ndarray     # (B, V)
    fused_add_idx: jnp.ndarray   # (B, G)
    cand_backtrack_mask: jnp.ndarray  # (B, V)
    grid_fts: jnp.ndarray        # (B, N, D_img)
    grid_cells: jnp.ndarray      # (B, N)
    gridmap_pos_fts: jnp.ndarray  # (B, C, 5)
    # task labels
    txt_labels: jnp.ndarray      # (B, T) MLM targets, -1 = not masked
    view_mrc_masks: jnp.ndarray  # (B, V-1) bool
    view_probs: jnp.ndarray      # (B, V-1, image_prob_size) soft labels
    global_act_labels: jnp.ndarray  # (B,)
    local_act_labels: jnp.ndarray   # (B,)
    obj_labels: jnp.ndarray      # (B,)
    vp_obj_mask: jnp.ndarray     # (B, V)


def _enc_kwargs(b: PretrainBatch) -> Dict[str, Any]:
    return dict(
        traj_view_fts=b.traj_view_fts, traj_loc_fts=b.traj_loc_fts,
        traj_nav_types=b.traj_nav_types, traj_token_mask=b.traj_token_mask,
        traj_step_mask=b.traj_step_mask, visited_idx=b.visited_idx,
        cand_idx=b.cand_idx, gmap_step_ids=b.gmap_step_ids,
        gmap_pos_fts=b.gmap_pos_fts, gmap_mask=b.gmap_mask,
        vp_pos_fts=b.vp_pos_fts, grid_fts=b.grid_fts,
        grid_cells=b.grid_cells, gridmap_pos_fts=b.gridmap_pos_fts)


def _mask_mrc_features(batch: PretrainBatch) -> PretrainBatch:
    """Zero the view features selected for MRC on the LAST trajectory step
    (reference _mask_img_feat, pretrain_src/data/tasks.py:195-196)."""
    b, s, vm1, _ = batch.traj_view_fts.shape
    last = jnp.maximum(jnp.sum(batch.traj_step_mask, axis=1) - 1, 0)  # (B,)
    is_last = jnp.arange(s)[None, :] == last[:, None]                 # (B,S)
    kill = is_last[:, :, None] & batch.view_mrc_masks[:, None, :]     # (B,S,V-1)
    fts = jnp.where(kill[..., None], 0.0, batch.traj_view_fts)
    return batch._replace(traj_view_fts=fts)


def task_loss(model: GridMMPretrain, params, batch: PretrainBatch, task: str,
              rng: Optional[jax.Array] = None):
    """Per-task scalar loss (pretrain_cmt.py forward_*)."""
    deterministic = rng is None
    rngs = None if deterministic else {"dropout": rng}

    def run(method, *args, **kw):
        return model.apply(params, *args, method=method, rngs=rngs, **kw)

    if task == "mlm":
        logits = run(GridMMPretrain.forward_mlm_logits,
                     batch.txt_ids, batch.txt_mask, _enc_kwargs(batch),
                     deterministic=deterministic)
        return mlm_loss(logits, batch.txt_labels, ignore_id=-1)

    if task == "mrc":
        # zero the masked regions BEFORE encoding (reference _mask_img_feat,
        # tasks.py:195-196) — otherwise the classifier sees the feature it
        # must label and the objective degenerates to a lookup
        batch = _mask_mrc_features(batch)

    enc = run(GridMMPretrain.encode, batch.txt_ids, batch.txt_mask,
              deterministic=deterministic, **_enc_kwargs(batch))

    if task == "mrc":
        view_logits = run(GridMMPretrain.forward_mrc_logits, enc)
        return mrc_kl_loss(view_logits, batch.view_probs, batch.view_mrc_masks)
    if task == "sap":
        g, l, f, gr = run(
            GridMMPretrain.forward_sap_logits, enc, batch.gmap_mask,
            batch.gmap_visited_mask, batch.vp_nav_mask,
            batch.fused_add_idx, batch.cand_backtrack_mask)
        return jnp.mean(sap_loss(g, l, f, gr, batch.global_act_labels,
                                 batch.local_act_labels))
    if task == "og":
        logits = run(GridMMPretrain.forward_og_logits, enc, batch.vp_obj_mask)
        from gridmm_tpu.train.losses import cross_entropy_ignore
        return cross_entropy_ignore(logits, batch.obj_labels,
                                    ignore_id=-100, reduction="mean")
    raise ValueError(task)


def make_pretrain_step(model: GridMMPretrain, cfg: GridMMConfig, task: str,
                       tx=None, donate: bool = False, out_shardings=None):
    """Jitted update for one task (tasks have different graphs, so one compiled
    step per task — the reference similarly dispatches per task).

    donate=True donates the TrainState so XLA updates params/opt slots in
    place (halves their peak HBM); the caller must not touch the old state
    after the call — the training CLI never does, tests that replay one
    state through several step fns keep the default."""
    tx = tx or make_optimizer(cfg)

    def step(state: TrainState, batch: PretrainBatch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(
            lambda p: task_loss(model, p, batch, task, rng))(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            f"loss_{task}": loss, "grad_norm": optax.global_norm(grads)}

    # out_shardings pins the output state to the input shardings on a mesh so
    # every window after the first reuses the task's one executable
    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   out_shardings=out_shardings)


def make_pretrain_accum_step(model: GridMMPretrain, cfg: GridMMConfig,
                             task: str, tx=None, accum: int = 2,
                             donate: bool = False, out_shardings=None):
    """Jitted update over `accum` stacked microbatches of ONE task.

    Replicates the reference accumulation window (train_r2r.py:251-296): the
    per-microbatch loss is scaled by 1/accum (grads averaged), gradients sum
    across the window, and ONE optimizer step fires per window. Microbatch
    grads are folded in a lax.scan so peak memory stays at one microbatch's
    activations; dropout keys differ per microbatch."""
    tx = tx or make_optimizer(cfg)

    def step(state: TrainState, batches: PretrainBatch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def body(acc, xs):
            i, mb = xs
            loss, grads = jax.value_and_grad(
                lambda p: task_loss(model, p, mb, task,
                                    jax.random.fold_in(rng, i)))(state.params)
            return jax.tree_util.tree_map(jnp.add, acc, grads), loss

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        grads, losses = jax.lax.scan(
            body, zeros, (jnp.arange(accum), batches))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            f"loss_{task}": losses.mean(),
            "grad_norm": optax.global_norm(grads)}

    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   out_shardings=out_shardings)


class TaskMultiplexer:
    """Samples the next task by mix ratio with a shared-seed RNG — replaces the
    reference MetaLoader's dist.broadcast(task_id) (loader.py:54-59).

    accum_steps > 1 holds each sampled task for accum_steps consecutive
    yields, the MetaLoader accumulation-window contract (loader.py:54-59:
    task re-sampled only when step % accum_steps == 0)."""

    def __init__(self, tasks, mix_ratio, seed: int = 0,
                 accum_steps: int = 1):
        self.tasks = list(tasks)
        p = np.asarray(mix_ratio, np.float64)
        self.p = p / p.sum()
        self.accum_steps = int(accum_steps)
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        while True:
            task = self.tasks[self._rng.choice(len(self.tasks), p=self.p)]
            for _ in range(self.accum_steps):
                yield task


def init_pretrain_params(model: GridMMPretrain, cfg: GridMMConfig, rng,
                         batch: PretrainBatch):
    """Materialize params for every task path."""

    def init_all(mdl):  # runs inside module scope via nn.init
        enc = mdl.encode(batch.txt_ids, batch.txt_mask, **_enc_kwargs(batch))
        _ = mdl.forward_mrc_logits(enc)
        _ = mdl.forward_sap_logits(
            enc, batch.gmap_mask, batch.gmap_visited_mask, batch.vp_nav_mask,
            batch.fused_add_idx, batch.cand_backtrack_mask)
        _ = mdl.forward_mlm_logits(batch.txt_ids, batch.txt_mask,
                                   _enc_kwargs(batch))
        if mdl.cfg.obj_feat_size > 0:
            _ = mdl.forward_og_logits(enc, batch.vp_obj_mask)
        return enc

    import flax.linen as nn
    return nn.init(init_all, model)(rng)
