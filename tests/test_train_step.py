"""End-to-end training-step tests on the tiny config (CPU, 8 virtual devices)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from __graft_entry__ import dryrun_multichip  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.train.step import (create_train_state, make_train_step,  # noqa: E402
                                   trajectory_loss)
from gridmm_tpu.train.synthetic import synthetic_trajectory_batch  # noqa: E402


def _tiny_config(max_points: int = 1176):
    from gridmm_tpu.config import (GridConfig, GridMMConfig, MeshConfig,
                                   ModelConfig, NavigatorShapes, TrainConfig)

    model = ModelConfig(
        vocab_size=512, hidden_size=128, num_attention_heads=4,
        intermediate_size=256, num_l_layers=2, num_x_layers=2,
        num_pano_layers=1, image_feat_size=128, max_position_embeddings=128)
    grid = GridConfig(feature_dim=128, max_steps=2)
    shapes = NavigatorShapes(
        max_txt_len=16, max_gmap_len=8, max_vp_len=12, max_points=max_points)
    return GridMMConfig(model=model, grid=grid, shapes=shapes,
                        mesh=MeshConfig(), train=TrainConfig(batch_size=8))


@pytest.mark.slow
def test_gradients_finite():
    cfg = _tiny_config()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    batch = synthetic_trajectory_batch(cfg, batch=2, num_steps=2)
    loss, grads = jax.value_and_grad(
        lambda p: trajectory_loss(model, cfg, p, batch))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # loss must actually depend on params almost everywhere
    nonzero = sum(bool(jnp.any(g != 0)) for g in leaves)
    assert nonzero > len(leaves) * 0.8


@pytest.mark.slow
def test_bf16_train_step_gradients_finite():
    """--bf16 path: bf16 activations, f32 params/grads, finite + nonzero."""
    import dataclasses
    cfg = _tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    batch = synthetic_trajectory_batch(cfg, batch=2, num_steps=2)
    loss, grads = jax.value_and_grad(
        lambda p: trajectory_loss(model, cfg, p, batch))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(g.dtype == jnp.float32 for g in leaves)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert sum(bool(jnp.any(g != 0)) for g in leaves) > len(leaves) * 0.8


def test_loss_decreases_under_training():
    # learning-signal check only: the smallest model that still descends.
    # Width/depth don't change the train-step code path (the _tiny_config
    # dims are covered by the grad tests above); they only inflate the XLA
    # compile, which dominates this test's wall clock on one core.
    import dataclasses
    cfg = _tiny_config(max_points=2 * 588)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, hidden_size=64, num_attention_heads=2,
            intermediate_size=128, num_l_layers=1, num_x_layers=1,
            image_feat_size=64),
        grid=dataclasses.replace(cfg.grid, feature_dim=64),
        train=dataclasses.replace(cfg.train, lr=2e-4))
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    state = create_train_state(cfg, params)
    batch = synthetic_trajectory_batch(cfg, batch=4, num_steps=2)
    step = jax.jit(make_train_step(model, cfg))
    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("stacked", [True, False])
def test_loss_norm_actions_scaling(stacked):
    """loss_norm='actions' (the CE presets) divides the summed episode CE by
    the count of non-ignored targets — il_loss = ml_loss / total_weight,
    where total_weight accumulates the active env count per step
    (ss_trainer_GridMap.py:284,493) — with NO ml_weight factor, while the
    discrete default scales by ml_weight/batch (agent.py:447). Holds
    identically on the stacked and incremental replay paths."""
    import dataclasses

    cfg = _tiny_config(max_points=2 * 588)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, hidden_size=64, num_attention_heads=2,
            intermediate_size=128, num_l_layers=1, num_x_layers=1,
            image_feat_size=64),
        grid=dataclasses.replace(cfg.grid, feature_dim=64))
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    batch = synthetic_trajectory_batch(cfg, batch=2, num_steps=2)
    # the synthetic episode ends every env after step 0; supervise one env's
    # step-1 [stop] so the action count differs from both S*B and B
    tgt = np.asarray(batch.steps.target).copy()
    tgt[1, 0] = 0
    batch = batch._replace(steps=batch.steps._replace(target=jnp.asarray(tgt)))
    n_actions = int(np.sum(tgt != cfg.train.ignoreid))
    # the denominator must differ from both S*B and B for the test to
    # distinguish the three scalings
    assert 0 < n_actions < tgt.size and n_actions != tgt.shape[1]

    cfg_b = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, stacked_replay=stacked, loss_norm="batch"))
    cfg_a = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, stacked_replay=stacked, loss_norm="actions"))
    l_batch = float(trajectory_loss(model, cfg_b, params, batch))
    l_actions = float(trajectory_loss(model, cfg_a, params, batch))
    b = tgt.shape[1]
    total = l_batch * b / cfg.train.ml_weight  # undo the discrete scaling
    assert np.isclose(l_actions, total / n_actions, rtol=1e-5)


def test_relevance_max_over_padded_text_by_default():
    """The device step's instruction-relevance max runs over PADDED text by
    default — the reference applies no mask before .max (vilmodel.py:793-798)
    and released checkpoints were trained under that function; the opt-in
    mask_txt_relevance=True must exclude pad rows. Observable through the
    point buffer's cached relevance logits."""
    import dataclasses

    from gridmm_tpu.train.step import init_carry, nav_device_step

    cfg = _tiny_config(max_points=2 * 588)
    cfg = dataclasses.replace(
        cfg, grid=dataclasses.replace(cfg.grid, max_steps=2))
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    batch = synthetic_trajectory_batch(cfg, batch=2, num_steps=1)
    x = jax.tree_util.tree_map(lambda a: a[0], batch.steps)

    txt_mask = np.zeros((2, cfg.shapes.max_txt_len), bool)
    txt_mask[:, :4] = True  # positions 4+ are padding
    # a dominating PAD-position row: included -> it wins every point's max
    txt = np.random.default_rng(0).standard_normal(
        (2, cfg.shapes.max_txt_len, cfg.model.hidden_size)).astype(np.float32)
    txt[:, 5, :] = 50.0
    txt, txt_mask = jnp.asarray(txt), jnp.asarray(txt_mask)

    def weights_for(model_cfg):
        m = GridMMNavigator(model_cfg)
        carry, _ = nav_device_step(m, dataclasses.replace(cfg, model=model_cfg),
                                   params, txt, txt_mask,
                                   init_carry(cfg, 2), x)
        w = np.asarray(carry.point_state.weights[:, :cfg.grid.points_per_step])
        return m, w

    _, w_ref = weights_for(cfg.model)
    m, w_masked = weights_for(
        dataclasses.replace(cfg.model, mask_txt_relevance=True))

    # oracle: scores over ALL text rows (reference) vs real rows only
    tp = params["params"]["text_proj"]
    proj = txt.astype(jnp.float32) @ tp["kernel"] + tp["bias"]
    scores = np.asarray(jnp.einsum(
        "bnd,btd->bnt", x.patch_fts.astype(jnp.float32), proj))
    np.testing.assert_allclose(w_ref, scores.max(-1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        w_masked,
        np.where(np.asarray(txt_mask)[:, None, :], scores, -np.inf).max(-1),
        rtol=1e-4, atol=1e-4)
    # and the dominating pad row makes the two semantics actually differ
    assert (w_ref > w_masked + 1.0).any()


@pytest.mark.slow
def test_dryrun_multichip_8():
    # the driver gate must never depend on the compile cache (CLAUDE.md) —
    # exercise it cache-free even though conftest enables the cache
    # suite-wide, so a cold-compile-time regression of the gate graph can't
    # hide behind warm ~/.cache entries
    import time

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    t0 = time.monotonic()
    try:
        dryrun_multichip(8)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
    wall = time.monotonic() - t0
    # guard the driver gate budget: the round-3 driver timed the gate out at
    # >=10 min; CLAUDE.md budgets the cold dryrun at <~5 min on this box
    # (measured ~2m26s +-40% CPU-steal swing). Failing here means an XLA
    # upgrade or an added layer re-breached the budget — trim the gate graph
    # before the driver discovers it the hard way.
    assert wall < 300, (
        f"cold dryrun_multichip(8) took {wall:.0f}s — over the ~5 min driver "
        "budget (CLAUDE.md); shrink the gate graph or cut flagship depth")


def test_prepare_train_step_single_executable():
    """prepare_train_step pins output-state shardings to the inputs' so every
    call after the first reuses ONE executable. Without the pin, GSPMD
    re-shards some replicated leaves (e.g. biases of TP-sharded projections)
    on the way out and the second call silently recompiles — measured +95s
    per run on the 8-device 1-core virtual mesh."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gridmm_tpu.config import MeshConfig
    from gridmm_tpu.parallel.mesh import make_mesh, prepare_train_step
    from gridmm_tpu.train.step import TrainState

    # the _cache_size()==1 invariant is about THIS function's executables;
    # start from a clean jit cache so state left by earlier tests in a full
    # -m "" run (observed once: a spurious second executable after ~40 min
    # of suite history) cannot alias into the count
    jax.clear_caches()
    mesh = make_mesh(MeshConfig(mp_size=2), jax.devices())
    params = {
        "kernel": jax.device_put(jnp.ones((8, 8)),
                                 NamedSharding(mesh, P(None, "model"))),
        "bias": jax.device_put(jnp.zeros((8,)), NamedSharding(mesh, P())),
    }
    tx = optax.adam(1e-2)
    # fresh scalars intentionally uncommitted (like create_train_state)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def step(state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum((batch @ p["kernel"] + p["bias"]) ** 2)
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, opt_state, state.step + 1), {
            "loss": loss}

    jitted, state = prepare_train_step(step, state, mesh)
    # commit_state committed every leaf to the mesh
    for leaf in jax.tree_util.tree_leaves(state):
        assert isinstance(leaf.sharding, NamedSharding)
    batch = jax.device_put(jnp.ones((4, 8)),
                           NamedSharding(mesh, P("data", None)))
    state, m1 = jitted(state, batch)
    state, m2 = jitted(state, batch)
    state, m3 = jitted(state, batch)
    assert jitted._cache_size() == 1, jitted._cache_size()
    assert float(m3["loss"]) < float(m1["loss"])
    assert int(state.step) == 3


@pytest.mark.slow
def test_dagger_step_sums_losses():
    """make_dagger_step = one update over teacher(ml_weight) + sample(1.0)
    losses (reference agent_base.py:164-196 gradient shape)."""
    import dataclasses

    from gridmm_tpu.train.step import make_dagger_step, trajectory_loss

    cfg = _tiny_config()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    state = create_train_state(cfg, params)
    tb = synthetic_trajectory_batch(cfg, batch=2, num_steps=2, seed=0)
    sb = synthetic_trajectory_batch(cfg, batch=2, num_steps=2, seed=1)
    step = jax.jit(make_dagger_step(model, cfg))
    rng = jax.random.PRNGKey(3)
    new_state, metrics = step(state, tb, sb, rng)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(
        float(metrics["loss"]),
        float(metrics["loss_teacher"]) + float(metrics["loss_sample"]),
        rtol=1e-5)
    # sample pass uses weight 1.0 vs teacher's ml_weight: for identical
    # batches+rng the deterministic losses differ by exactly that ratio
    lt = float(trajectory_loss(model, cfg, params, tb))
    ls = float(trajectory_loss(model, cfg, params, tb, ml_weight=1.0))
    np.testing.assert_allclose(ls * cfg.train.ml_weight, lt, rtol=1e-5)
    assert int(new_state.step) == 1


def test_decay_mask_excludes_bias_and_layernorm():
    from gridmm_tpu.train.optimizers import decay_mask

    cfg = _tiny_config()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    mask = decay_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    n_decay = n_skip = 0
    for path, decays in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if p.endswith("bias") or "/ln/" in p:
            assert not decays, p
            n_skip += 1
        elif p.endswith("kernel") or p.endswith("embedding"):
            assert decays, p
            n_decay += 1
    assert n_decay > 10 and n_skip > 10


@pytest.mark.slow
def test_stacked_replay_matches_incremental():
    """The carry-free stacked replay loss is numerically equivalent to the
    incremental point-buffer scan (deterministic; gradients too)."""
    import dataclasses

    cfg = _tiny_config()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    batch = synthetic_trajectory_batch(cfg, batch=2, num_steps=2)

    cfg_inc = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, stacked_replay=False))
    cfg_stk = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, stacked_replay=True))

    l_inc, g_inc = jax.value_and_grad(
        lambda p: trajectory_loss(model, cfg_inc, p, batch))(params)
    l_stk, g_stk = jax.value_and_grad(
        lambda p: trajectory_loss(model, cfg_stk, p, batch))(params)
    np.testing.assert_allclose(float(l_stk), float(l_inc), rtol=1e-5)
    flat_i = jax.tree_util.tree_leaves(g_inc)
    flat_s = jax.tree_util.tree_leaves(g_stk)
    for a, b in zip(flat_i, flat_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_rxr_stop_extra_ce_doubles_stop_steps():
    """RxR adds a second CE over stop-labelled examples (rxr/agent.py:367-373)
    — when every valid target IS [stop], the flag exactly doubles the loss;
    checked on both replay formulations."""
    import dataclasses

    cfg = _tiny_config()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    batch = synthetic_trajectory_batch(cfg, batch=2, num_steps=2)
    # all teacher actions = [stop] (slot 0 is always a valid gmap slot)
    batch = batch._replace(steps=batch.steps._replace(
        target=np.zeros_like(np.asarray(batch.steps.target)),
        obj_target=np.full_like(np.asarray(batch.steps.obj_target),
                                cfg.train.ignoreid)))
    for stacked in (True, False):
        cfg_off = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, stacked_replay=stacked, stop_extra_ce=False))
        cfg_on = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, stacked_replay=stacked, stop_extra_ce=True))
        l_off = float(trajectory_loss(model, cfg_off, params, batch))
        l_on = float(trajectory_loss(model, cfg_on, params, batch))
        assert l_off > 0
        np.testing.assert_allclose(l_on, 2 * l_off, rtol=1e-6)

    # mixed targets: the extra term is the stop-subset CE only. The last
    # VALID gmap slot is the always-unvisited finite-logit teacher slot
    # (train/synthetic.py:141-143,164); arbitrary slots could be -inf.
    t = np.asarray(batch.steps.target).copy()
    t[0, :] = np.asarray(batch.steps.gmap_mask[0]).sum(-1) - 1  # navigate
    t[1, :] = 0                                                 # then stop
    batch2 = batch._replace(steps=batch.steps._replace(target=t))
    cfg_off = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, stop_extra_ce=False))
    cfg_on = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, stop_extra_ce=True))
    l_off = float(trajectory_loss(model, cfg_off, params, batch2))
    l_on = float(trajectory_loss(model, cfg_on, params, batch2))
    assert l_off < l_on < 2 * l_off


import pytest


@pytest.mark.parametrize("flavor", ["discrete", "ce"])
def test_stacked_state_prefix_matches_incremental_buffer(flavor):
    """A num_active prefix of stacked_point_state reproduces the incremental
    append chain's assignment bit-for-bit at every step — under both the
    discrete and the continuous grid conventions (heading-relative view
    angles, y-flip, map_x negation)."""
    import dataclasses

    from gridmm_tpu.ops import geometry as G

    cfg = _tiny_config()
    gc = cfg.grid
    if flavor == "ce":
        from gridmm_tpu.config import r2r_ce_config

        ce = r2r_ce_config().grid
        gc = dataclasses.replace(
            gc, view_angles_relative=ce.view_angles_relative,
            y_sign=ce.y_sign, map_x_sign=ce.map_x_sign,
            heading_sign=ce.heading_sign, heading_offset=ce.heading_offset,
            depth_scale=ce.depth_scale, tan_half_hfov=ce.tan_half_hfov)
    rng = np.random.default_rng(0)
    S, B = 3, 2
    ppstep = gc.points_per_step
    depth = jnp.asarray(rng.integers(
        0, 12000, (S, B, gc.num_views, gc.patches_per_view)).astype(
            np.float32))
    feats = jnp.asarray(rng.standard_normal(
        (S, B, ppstep, gc.feature_dim)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((S, B, ppstep)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-3, 3, (S, B, 2)).astype(np.float32))
    heading = jnp.asarray(rng.uniform(-3, 3, (S, B)).astype(np.float32))

    feats_sm = feats.transpose(1, 0, 2, 3).reshape(B, S * ppstep, -1)
    w_sm = w.transpose(1, 0, 2).reshape(B, S * ppstep)
    stacked = G.stacked_point_state(depth, feats_sm, w_sm, pos, heading, gc)

    state = G.PointCloudState.create(B, gc, S * ppstep)
    for t in range(S):
        state = G.append_panorama(state, depth[t], feats[t], pos[t], gc,
                                  w[t], headings=heading[t])
        c_inc, hl_inc, pf_inc = G.egocentric_grid_assignment(
            state, pos[t], heading[t], gc)
        c_stk, hl_stk, pf_stk = G.egocentric_grid_assignment(
            stacked, pos[t], heading[t], gc,
            num_active=jnp.full((B,), (t + 1) * ppstep))
        np.testing.assert_array_equal(np.asarray(c_stk), np.asarray(c_inc))
        np.testing.assert_allclose(np.asarray(hl_stk), np.asarray(hl_inc),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pf_stk), np.asarray(pf_inc),
                                   rtol=1e-6)


def test_grid_pool_mode_and_prepooled_navigation():
    """The 'grid_pool' mode + grid_embeds bypass reproduce the in-forward
    pooling path exactly (kept for pre-pooled callers)."""
    from gridmm_tpu.models.navigator import dummy_batches

    cfg = _tiny_config()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    txt_ids, txt_mask, pano_b, nav_b = dummy_batches(cfg.shapes, cfg.model,
                                                     batch=2)
    nav_b = dict(nav_b)
    n = cfg.shapes.max_points
    nav_b["grid_fts"] = jnp.asarray(
        rng.standard_normal((2, n, cfg.model.hidden_size)).astype(np.float32))
    nav_b["grid_cells"] = jnp.asarray(
        rng.integers(-1, cfg.shapes.num_cells, (2, n)).astype(np.int32))
    nav_b["grid_weights"] = jnp.asarray(
        rng.standard_normal((2, n)).astype(np.float32))
    txt = model.apply(params, "language",
                      {"txt_ids": txt_ids, "txt_mask": txt_mask})
    out0 = model.apply(params, "navigation",
                       dict(nav_b, txt_embeds=txt, txt_mask=txt_mask))

    ge, cm = model.apply(params, "grid_pool", {
        "proj_fts": nav_b["grid_fts"], "weights": nav_b["grid_weights"],
        "grid_cells": nav_b["grid_cells"],
        "gridmap_pos_fts": nav_b["gridmap_pos_fts"]})
    nav_b2 = {k: v for k, v in nav_b.items()
              if k not in ("grid_fts", "grid_cells", "grid_weights")}
    out1 = model.apply(params, "navigation",
                       dict(nav_b2, txt_embeds=txt, txt_mask=txt_mask,
                            grid_embeds=ge, cell_mask=cm))
    np.testing.assert_allclose(np.asarray(out1.fused_logits),
                               np.asarray(out0.fused_logits), atol=1e-5)
