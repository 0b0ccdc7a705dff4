"""Pretraining model + proxy-task tests (tiny config)."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_agent_e2e import tiny_cfg  # noqa: E402

from gridmm_tpu.models.pretrain import GridMMPretrain  # noqa: E402
from gridmm_tpu.train.pretrain import (TaskMultiplexer, init_pretrain_params,  # noqa: E402
                                       make_pretrain_step, task_loss)
from gridmm_tpu.train.step import create_train_state  # noqa: E402
from gridmm_tpu.train.synthetic import synthetic_pretrain_batch  # noqa: E402


import functools


@functools.lru_cache(maxsize=1)
def setup_all():
    # memoized: jax arrays are immutable and every caller treats the params
    # as a read-only template, so one init serves the whole module
    import dataclasses
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, image_prob_size=32))
    model = GridMMPretrain(cfg.model)
    batch = synthetic_pretrain_batch(cfg, batch=2, num_steps=3)
    params = init_pretrain_params(model, cfg, jax.random.PRNGKey(0), batch)
    return cfg, model, batch, params


def test_all_task_losses_finite():
    cfg, model, batch, params = setup_all()
    for task in ("mlm", "mrc", "sap"):
        loss = float(task_loss(model, params, batch, task))
        assert np.isfinite(loss), (task, loss)
        assert loss > 0, (task, loss)


def test_mlm_tied_embeddings():
    """The MLM decoder must share the word-embedding matrix (pretrain_cmt.py:68-71):
    perturbing the embedding table must change MLM logits through BOTH paths."""
    cfg, model, batch, params = setup_all()
    import jax.numpy as jnp
    from gridmm_tpu.train.pretrain import _enc_kwargs

    logits1 = model.apply(params, batch.txt_ids, batch.txt_mask,
                          _enc_kwargs(batch),
                          method=GridMMPretrain.forward_mlm_logits)
    assert logits1.shape == (2, cfg.shapes.max_txt_len, cfg.model.vocab_size)
    # no separate decoder kernel of shape (hidden, vocab) may exist
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "mlm_head" in name:
            assert leaf.shape != (cfg.model.hidden_size, cfg.model.vocab_size), name


def test_pretrain_step_decreases_loss():
    import dataclasses
    cfg, model, batch, params = setup_all()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, lr=3e-4))
    state = create_train_state(cfg, params)
    step = make_pretrain_step(model, cfg, "sap")
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss_sap"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_task_multiplexer_deterministic():
    m1 = list(zip(range(50), TaskMultiplexer(["mlm", "mrc", "sap"], [1, 1, 1],
                                             seed=7)))
    m2 = list(zip(range(50), TaskMultiplexer(["mlm", "mrc", "sap"], [1, 1, 1],
                                             seed=7)))
    assert m1 == m2
    tasks = [t for _, t in m1]
    assert set(tasks) == {"mlm", "mrc", "sap"}


def test_task_multiplexer_accum_holds_task():
    """accum_steps > 1 holds each sampled task for the whole window
    (loader.py:54-59: task re-sampled only when step % accum == 0)."""
    mux = iter(TaskMultiplexer(["mlm", "mrc", "sap"], [1, 1, 1], seed=3,
                               accum_steps=3))
    seq = [next(mux) for _ in range(30)]
    for w in range(0, 30, 3):
        assert len(set(seq[w:w + 3])) == 1, seq
    assert len(set(seq)) > 1  # still multiplexes across windows


@pytest.mark.slow
def test_accum_step_matches_single_step_scaling():
    """A k-window of identical microbatches must produce the SAME update as
    one plain step on that batch (grads averaged, not summed; one optimizer
    step per window). Dropout zeroed so rngs are irrelevant."""
    import dataclasses

    from gridmm_tpu.train.pretrain import make_pretrain_accum_step

    cfg, model, batch, params = setup_all()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, feat_dropout=0.0))
    model = GridMMPretrain(cfg.model)
    state0 = create_train_state(cfg, params)
    rng = jax.random.PRNGKey(5)

    plain = make_pretrain_step(model, cfg, "sap")
    s1, m1 = plain(state0, batch, rng)

    accum = make_pretrain_accum_step(model, cfg, "sap", accum=2)
    stacked = jax.tree_util.tree_map(lambda x: np.stack([x, x]), batch)
    s2, m2 = accum(state0, stacked, rng)

    np.testing.assert_allclose(float(m1["loss_sap"]), float(m2["loss_sap"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-5),
        s1.params, s2.params)
    assert int(s2.step) == 1  # one optimizer step per window


def test_accum_step_averages_distinct_microbatches():
    """With dropout off, accum over two DIFFERENT microbatches applies the
    mean of their grads: the update direction must differ from either
    microbatch's own step but the loss reported is the window mean."""
    import dataclasses

    from gridmm_tpu.train.pretrain import make_pretrain_accum_step, task_loss

    cfg, model, batch, params = setup_all()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, feat_dropout=0.0))
    model = GridMMPretrain(cfg.model)
    b2 = synthetic_pretrain_batch(cfg, batch=2, num_steps=3, seed=9)
    state0 = create_train_state(cfg, params)
    rng = jax.random.PRNGKey(7)

    accum = make_pretrain_accum_step(model, cfg, "sap", accum=2)
    stacked = jax.tree_util.tree_map(
        lambda a, b: np.stack([a, b]), batch, b2)
    _, m = accum(state0, stacked, rng)
    l1 = float(task_loss(model, state0.params, batch, "sap",
                         jax.random.fold_in(jax.random.fold_in(rng, 0), 0)))
    l2 = float(task_loss(model, state0.params, b2, "sap",
                         jax.random.fold_in(jax.random.fold_in(rng, 0), 1)))
    np.testing.assert_allclose(float(m["loss_sap"]), (l1 + l2) / 2, rtol=1e-5)


def test_validate_batch_count_invariant():
    """validate() accumulates counts, so chunking the val set into different
    batch sizes must not change any metric."""
    from gridmm_tpu.cli.pretrain import validate

    cfg, model, _, params = setup_all()
    full = synthetic_pretrain_batch(cfg, batch=4, num_steps=3, seed=11)
    halves = [jax.tree_util.tree_map(lambda x: x[:2], full),
              jax.tree_util.tree_map(lambda x: x[2:], full)]
    for task in ("mlm", "mrc", "sap"):
        a = validate(model, params, {task: [full]})
        b = validate(model, params, {task: halves})
        for k in a:
            np.testing.assert_allclose(a[k], b[k], atol=1e-12,
                                       err_msg=f"{task}/{k}")


@pytest.mark.slow
def test_pretrain_cli_mesh(tmp_path):
    """--mesh auto shards the pretrain update over the 8-device CPU mesh:
    batch over `data`, params by the TP rules (mp=2), accum window stacked
    at P(None, 'data') — the reference's 3-GPU DDP pretrain
    (pretrain_src/train_r2r.py:70-110) as one SPMD program."""
    from gridmm_tpu.cli.pretrain import main as pretrain_main

    state = pretrain_main([
        "--steps", "2", "--valid_every", "2", "--batch_size", "8",
        "--num_traj_steps", "2", "--accum_steps", "2",
        "--mesh", "auto", "--mp_size", "2",
        "--output_dir", str(tmp_path)])
    assert int(state.step) == 2
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    ffn = [(p, l) for p, l in flat
           if "intermediate_dense" in "/".join(
               str(getattr(k, "key", k)) for k in p) and l.ndim == 2]
    assert ffn, "no FFN kernels found"
    path, leaf = ffn[0]
    assert not leaf.sharding.is_fully_replicated, path
    assert len(leaf.sharding.device_set) == 8
    assert np.isfinite(jax.tree_util.tree_leaves(state.params)[0]).all()
