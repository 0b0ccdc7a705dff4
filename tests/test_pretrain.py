"""Pretraining model + proxy-task tests (tiny config)."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_agent_e2e import tiny_cfg  # noqa: E402

from gridmm_tpu.models.pretrain import GridMMPretrain  # noqa: E402
from gridmm_tpu.train.pretrain import (TaskMultiplexer, init_pretrain_params,  # noqa: E402
                                       make_pretrain_step, task_loss)
from gridmm_tpu.train.step import create_train_state  # noqa: E402
from gridmm_tpu.train.synthetic import synthetic_pretrain_batch  # noqa: E402


def setup_all():
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
