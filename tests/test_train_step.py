"""End-to-end training-step tests on the tiny config (CPU, 8 virtual devices)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from __graft_entry__ import _tiny_config, dryrun_multichip  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.train.step import (create_train_state, make_train_step,  # noqa: E402
                                   trajectory_loss)
from gridmm_tpu.train.synthetic import synthetic_trajectory_batch  # noqa: E402


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


def test_loss_decreases_under_training():
    import dataclasses
    cfg = _tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, lr=2e-4))
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


def test_dryrun_multichip_8():
    dryrun_multichip(8)
