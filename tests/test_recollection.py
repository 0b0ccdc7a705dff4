"""Recollection store: record -> persist -> offline training."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_agent_e2e import build_all  # noqa: E402

from gridmm_tpu.train.recollection import (RecollectionStore,  # noqa: E402
                                           load_trajectory_batch,
                                           save_trajectory_batch)
from gridmm_tpu.train.step import create_train_state, make_train_step  # noqa: E402


@pytest.mark.slow
def test_record_and_train_offline(tmp_path):
    cfg, env, model, params, agent = build_all()
    store = RecollectionStore(str(tmp_path / "recollect"))
    n = store.record(agent, num_batches=2)
    assert n == 2 and len(store) == 2

    # round-trip fidelity
    _, live, _ = agent.rollout(feedback="teacher", record=True)
    p = tmp_path / "x.npz"
    save_trajectory_batch(str(p), live)
    back = load_trajectory_batch(str(p))
    np.testing.assert_array_equal(np.asarray(live.steps.target),
                                  back.steps.target)
    np.testing.assert_array_equal(np.asarray(live.txt_ids), back.txt_ids)

    # offline training from disk only (no env)
    state = create_train_state(cfg, params)
    step = jax.jit(make_train_step(model, cfg))
    rng = jax.random.PRNGKey(0)
    losses = []
    for batch in store.batches(epochs=2):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert len(losses) == 4 and all(np.isfinite(l) for l in losses)


def test_pad_to_steps_loss_neutral():
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.train.recollection import pad_to_steps
    from gridmm_tpu.train.step import trajectory_loss
    from gridmm_tpu.train.synthetic import synthetic_trajectory_batch
    from tests.test_agent_e2e import tiny_cfg

    cfg = tiny_cfg()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    batch = synthetic_trajectory_batch(cfg, batch=2, num_steps=2)
    padded = pad_to_steps(batch, 4)
    assert padded.steps.target.shape[0] == 4
    l0 = float(trajectory_loss(model, cfg, params, batch))
    l1 = float(trajectory_loss(model, cfg, params, padded))
    assert abs(l0 - l1) < 1e-4, (l0, l1)


def test_device_prefetch_pipeline():
    """Offline training through the async prefetch wrapper."""
    from gridmm_tpu.train.prefetch import device_prefetch
    from gridmm_tpu.train.synthetic import synthetic_trajectory_batch
    from tests.test_agent_e2e import tiny_cfg

    cfg = tiny_cfg()
    host_batches = [synthetic_trajectory_batch(cfg, 2, 2, seed=i)
                    for i in range(3)]
    seen = list(device_prefetch(iter(host_batches), size=2))
    assert len(seen) == 3
    for hb, db in zip(host_batches, seen):
        np.testing.assert_array_equal(np.asarray(hb.txt_ids),
                                      np.asarray(db.txt_ids))

    # producer errors must surface, not hang
    def boom():
        yield host_batches[0]
        raise RuntimeError("producer failed")

    it = device_prefetch(boom(), size=1)
    next(it)
    import pytest
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_pad_to_steps_device_fields_stay_on_device():
    """Device-resident fields (the CE trainer's recorded CLIP patch tokens)
    pad via jnp without a host round trip, matching the numpy path."""
    import jax.numpy as jnp
    import numpy as np

    from gridmm_tpu.train.recollection import pad_to_steps
    from gridmm_tpu.train.synthetic import synthetic_trajectory_batch
    from tests.test_agent_e2e import tiny_cfg

    cfg = tiny_cfg()
    batch = synthetic_trajectory_batch(cfg, batch=2, num_steps=2)
    dev = batch._replace(steps=batch.steps._replace(
        patch_fts=jnp.asarray(batch.steps.patch_fts),
        target=jnp.asarray(batch.steps.target)))
    p_np = pad_to_steps(batch, 4)
    p_dev = pad_to_steps(dev, 4)
    assert isinstance(p_dev.steps.patch_fts, jax.Array)
    np.testing.assert_array_equal(np.asarray(p_dev.steps.patch_fts),
                                  np.asarray(p_np.steps.patch_fts))
    # ignore-id backfill works through the .at[] path too
    np.testing.assert_array_equal(np.asarray(p_dev.steps.target),
                                  np.asarray(p_np.steps.target))
