"""ZeRO-3-style parameter sharding over the data axis (fsdp=True)."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_agent_e2e import tiny_cfg  # noqa: E402

from gridmm_tpu.config import MeshConfig  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.parallel.mesh import (make_mesh, param_shardings,  # noqa: E402
                                      trajectory_batch_shardings)
from gridmm_tpu.train.step import create_train_state, make_train_step  # noqa: E402
from gridmm_tpu.train.synthetic import synthetic_trajectory_batch  # noqa: E402


def test_fsdp_train_step():
    cfg = tiny_cfg()
    mesh = make_mesh(MeshConfig(mp_size=2), jax.devices())
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    params = jax.device_put(params, param_shardings(params, mesh, fsdp=True))

    leaves = jax.tree_util.tree_leaves_with_path(params)
    sharded = [p for p, v in leaves if "data" in str(v.sharding.spec)]
    assert len(sharded) > 40  # weights genuinely partitioned over data

    state = create_train_state(cfg, params)
    batch = synthetic_trajectory_batch(cfg, batch=8, num_steps=2)
    batch = jax.device_put(batch, trajectory_batch_shardings(batch, mesh))
    step = jax.jit(make_train_step(model, cfg))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["grad_norm"]))
