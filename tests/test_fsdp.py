"""ZeRO-3-style parameter sharding over the data axis (fsdp=True)."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_agent_e2e import tiny_cfg  # noqa: E402

from gridmm_tpu.config import MeshConfig  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.parallel.mesh import (make_mesh, param_shardings,  # noqa: E402
                                      trajectory_batch_shardings)
from gridmm_tpu.train.step import create_train_state, make_train_step  # noqa: E402
from gridmm_tpu.train.synthetic import synthetic_trajectory_batch  # noqa: E402


@pytest.mark.slow
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


@pytest.mark.slow
def test_train_navigator_with_mesh():
    """The CLI-facing mesh path: train_navigator(mesh=...) shards params +
    batches over the 8-device mesh and the loop trains (the DDP-equivalent
    of agent_base.py:115-117 reachable from cli/main_nav --mesh auto)."""
    import dataclasses

    import numpy as np

    from gridmm_tpu.config import MeshConfig, tiny_config
    from gridmm_tpu.env.discrete import DiscreteNavEnv, synthetic_episodes
    from gridmm_tpu.env.world import SyntheticWorld
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.parallel.mesh import make_mesh
    from gridmm_tpu.train.agent import NavAgent
    from gridmm_tpu.train.loop import train_navigator

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=8))
    world = SyntheticWorld(num_scans=1, nodes_per_scan=8, feat_dim=768, seed=3)
    eps = synthetic_episodes(world, num=8, seed=3, max_len=3)
    env = DiscreteNavEnv(world, world.graphs, eps, batch_size=8, seed=3)
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(3))
    agent = NavAgent(model, cfg, env, params)
    mesh = make_mesh(MeshConfig(mp_size=2), jax.devices()[:8])
    result = train_navigator(cfg, model, agent, val_agent=None, iters=2,
                             log_every=2, seed=3, mesh=mesh)
    assert result.best_iter == -1
    # params ended up sharded over the mesh
    leaf = jax.tree_util.tree_leaves(agent.params)[0]
    assert leaf.sharding.mesh.shape["data"] == 4


def test_param_rules_cover_bert_attention_projections():
    """TP rule coverage on real navigator param paths: every attention
    out-projection (BERT spelling .../output/dense) is row-parallel, qkv /
    FFN-up biases follow their column-parallel kernels onto the model axis,
    and row-parallel biases stay replicated (added after the psum)."""
    from jax.sharding import PartitionSpec as P

    from gridmm_tpu.parallel.mesh import param_spec

    assert param_spec("lang_encoder/layer_0/attention/output/dense/kernel") \
        == P("model", None)
    assert param_spec("x_layers_0/visn_self_att/output/dense/kernel") \
        == P("model", None)
    # FFN out-proj (output_dense) is a distinct spelling, also row-parallel
    assert param_spec("x_layers_0/lang_inter/output_dense/kernel") \
        == P("model", None)
    assert param_spec("attention/self/query/bias") == P("model")
    assert param_spec("intermediate/intermediate_dense/bias") == P("model")
    # row-parallel biases replicate
    assert param_spec("attention/output/dense/bias") == P()
    assert param_spec("lang_inter/output_dense/bias") == P()

    # the regexes are live on the real model: every 2-D attention
    # output/dense kernel in the flagship tree matches the row-parallel rule
    cfg = tiny_cfg()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    from gridmm_tpu.parallel.mesh import _path_str
    paths = [_path_str(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(params)]
    out_dense = [p for p in paths if p.endswith("output/dense/kernel")]
    assert out_dense, "no attention out-projections found — naming drifted?"
    for p in out_dense:
        assert param_spec(p) == P("model", None), p
