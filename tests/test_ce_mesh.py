"""CE trainer SPMD: the reference's DDP-wrapped VLN-CE training
(base_il_trainer.py _init_distributed + DDP) as a sharded jit over a device
mesh — DP over `data`, optional Megatron-TP over `model`."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ce.env import SyntheticContinuousEnv  # noqa: E402
from gridmm_tpu.ce.factory import build_ce_agent  # noqa: E402
from gridmm_tpu.ce.trainer import CETrainer  # noqa: E402
from gridmm_tpu.config import MeshConfig  # noqa: E402
from gridmm_tpu.parallel.mesh import make_mesh  # noqa: E402


def _train_one(mesh):
    cfg, agent = build_ce_agent(tiny=True, seed=0)
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=0)
    trainer = CETrainer(cfg, agent, mesh=mesh)
    stats = trainer.train_epoch(env, 0, batches=1, max_steps=2, seed=0)
    return stats, agent


@pytest.mark.slow
def test_ce_train_epoch_dp_tp_mesh_matches_single_device():
    """One sharded epoch (dp=2 x mp=2) is numerically the single-device
    epoch: same rollout, same recorded batch, XLA-inserted grad all-reduce."""
    stats0, _ = _train_one(None)
    mesh = make_mesh(MeshConfig(mp_size=2), jax.devices()[:4])
    stats1, agent = _train_one(mesh)
    assert np.isfinite(stats1["loss"])
    np.testing.assert_allclose(stats1["loss"], stats0["loss"],
                               rtol=1e-4, atol=1e-5)
    # the TP rules really partitioned the navigator trunk
    specs = [x.sharding.spec
             for x in jax.tree_util.tree_leaves(agent.nav_params)]
    assert any("model" in [ax for ax in spec if ax] for spec in specs)


def test_ce_mesh_rejects_indivisible_envs():
    cfg, agent = build_ce_agent(tiny=True, seed=0)
    mesh = make_mesh(MeshConfig(mp_size=1), jax.devices()[:4])
    env = SyntheticContinuousEnv(num_envs=3, image_size=56, depth_size=256,
                                 seed=0)
    trainer = CETrainer(cfg, agent, mesh=mesh)
    try:
        trainer.train_epoch(env, 0, batches=1, max_steps=2)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected divisibility error")


@pytest.mark.slow
def test_run_ce_cli_mesh_auto(tmp_path):
    """--mesh auto trains end to end on the full virtual-device mesh."""
    from gridmm_tpu.cli import run_ce

    run_ce.main(["--run-type", "train", "--epochs", "1",
                 "--batches_per_epoch", "1", "--num_envs", "4",
                 "--max_steps", "2", "--num_episodes", "4",
                 "--mesh", "auto", "--mp_size", "2",
                 "--output_dir", str(tmp_path)])
