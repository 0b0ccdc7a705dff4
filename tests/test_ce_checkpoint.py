"""CE training checkpoints: per-epoch ckpt.{N} training state + resume
(ss_trainer_GridMap.py:65-75 save_checkpoint, base_il_trainer.py:147-150
IL.is_requeue restore)."""

import json
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ce.env import SyntheticContinuousEnv  # noqa: E402
from gridmm_tpu.ce.factory import build_ce_agent  # noqa: E402
from gridmm_tpu.ce.trainer import CETrainer  # noqa: E402


def test_ce_trainer_save_restore_roundtrip(tmp_path):
    cfg, agent = build_ce_agent(tiny=True, seed=0)
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=0)
    trainer = CETrainer(cfg, agent)
    trainer.train_epoch(env, 0, batches=1, max_steps=2, seed=0)
    trainer.save(str(tmp_path / "ckpt.0"))
    trainer.flush()  # cross-instance read below; commit the async write
    trained = jax.tree_util.tree_map(np.asarray, agent.nav_params)

    cfg2, agent2 = build_ce_agent(tiny=True, seed=1)  # different init
    trainer2 = CETrainer(cfg2, agent2)
    assert trainer2.restore(str(tmp_path / "ckpt.0")) == 0
    restored = jax.tree_util.tree_map(np.asarray, agent2.nav_params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, trained, restored)
    # optimizer state came back too (adamw mu is non-zero after one update)
    mu_leaves = jax.tree_util.tree_leaves(trainer2.opt_state)
    assert any(np.any(np.asarray(x) != 0) for x in mu_leaves
               if hasattr(x, "shape") and getattr(x, "size", 0) > 1)


def test_run_ce_cli_ckpt_and_resume(tmp_path, capsys):
    """Train writes ckpt.{epoch}; a --resume rerun skips finished epochs and
    continues from the stored state."""
    from gridmm_tpu.cli import run_ce

    common = ["--run-type", "train", "--batches_per_epoch", "1",
              "--num_envs", "2", "--max_steps", "2", "--num_episodes", "4",
              "--output_dir", str(tmp_path)]
    run_ce.main(common + ["--epochs", "2"])
    ckpts = sorted(p.name for p in (tmp_path / "checkpoints").iterdir())
    assert ckpts == ["ckpt.0", "ckpt.1"]
    capsys.readouterr()

    run_ce.main(common + ["--epochs", "3", "--resume"])
    out = capsys.readouterr().out
    lines = [json.loads(ln) for ln in out.splitlines() if ln.strip()]
    assert lines[0].get("resumed", "").endswith("ckpt.1")
    assert lines[0]["epoch"] == 2
    # only epoch 2 was trained, and it was checkpointed
    trained = [ln for ln in lines if "loss" in ln]
    assert [ln["epoch"] for ln in trained] == [2]
    assert (tmp_path / "checkpoints" / "ckpt.2").exists()


def test_params_only_subtree_restore(tmp_path):
    """Eval polling restores ONLY the 'params' entry of a CETrainer.save
    checkpoint (skipping the optimizer-moment I/O entirely)."""
    from gridmm_tpu.utils.checkpoint import restore_checkpoint_subtree

    cfg, agent = build_ce_agent(tiny=True, seed=0)
    env = SyntheticContinuousEnv(num_envs=2, image_size=56, depth_size=256,
                                 seed=0)
    trainer = CETrainer(cfg, agent)
    trainer.train_epoch(env, 0, batches=1, max_steps=2, seed=0)
    trainer.save(str(tmp_path / "ckpt.0"))
    trainer.flush()  # module-level reader below doesn't wait on the saver
    trained = jax.tree_util.tree_map(np.asarray, agent.nav_params)

    _cfg2, agent2 = build_ce_agent(tiny=True, seed=1)
    params = restore_checkpoint_subtree(str(tmp_path / "ckpt.0"), "params",
                                        agent2.nav_params)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, trained,
        jax.tree_util.tree_map(np.asarray, params))


def test_params_deleted_detects_donated_buffers():
    """The interrupt-save guard: params_deleted flags a tree whose buffers
    were invalidated (donation mid-dispatch) and passes a live tree."""
    import jax.numpy as jnp

    from gridmm_tpu.utils.checkpoint import params_deleted

    tree = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    assert not params_deleted(tree)
    tree["w"].delete()
    assert params_deleted(tree)
    # numpy leaves (host params) never count as deleted
    assert not params_deleted({"w": np.ones((3,))})
