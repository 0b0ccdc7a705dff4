"""Pretrain checkpointing: save cadence, resume, and the native
pretrain -> fine-tune navigator handoff."""

import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.cli.pretrain import main as pretrain_main  # noqa: E402


@pytest.mark.slow
def test_pretrain_save_resume_and_navigator_handoff(tmp_path):
    out = tmp_path / "run"
    state = pretrain_main([
        "--steps", "4", "--valid_every", "4", "--batch_size", "2",
        "--num_traj_steps", "2", "--save_every", "2",
        "--output_dir", str(out)])
    ckpts = out / "ckpts"
    assert (ckpts / "latest").exists()
    assert (ckpts / "navigator_latest").exists()
    step_dirs = [p.name for p in ckpts.iterdir() if p.name.startswith("step_")]
    assert step_dirs, list(ckpts.iterdir())
    assert int(state.step) == 4

    # resume continues from the saved optimizer step
    state2 = pretrain_main([
        "--steps", "2", "--valid_every", "2", "--batch_size", "2",
        "--num_traj_steps", "2",
        "--resume", str(ckpts / "latest"),
        "--output_dir", str(tmp_path / "run2")])
    assert int(state2.step) == 6

    # the navigator-shaped export restores into a fine-tune params template
    # (exactly what cli/main_nav.py --resume does)
    from gridmm_tpu.config import tiny_config
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.utils.checkpoint import (pretrain_params_to_navigator,
                                             restore_checkpoint)

    cfg = tiny_config()
    nav = init_navigator(GridMMNavigator(cfg.model), cfg.shapes,
                         jax.random.PRNGKey(1))
    restored = restore_checkpoint(str(ckpts / "navigator_latest"), nav)
    want = pretrain_params_to_navigator(state.params)
    got = restored["params"]["text_proj"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(want["params"]["text_proj"]["kernel"]), atol=0)
    # trained values, not the template's fresh init
    assert not np.allclose(np.asarray(got),
                           np.asarray(nav["params"]["text_proj"]["kernel"]))


def test_pretrain_params_to_navigator_rejects_wrong_tree():
    import pytest

    from gridmm_tpu.utils.checkpoint import pretrain_params_to_navigator

    with pytest.raises(ValueError, match="bert"):
        pretrain_params_to_navigator({"params": {"something_else": {}}})
