"""CLI drivers end-to-end smoke (tiny shapes)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_main_nav_cli(tmp_path):
    from gridmm_tpu.cli.main_nav import main

    result = main(["--world", "synthetic", "--iters", "4", "--log_every", "2",
                   "--eval", "--eval_batches", "1", "--batch_size", "3",
                   "--output_dir", str(tmp_path)])
    assert result.best_spl >= 0
    assert (tmp_path / "logs" / "metrics.jsonl").exists()


@pytest.mark.slow
def test_pretrain_cli(tmp_path):
    from gridmm_tpu.cli.pretrain import main

    state = main(["--steps", "3", "--valid_every", "3", "--batch_size", "2",
                  "--output_dir", str(tmp_path)])
    assert int(state.step) == 3


def test_run_ce_cli(tmp_path):
    from gridmm_tpu.cli.run_ce import main

    metrics = main(["--run-type", "train", "--epochs", "1",
                    "--batches_per_epoch", "1", "--max_steps", "2",
                    "--num_episodes", "4", "--output_dir", str(tmp_path)])
    assert 0.0 <= metrics["sr"] <= 1.0


def test_convert_store_cli(tmp_path):
    h5py = pytest.importorskip("h5py")
    from gridmm_tpu.cli.convert_store import main
    from gridmm_tpu.data.store import open_store

    src = tmp_path / "depth.h5"
    with h5py.File(src, "w") as f:
        f.create_dataset("s_v", data=np.full((36, 128, 128), 7, np.uint16))
    dst = tmp_path / "depth.gmm"
    main(["--input", str(src), "--output", str(dst),
          "--slice-depth-patches"])
    r = open_store(str(dst))
    rec = r.get("s_v")
    assert rec.shape == (12, 49) and (rec == 7).all()
    r.close()


def test_run_ce_cli_waypoint_ckpt(tmp_path):
    """--waypoint_ckpt loads a TRM_net-layout checkpoint through the CLI
    (base_il_trainer.py:96-117 frozen waypoint load)."""
    torch = pytest.importorskip("torch")
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent))
    from test_waypoint import _build_torch_trm

    from gridmm_tpu.cli.run_ce import main

    tm = _build_torch_trm(True, hidden=64, heads=4, inter=3072, layers=1,
                          rgb_dim=(2048 * 7 * 7 // 49 // 49) * 49,  # tiny tower: 41*49
                          depth_dim=128 * 16)
    ckpt = {"predictor": {"state_dict": tm.state_dict()}}
    path = tmp_path / "waypoint.pth"
    torch.save(ckpt, path)
    metrics = main(["--run-type", "eval", "--batches_per_epoch", "1",
                    "--max_steps", "2", "--num_episodes", "4",
                    "--output_dir", str(tmp_path),
                    "--waypoint_ckpt", str(path)])
    assert 0.0 <= metrics["sr"] <= 1.0


def test_run_ce_cli_habitat_requires_config(tmp_path):
    from gridmm_tpu.cli.run_ce import main

    with pytest.raises(SystemExit):
        main(["--env", "habitat", "--output_dir", str(tmp_path)])
