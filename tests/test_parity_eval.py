"""Dry-run of the one-command parity runbook (scripts/parity_eval.py):
synthetic torch checkpoints in the released key spaces flow through
import -> full-split eval -> metrics, end to end."""

import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

torch = pytest.importorskip("torch")

from gridmm_tpu.config import tiny_config  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.utils import checkpoint as CK  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
import parity_eval  # noqa: E402


def _tiny_sd():
    cfg = tiny_config()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    rules = CK.navigator_rules(cfg.model.num_l_layers,
                               cfg.model.num_x_layers,
                               cfg.model.num_pano_layers, has_obj=False)
    return CK.synthesize_torch_state_dict(rules, params)


def test_parity_eval_finetune_flavor(tmp_path):
    sd = _tiny_sd()
    # released fine-tune nesting (agent_base.py:213-228): module.vln_bert.
    ckpt = {"vln_bert": {"epoch": 1,
                         "state_dict": {"module.vln_bert." + k:
                                        torch.from_numpy(v)
                                        for k, v in sd.items()},
                         "optimizer": {}},
            "critic": {"state_dict": {}}}
    path = tmp_path / "grid_map.pt"
    torch.save(ckpt, str(path))
    submit = tmp_path / "preds.json"
    metrics = parity_eval.main([
        "--world", "synthetic", "--navigator_ckpt", str(path),
        "--batch_size", "4", "--submit", str(submit)])
    assert "spl" in metrics and 0.0 <= metrics["spl"] <= 100.0
    preds = json.loads(submit.read_text())
    assert preds and {"instr_id", "trajectory"} <= set(preds[0])


def test_parity_eval_pretrain_flavor(tmp_path):
    sd = _tiny_sd()
    # pretrain ModelSaver flavor: 'bert.' trunk prefixes + pretrain heads
    psd = {}
    for k, v in sd.items():
        pref = "" if k.split(".")[0].endswith(("_head", "_linear")) else "bert."
        psd[pref + k] = torch.from_numpy(v)
    psd["mlm_head.predictions.bias"] = torch.zeros(10)
    path = tmp_path / "model_step_10.pt"
    torch.save(psd, str(path))
    metrics = parity_eval.main([
        "--world", "synthetic", "--navigator_ckpt", str(path),
        "--flavor", "pretrain", "--batch_size", "4",
        "--eval_batches", "2"])
    assert "sr" in metrics


def test_parity_eval_rejects_wrong_key_space(tmp_path):
    sd = {"who.knows.weight": torch.zeros(3, 3)}
    path = tmp_path / "bad.pt"
    torch.save(sd, str(path))
    with pytest.raises(ValueError, match="unfilled"):
        parity_eval.main(["--world", "synthetic",
                          "--navigator_ckpt", str(path)])
