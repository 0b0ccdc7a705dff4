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


def _sd_for_cfg(cfg):
    """Synthesized torch state dict covering every import rule for cfg."""
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    rules = CK.navigator_rules(cfg.model.num_l_layers,
                               cfg.model.num_x_layers,
                               cfg.model.num_pano_layers,
                               has_obj=cfg.model.obj_feat_size > 0)
    return CK.synthesize_torch_state_dict(rules, params)


# released nestings (gridmap/vlnbert_init.py:17-33, agent_base.py:213-228);
# spread across flavors so every key space is rehearsed
def _nest_finetune(sd):
    return {"vln_bert": {"epoch": 1,
                         "state_dict": {"module.vln_bert." + k:
                                        torch.from_numpy(v)
                                        for k, v in sd.items()},
                         "optimizer": {}},
            "critic": {"state_dict": {}}}


def _nest_grid_map(sd):
    return {"vln_bert": {"epoch": 0,
                         "state_dict": {"vln_bert." + k: torch.from_numpy(v)
                                        for k, v in sd.items()},
                         "optimizer": {}},
            "critic": {"state_dict": {}}}


def _nest_ce_epoch(sd):
    return {"state_dict": {"net.module.vln_bert." + k: torch.from_numpy(v)
                           for k, v in sd.items()},
            "epoch": 2, "optim_state": {}}


@pytest.mark.parametrize("flavor", ["r2r", "reverie", "soon", "rxr", "ce"])
def test_parity_dryrun_all_flavors(tmp_path, flavor):
    """Every released artifact family is one command the day assets exist:
    fixture-shaped checkpoints for all four discrete flavors flow through
    parity_eval (reverie/soon with object tokens + has_obj rules, rxr with
    xlmr-sized vocab — main_nav_obj.py / main_rxr.py families), and a
    grid_map.pt-nested CE checkpoint routes through `run_ce --run-type eval`
    (gridmap/vlnbert_init.py:15-33)."""
    if flavor == "ce":
        from gridmm_tpu.ce.factory import build_ce_agent
        from gridmm_tpu.cli import run_ce

        _, agent = build_ce_agent(tiny=True, img=56, seed=0)
        mcfg = agent.cfg.model
        rules = CK.navigator_rules(mcfg.num_l_layers, mcfg.num_x_layers,
                                   mcfg.num_pano_layers,
                                   has_obj=mcfg.obj_feat_size > 0)
        sd = CK.synthesize_torch_state_dict(rules, agent.nav_params)
        path = tmp_path / "grid_map.pt"
        torch.save(_nest_grid_map(sd), str(path))
        metrics = run_ce.main(
            ["--run-type", "eval", "--navigator_ckpt", str(path),
             "--max_steps", "2", "--num_episodes", "3",
             "--output_dir", str(tmp_path)])
        assert "sr" in metrics and 0.0 <= metrics["sr"] <= 1.0
        return

    cfg = parity_eval.synthetic_config(flavor)
    assert (cfg.model.obj_feat_size > 0) == (flavor in ("reverie", "soon"))
    sd = _sd_for_cfg(cfg)
    if flavor in ("reverie", "soon"):
        assert any("og_head" in k for k in sd)  # object head in the rules
    nest = {"r2r": _nest_finetune, "reverie": _nest_grid_map,
            "soon": _nest_ce_epoch, "rxr": _nest_finetune}[flavor]
    path = tmp_path / "ckpt.pt"
    torch.save(nest(sd), str(path))
    metrics = parity_eval.main(
        ["--world", "synthetic", "--synthetic_preset", flavor,
         "--navigator_ckpt", str(path), "--batch_size", "4",
         "--eval_batches", "2"])
    assert "sr" in metrics and "spl" in metrics
    if flavor in ("reverie", "soon"):
        assert "det_sr" in metrics  # object-grounding metrics emitted


def test_parity_eval_rejects_wrong_key_space(tmp_path):
    sd = {"who.knows.weight": torch.zeros(3, 3)}
    path = tmp_path / "bad.pt"
    torch.save(sd, str(path))
    with pytest.raises(ValueError, match="unfilled"):
        parity_eval.main(["--world", "synthetic",
                          "--navigator_ckpt", str(path)])
