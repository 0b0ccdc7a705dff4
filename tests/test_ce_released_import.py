"""The released CE checkpoint key space must import completely — and a wrong
key space must RAISE rather than silently leave random init.

Released nestings replicated (VLN_CE/.../gridmap/vlnbert_init.py:17-33):
  grid_map.pt      {'vln_bert': {'state_dict': {'vln_bert.<k>': v}}}
  ckpt.{epoch}.pth {'state_dict': {'net.module.vln_bert.<k>': v}}
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ce.factory import build_ce_agent, load_ce_released_weights  # noqa: E402
from gridmm_tpu.utils import checkpoint as CK  # noqa: E402


def _synthetic_navigator_sd(agent):
    """Torch-shaped state dict covering every rule, from template shapes."""
    cfg = agent.cfg.model
    rules = CK.navigator_rules(cfg.num_l_layers, cfg.num_x_layers,
                               cfg.num_pano_layers,
                               has_obj=cfg.obj_feat_size > 0)
    return CK.synthesize_torch_state_dict(rules, agent.nav_params)


def test_remap_ce_released_key_spaces():
    sd = {"embeddings.word_embeddings.weight": 1}
    # grid_map.pt flavor: vln_bert/state_dict nesting + vln_bert. prefix
    gm = {"vln_bert": {"epoch": 3,
                       "state_dict": {"vln_bert." + k: v
                                      for k, v in sd.items()},
                       "optimizer": {}},
          "critic": {"state_dict": {}}}
    out = CK.remap_ce_released(gm)
    assert out["embeddings.word_embeddings.weight"] == 1
    # CE epoch ckpt flavor: state_dict nesting + net.module.vln_bert. prefix
    ce = {"state_dict": {"net.module.vln_bert." + k: v
                         for k, v in sd.items()},
          "epoch": 1, "optim_state": {}}
    out = CK.remap_ce_released(ce)
    assert out["embeddings.word_embeddings.weight"] == 1
    # pretrain-style bert. trunk prefix also strips
    out = CK.remap_ce_released({"bert.x": 2, "vln_bert.y": 3, "z": 4})
    assert out == {"x": 2, "y": 3, "z": 4}


def test_grid_map_pt_nesting_imports_fully():
    _, agent = build_ce_agent(tiny=True, seed=0)
    sd = _synthetic_navigator_sd(agent)
    ckpt = {"vln_bert": {"epoch": 0,
                         "state_dict": {"vln_bert." + k: v
                                        for k, v in sd.items()},
                         "optimizer": {}},
            "critic": {"state_dict": {}}}
    load_ce_released_weights(agent, navigator_ckpt=ckpt)
    got = np.asarray(CK.get_from_tree(agent.nav_params["params"],
                                      "text_proj/kernel"))
    np.testing.assert_allclose(got, sd["text_proj.weight"].T, atol=0)


def test_ce_epoch_ckpt_nesting_imports_fully():
    _, agent = build_ce_agent(tiny=True, seed=1)
    sd = _synthetic_navigator_sd(agent)
    ckpt = {"state_dict": {"net.module.vln_bert." + k: v
                           for k, v in sd.items()},
            "epoch": 2, "optim_state": {}}
    load_ce_released_weights(agent, navigator_ckpt=ckpt)
    got = np.asarray(CK.get_from_tree(agent.nav_params["params"],
                                      "embeddings/word_embeddings/embedding"))
    np.testing.assert_allclose(got, sd["embeddings.word_embeddings.weight"],
                               atol=0)


def test_wrong_key_space_raises_not_noop():
    _, agent = build_ce_agent(tiny=True, seed=2)
    sd = _synthetic_navigator_sd(agent)
    bad = {"state_dict": {"some_other_model." + k: v for k, v in sd.items()}}
    with pytest.raises(ValueError, match="unfilled"):
        load_ce_released_weights(agent, navigator_ckpt=bad)
