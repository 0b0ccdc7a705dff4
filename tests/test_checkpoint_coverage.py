"""Structural coverage: the navigator rule map must fill every parameter leaf
of the full-size model (so a real reference checkpoint loads completely)."""

import sys
from pathlib import Path

import numpy as np
import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.config import r2r_config  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.utils import checkpoint as CK  # noqa: E402


def test_navigator_rules_cover_all_leaves():
    # Coverage is a property of the KEY SPACE: rule families are emitted per
    # layer index, so the flagship layer counts (9L/4X/2P) must stay — but
    # widths only scale array sizes, never which leaves exist. Shrunk widths
    # take init from 161M params to ~2M with the identical leaf set.
    import dataclasses
    cfg = r2r_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, hidden_size=64, num_attention_heads=4,
            intermediate_size=128, image_feat_size=64, vocab_size=512,
            max_position_embeddings=32),
        shapes=dataclasses.replace(cfg.shapes, max_points=1176,
                                   max_txt_len=16))
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))

    # synthesize a torch-shaped state dict from the rules + template shapes
    rules = CK.navigator_rules(
        cfg.model.num_l_layers, cfg.model.num_x_layers,
        cfg.model.num_pano_layers, has_obj=False)
    inner = params["params"]
    sd = {}
    rng = np.random.default_rng(0)
    for src, dst, tf in rules:
        try:
            tgt = CK.get_from_tree(inner, dst)
        except KeyError:
            continue
        shape = np.shape(tgt)
        if tf == "T":
            shape = shape[::-1]
        elif tf in ("Q", "K", "V"):
            shape = (3 * shape[1], shape[0])
        elif tf in ("Qb", "Kb", "Vb"):
            shape = (3 * shape[0],)
        if src not in sd:
            sd[src] = rng.standard_normal(shape).astype(np.float32) * 0.02

    loaded, report = CK.import_torch_navigator(
        {"module." + k: v for k, v in sd.items()},  # exercise prefix stripping
        params,
        cfg.model.num_l_layers, cfg.model.num_x_layers,
        cfg.model.num_pano_layers)

    # the interactive navigator init has no lang2visn branch params (those are
    # pretrain-only); everything else must be filled
    unfilled = [p for p in report["unfilled_flax_leaves"]
                if "lang_ffn" not in p and "lang_self_att" not in p]
    assert unfilled == [], unfilled
    assert report["unused_torch_keys"] == []

    # loaded values actually landed (not template values)
    w0 = CK.get_from_tree(loaded["params"], "text_proj/kernel")
    np.testing.assert_allclose(np.asarray(w0), sd["text_proj.weight"].T,
                               atol=0)


def test_pretrain_checkpoint_remap():
    """Pretrain ckpts carry 'bert.' trunk prefixes + top-level heads
    (vlnbert_init.py:19-27); the remap must strip/keep/drop correctly."""
    from gridmm_tpu.utils.checkpoint import remap_pretrain_to_navigator

    sd = {
        "module.bert.embeddings.word_embeddings.weight": 1,
        "bert.lang_encoder.layer.0.attention.self.query.weight": 2,
        "global_sap_head.net.0.weight": 3,
        "sap_fuse_linear.net.3.bias": 4,
        "mlm_head.predictions.bias": 5,
        "image_classifier.net.0.weight": 6,
    }
    out = remap_pretrain_to_navigator(sd)
    assert out["embeddings.word_embeddings.weight"] == 1
    assert out["lang_encoder.layer.0.attention.self.query.weight"] == 2
    assert out["global_sap_head.net.0.weight"] == 3
    assert out["sap_fuse_linear.net.3.bias"] == 4
    assert not any(k.startswith(("mlm_head", "image_classifier"))
                   for k in out)
