"""Pretrain-model init importers (train_r2r.py:105-141): --checkpoint resume,
--init_pretrained bert (embeddings only — faithful to the reference's silent
key drop), --init_pretrained lxmert (embeddings + lang layers + local
x-layers + MLM head, with the reference's two dead fan-out targets).

Depth loops inside pretrain_rules come from navigator_rules, whose full
flagship-depth coverage is already locked by test_checkpoint_coverage; these
tests exercise the pretrain-specific key space (bert. scoping, wrapper-level
heads, MLM/MRC heads) at tiny depths.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_agent_e2e import tiny_cfg  # noqa: E402

from gridmm_tpu.models.pretrain import GridMMPretrain  # noqa: E402
from gridmm_tpu.train.pretrain import init_pretrain_params  # noqa: E402
from gridmm_tpu.train.synthetic import synthetic_pretrain_batch  # noqa: E402
from gridmm_tpu.utils import checkpoint as CK  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = GridMMPretrain(cfg.model)
    batch = synthetic_pretrain_batch(cfg, batch=2, num_steps=3)
    params = init_pretrain_params(model, cfg, jax.random.PRNGKey(0), batch)
    m = cfg.model
    kw = dict(num_l_layers=m.num_l_layers, num_x_layers=m.num_x_layers,
              num_pano_layers=m.num_pano_layers, has_obj=m.obj_feat_size > 0)
    return cfg, params, kw


def test_pretrain_rules_cover_all_leaves(setup):
    """A full pretrain torch checkpoint fills EVERY leaf of the pretrain
    tree (bert trunk incl. lang2visn branches + wrapper heads + task heads)."""
    cfg, params, kw = setup
    rules = CK.pretrain_rules(**kw)
    sd = CK.synthesize_torch_state_dict(rules, params)
    # exercise DDP prefix stripping like the released files carry
    loaded, report = CK.import_torch_pretrain(
        {"module." + k: v for k, v in sd.items()}, params, **kw)
    assert report["unfilled_flax_leaves"] == []
    assert report["unused_torch_keys"] == []
    got = CK.get_from_tree(loaded["params"],
                           "mlm_head/transform_dense/kernel")
    np.testing.assert_allclose(
        np.asarray(got),
        sd["mlm_head.predictions.transform.dense.weight"].T, atol=0)
    # wrapper-level head keys (no bert. prefix in torch) land inside bert/
    got = CK.get_from_tree(loaded["params"],
                           "bert/global_sap_head/net_0/kernel")
    np.testing.assert_allclose(np.asarray(got),
                               sd["global_sap_head.net.0.weight"].T, atol=0)


def _hf_bert_sd(params, kw, n_hf_layers=4, token_type_rows=2, seed=3):
    """HF AutoModel('bert-base') named_parameters()-shaped random dict."""
    inner = params["params"]
    rng = np.random.default_rng(seed)
    H = np.shape(CK.get_from_tree(
        inner, "bert/embeddings/word_embeddings/embedding"))[1]
    V = np.shape(CK.get_from_tree(
        inner, "bert/embeddings/word_embeddings/embedding"))[0]
    P = np.shape(CK.get_from_tree(
        inner, "bert/embeddings/position_embeddings/embedding"))[0]
    sd = {
        "embeddings.word_embeddings.weight":
            rng.standard_normal((V, H)).astype(np.float32),
        "embeddings.position_embeddings.weight":
            rng.standard_normal((P, H)).astype(np.float32),
        "embeddings.token_type_embeddings.weight":
            rng.standard_normal((token_type_rows, H)).astype(np.float32),
        "embeddings.LayerNorm.weight": np.ones(H, np.float32),
        "embeddings.LayerNorm.bias": np.zeros(H, np.float32),
        "pooler.dense.weight": rng.standard_normal((H, H)).astype(np.float32),
        "pooler.dense.bias": np.zeros(H, np.float32),
    }
    # encoder.layer.i in the HF key space, shaped off our lang layer template
    layer_rules = CK._bert_layer_rules("X", "bert/lang_encoder/layer_0")
    for i in range(n_hf_layers):
        for src, dst, tf in layer_rules:
            shape = np.shape(CK.get_from_tree(inner, dst))
            if tf == "T":
                shape = shape[::-1]
            sd[src.replace("X.", f"encoder.layer.{i}.")] = (
                rng.standard_normal(shape).astype(np.float32) * 0.02)
    return sd


def test_hf_bert_init_fills_only_embeddings(setup):
    """Faithful --init_pretrained bert: HF encoder.layer.* never matches
    lang_encoder.layer.* (train_r2r.py:109-118 + base-prefix loading), so
    only the embedding stack loads."""
    cfg, params, kw = setup
    sd = _hf_bert_sd(params, kw)
    loaded, report = CK.import_hf_bert_pretrain(sd, params, **kw)
    got = CK.get_from_tree(loaded["params"],
                           "bert/embeddings/word_embeddings/embedding")
    np.testing.assert_allclose(np.asarray(got),
                               sd["embeddings.word_embeddings.weight"], atol=0)
    got_tt = CK.get_from_tree(loaded["params"],
                              "bert/token_type_embeddings/embedding")
    np.testing.assert_allclose(
        np.asarray(got_tt), sd["embeddings.token_type_embeddings.weight"],
        atol=0)
    # the language trunk stays at init
    tpl = CK.get_from_tree(params["params"],
                           "bert/lang_encoder/layer_0/attention/self/query/kernel")
    got_l = CK.get_from_tree(loaded["params"],
                             "bert/lang_encoder/layer_0/attention/self/query/kernel")
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(tpl), atol=0)
    unused = report["unused_torch_keys"]
    assert any("encoder.layer.0" in k for k in unused)
    filled = [p for p in CK._leaf_paths(loaded["params"])
              if p not in report["unfilled_flax_leaves"]]
    assert all(("embeddings" in p) for p in filled), filled


def test_hf_bert_init_fill_lang_encoder_opt_in(setup):
    cfg, params, kw = setup
    sd = _hf_bert_sd(params, kw)
    loaded, report = CK.import_hf_bert_pretrain(
        sd, params, fill_lang_encoder=True, **kw)
    for i in range(kw["num_l_layers"]):
        got = CK.get_from_tree(
            loaded["params"],
            f"bert/lang_encoder/layer_{i}/attention/self/query/kernel")
        np.testing.assert_allclose(
            np.asarray(got),
            sd[f"encoder.layer.{i}.attention.self.query.weight"].T, atol=0)


def test_hf_xlmr_token_type_doubling(setup):
    """xlm-roberta ships a 1-row token-type table; the init doubles it so
    row 1 serves image embeddings (train_r2r.py:112-116). Auto-detected."""
    cfg, params, kw = setup
    sd = _hf_bert_sd(params, kw, token_type_rows=1)
    loaded, _ = CK.import_hf_bert_pretrain(sd, params, **kw)
    got = np.asarray(CK.get_from_tree(
        loaded["params"], "bert/token_type_embeddings/embedding"))
    src = sd["embeddings.token_type_embeddings.weight"]
    assert got.shape[0] == 2
    np.testing.assert_allclose(got[0], src[0], atol=0)
    np.testing.assert_allclose(got[1], src[0], atol=0)


def _lxmert_sd(params, kw, seed=7):
    """model_LXRT.pth-shaped dict: invert the pretrain key space back to
    LXMERT's, then add the LXMERT-only keys the init must drop."""
    rules = CK.pretrain_rules(**kw)
    pre = CK.synthesize_torch_state_dict(rules, params, seed=seed)
    sd = {}
    for k, v in pre.items():
        if k.startswith("bert.embeddings."):
            sd[k] = v
        elif k.startswith("bert.lang_encoder.layer."):
            sd[k.replace("bert.lang_encoder.layer.",
                         "bert.encoder.layer.")] = v
        elif k.startswith("bert.local_encoder.encoder.x_layers."):
            sd[k.replace("bert.local_encoder.encoder.x_layers.",
                         "bert.encoder.x_layers.")] = v
        elif k.startswith("mlm_head.predictions."):
            sd[k.replace("mlm_head.predictions.", "cls.predictions.")] = v
    # LXMERT extras: visual towers + pooler (dropped by the init)
    sd["bert.encoder.visn_fc.visn_fc.weight"] = np.zeros((4, 4), np.float32)
    sd["pooler.dense.weight"] = np.zeros((4, 4), np.float32)
    return {"module." + k: v for k, v in sd.items()}  # DDP save flavor


def test_lxmert_init(setup):
    cfg, params, kw = setup
    sd = _lxmert_sd(params, kw)
    loaded, report = CK.import_lxmert_pretrain(sd, params, **kw)
    inner = loaded["params"]
    raw = {k[len("module."):]: v for k, v in sd.items()}
    # language trunk filled from bert.encoder.layer.*
    got = CK.get_from_tree(
        inner, "bert/lang_encoder/layer_0/attention/self/query/kernel")
    np.testing.assert_allclose(
        np.asarray(got),
        raw["bert.encoder.layer.0.attention.self.query.weight"].T, atol=0)
    # local x-layers filled from the fan-out's ONE live target
    got = CK.get_from_tree(
        inner, "bert/local_encoder/x_layers_0/visual_attention/att/query/kernel")
    np.testing.assert_allclose(
        np.asarray(got),
        raw["bert.encoder.x_layers.0.visual_attention.att.query.weight"].T,
        atol=0)
    # grid_txt x-layer stays at init: the reference's fan-out writes
    # '.encoder.x_layers' but the module's path is '.x_layers' (silent no-op)
    tpl = CK.get_from_tree(
        params["params"],
        "bert/grid_txt_encoder/x_layers_0/visual_attention/att/query/kernel")
    got = CK.get_from_tree(
        inner,
        "bert/grid_txt_encoder/x_layers_0/visual_attention/att/query/kernel")
    np.testing.assert_allclose(np.asarray(got), np.asarray(tpl), atol=0)
    # MLM head filled from cls.predictions.*
    got = CK.get_from_tree(inner, "mlm_head/transform_dense/kernel")
    np.testing.assert_allclose(
        np.asarray(got),
        raw["cls.predictions.transform.dense.weight"].T, atol=0)
    # the dead fan-out copies + LXMERT extras are reported unused
    unused = report["unused_torch_keys"]
    assert any(k.startswith("bert.grid_txt_encoder.encoder.x_layers.")
               for k in unused)
    assert any(k.startswith("bert.global_encoder.encoder.x_layers.")
               for k in unused)
    assert "bert.encoder.visn_fc.visn_fc.weight" in unused


def test_cli_init_weights_glue(setup, tmp_path):
    """--init_pretrained lxmert --init_weights <file> through the CLI helper
    (torch round trip + zero-match guard)."""
    import argparse

    import torch

    from gridmm_tpu.cli.pretrain import _apply_init_weights

    cfg, params, kw = setup
    sd = _lxmert_sd(params, kw)
    path = tmp_path / "model_LXRT.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(path))
    args = argparse.Namespace(init_checkpoint=None, init_pretrained="lxmert",
                              init_weights=str(path),
                              init_fill_lang_encoder=False)
    loaded = _apply_init_weights(args, cfg, params)
    got = CK.get_from_tree(
        loaded["params"],
        "bert/lang_encoder/layer_0/attention/self/query/kernel")
    raw = {k[len("module."):]: v for k, v in sd.items()}
    np.testing.assert_allclose(
        np.asarray(got),
        raw["bert.encoder.layer.0.attention.self.query.weight"].T, atol=1e-7)

    # wrong key space -> loud failure, never silent random init
    bad = tmp_path / "bad.pth"
    torch.save({"totally.wrong.key": torch.zeros(3)}, str(bad))
    args = argparse.Namespace(init_checkpoint=str(bad), init_pretrained="none",
                              init_weights=None,
                              init_fill_lang_encoder=False)
    with pytest.raises(ValueError, match="ZERO"):
        _apply_init_weights(args, cfg, params)
