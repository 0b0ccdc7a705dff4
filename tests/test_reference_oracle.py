"""Parity tests whose oracle is THE REFERENCE CODE ITSELF, executed.

Every other parity test in this suite compares against a hand-built torch
replica or numpy transcription — both sides written by us, so a mistaken
reading of the reference would be made twice and pass (the round-4 audit
caught exactly such a bug after three rounds of green replica tests). These
tests retire that class: they import `/root/reference`'s actual modules
(map_nav_src/models/vilmodel.py etc.), instantiate them at oracle-test scale
with seeded random weights, push the state_dict through our checkpoint
importers, and assert the jitted twins agree.

STUDY-ONLY discipline: reference code is imported at test time via
tests/ref_oracle.py, never vendored. Skipped when /root/reference is absent.

Scale note: hidden must stay 768 — the reference hardcodes 768-wide grid
buffers and text_proj/grid_proj (vilmodel.py:789,702-703) — but depth, heads,
FFN width, vocab, and sequence lengths are cut.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_oracle import load_ref_module, nav_bert_config, require_reference  # noqa: E402

pytestmark = pytest.mark.slow

# oracle-test dims (hidden pinned at 768 by the reference, see module doc)
HID, HEADS, INTER = 768, 4, 512
NL, NX, NP = 1, 2, 1
IMG_FEAT, ANGLE = 768, 4
VOCAB, MAXPOS = 128, 32
CELLS = 196


def _our_model_cfg(obj_feat_size=0):
    from gridmm_tpu.config import ModelConfig

    return ModelConfig(
        vocab_size=VOCAB, hidden_size=HID, num_attention_heads=HEADS,
        intermediate_size=INTER, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, feat_dropout=0.0,
        max_position_embeddings=MAXPOS, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP, image_feat_size=IMG_FEAT, angle_feat_size=ANGLE,
        obj_feat_size=obj_feat_size, graph_sprels=False)


@pytest.fixture(scope="module")
def ref_navigator():
    """The real GlocalTextPathNavCMT with seeded random weights."""
    require_reference()
    vm = load_ref_module("map_nav_src", "models.vilmodel")
    torch.manual_seed(0)
    model = vm.GlocalTextPathNavCMT(nav_bert_config(
        num_l_layers=NL, num_x_layers=NX, num_pano_layers=NP, heads=HEADS,
        intermediate=INTER, image_feat_size=IMG_FEAT, angle_feat_size=ANGLE,
        vocab=VOCAB)).eval()
    return model


@pytest.fixture(scope="module")
def our_loaded(ref_navigator):
    """Our navigator with the reference's weights imported."""
    from gridmm_tpu.config import NavigatorShapes
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.utils import checkpoint as CK

    model = GridMMNavigator(_our_model_cfg())
    shapes = NavigatorShapes(max_txt_len=12, max_gmap_len=8, max_vp_len=7,
                             max_points=120)
    params = init_navigator(model, shapes, jax.random.PRNGKey(0))
    loaded, report = CK.import_torch_navigator(
        ref_navigator.state_dict(), params, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP)
    # every real reference parameter must be consumed — a leftover key means
    # the importer (and hence released-checkpoint import) misses weights
    assert report["unused_torch_keys"] == []
    assert report["unfilled_flax_leaves"] == []
    return model, loaded


def test_ref_oracle_language(ref_navigator, our_loaded):
    """forward_text (vilmodel.py:730-734) vs our 'language' mode."""
    model, loaded = our_loaded
    torch.manual_seed(1)
    B, T = 2, 12
    ids = torch.randint(1, VOCAB, (B, T))
    mask = torch.ones(B, T, dtype=torch.bool)
    mask[0, 9:] = False
    with torch.no_grad():
        ref = ref_navigator.forward_text(ids, mask).numpy()

    ours = np.asarray(model.apply(
        loaded, "language",
        {"txt_ids": jnp.asarray(ids.numpy()),
         "txt_mask": jnp.asarray(mask.numpy())}))
    valid = mask.numpy()
    np.testing.assert_allclose(ours[valid], ref[valid], atol=2e-4)


def test_ref_oracle_panorama(ref_navigator, our_loaded):
    """forward_panorama_per_step (vilmodel.py:737-780) vs 'panorama'."""
    model, loaded = our_loaded
    torch.manual_seed(2)
    B, L = 2, 6
    view = torch.randn(B, L, IMG_FEAT) * 0.4
    loc = torch.randn(B, L, ANGLE + 3) * 0.3
    nav_types = torch.randint(0, 2, (B, L))
    view_lens = torch.tensor([6, 4])
    with torch.no_grad():
        ref, ref_masks = ref_navigator.forward_panorama_per_step(
            view, None, loc, nav_types, view_lens, None)

    view_mask = np.zeros((B, L), bool)
    for i, n in enumerate(view_lens.tolist()):
        view_mask[i, :n] = True
    ours, _ = model.apply(
        loaded, "panorama",
        {"view_img_fts": jnp.asarray(view.numpy()),
         "loc_fts": jnp.asarray(loc.numpy()),
         "nav_types": jnp.asarray(nav_types.numpy().astype(np.int32)),
         "view_mask": jnp.asarray(view_mask)})
    ours = np.asarray(ours)
    np.testing.assert_array_equal(ref_masks.numpy(), view_mask)
    np.testing.assert_allclose(ours[view_mask], ref.numpy()[view_mask],
                               atol=2e-4)


def test_ref_oracle_navigation(ref_navigator, our_loaded):
    """forward_navigation_per_step (vilmodel.py:782-918) vs 'navigation' —
    grid relevance pooling, map/fusion encoders, all four logit heads, and
    the graph-aware fused-logit scatter, against the reference's own loops
    (incl. its max_cell_num compaction, which our padded 196-slot layout
    must be attention-equivalent to)."""
    model, loaded = our_loaded
    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    B, T, G, V, N = 2, 12, 8, 7, 120

    txt = torch.randn(B, T, HID) * 0.3
    txt_mask = torch.zeros(B, T, dtype=torch.bool)
    txt_mask[0, :9] = True
    txt_mask[1, :12] = True
    gmap_img = torch.randn(B, G, HID) * 0.3
    gmap_step_ids = torch.randint(0, 5, (B, G))
    gmap_pos = torch.randn(B, G, ANGLE + 3) * 0.3
    gmap_mask = torch.zeros(B, G, dtype=torch.bool)
    gmap_mask[:, :6] = True
    gmap_visited = torch.zeros(B, G, dtype=torch.bool)
    gmap_visited[:, 1:3] = True
    gmap_vpids = [[None, "v1", "v2", "u3", "u4", "u5", None, None]] * B
    vp_img = torch.randn(B, V, HID) * 0.3
    vp_pos = torch.randn(B, V, 2 * ANGLE + 6) * 0.3
    vp_mask = torch.ones(B, V, dtype=torch.bool)
    vp_nav_mask = torch.zeros(B, V, dtype=torch.bool)
    vp_nav_mask[:, :4] = True  # [stop] + 3 candidates
    # candidate 1 -> unvisited u3, candidate 2 -> visited v1 (backtrack),
    # candidate 3 -> off-graph x9 (feeds the backtrack pool)
    cand_vpids = [[None, "u3", "v1", "x9"]] * B

    grid_fts = [torch.randn(N, IMG_FEAT) * 0.4 for _ in range(B)]
    grid_map = [torch.tensor(
        np.where(rng.random(N) < 0.2, -1,
                 rng.integers(0, CELLS, N)).astype(np.int64))
        for _ in range(B)]
    gridmap_pos_fts = torch.randn(B, CELLS, 5) * 0.2

    with torch.no_grad():
        outs = ref_navigator.forward_navigation_per_step(
            txt, txt_mask, gmap_img, gmap_step_ids, gmap_pos, gmap_mask,
            torch.zeros(B, G, G), gmap_visited, gmap_vpids,
            vp_img, vp_pos, vp_mask, vp_nav_mask, None, cand_vpids,
            grid_fts, grid_map, gridmap_pos_fts)

    # host-side index maps for the fused-logit scatter (what train/agent.py
    # builds from the same vpid bookkeeping)
    fused_add_idx = np.full((B, G), -2, np.int32)
    fused_add_idx[:, 3] = 1   # u3 matches candidate 1
    fused_add_idx[:, 4] = -1  # u4 unmatched -> backtrack pool
    fused_add_idx[:, 5] = -1  # u5 unmatched -> backtrack pool
    cand_backtrack = np.zeros((B, V), bool)
    cand_backtrack[:, 2] = True  # candidate 2 is visited v1
    # candidate 3 (off-graph x9) is NOT backtrack: the reference pools only
    # VISITED candidates into bw_logits (vilmodel.py:892-896); unvisited
    # unmatched ones sit in tmp and are dropped

    out = model.apply(
        loaded, "navigation", {
            "txt_embeds": jnp.asarray(txt.numpy()),
            "txt_mask": jnp.asarray(txt_mask.numpy()),
            "gmap_img_embeds": jnp.asarray(gmap_img.numpy()),
            "gmap_step_ids": jnp.asarray(
                gmap_step_ids.numpy().astype(np.int32)),
            "gmap_pos_fts": jnp.asarray(gmap_pos.numpy()),
            "gmap_mask": jnp.asarray(gmap_mask.numpy()),
            "gmap_visited_mask": jnp.asarray(gmap_visited.numpy()),
            "vp_img_embeds": jnp.asarray(vp_img.numpy()),
            "vp_pos_fts": jnp.asarray(vp_pos.numpy()),
            "vp_mask": jnp.asarray(vp_mask.numpy()),
            "vp_nav_mask": jnp.asarray(vp_nav_mask.numpy()),
            "grid_fts": jnp.asarray(np.stack([g.numpy() for g in grid_fts])),
            "grid_cells": jnp.asarray(
                np.stack([g.numpy() for g in grid_map]).astype(np.int32)),
            "gridmap_pos_fts": jnp.asarray(gridmap_pos_fts.numpy()),
            "fused_add_idx": jnp.asarray(fused_add_idx),
            "cand_backtrack_mask": jnp.asarray(cand_backtrack),
            # reference default: relevance max over padded text too
            "txt_relevance_mask": None,
        })

    def cmp(name, ours, theirs, atol=5e-4):
        ours, theirs = np.asarray(ours), theirs.numpy()
        finite = np.isfinite(theirs)
        np.testing.assert_array_equal(np.isfinite(ours), finite, err_msg=name)
        np.testing.assert_allclose(ours[finite], theirs[finite], atol=atol,
                                   err_msg=name)

    cmp("global", out.global_logits, outs["global_logits"])
    cmp("local", out.local_logits, outs["local_logits"])
    cmp("grid", out.grid_logits, outs["grid_logits"])
    cmp("fused", out.fused_logits, outs["fused_logits"])
    assert outs["obj_logits"] is None
