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


# ===========================================================================
# Pretrain model oracle: the real GlocalTextPathCMTPreTraining executes the
# MLM / MRC / SAP losses (pretrain_src/model/pretrain_cmt.py:73-289) on a
# dual-format synthetic trajectory batch. fp16 note: the reference pretrain
# grid path runs text_fts/grid_proj in float16 (pretrain vilmodel.py:664,685);
# our path is f32, so grid-dependent outputs agree to fp16 resolution only —
# tolerances below reflect that, and grid_fts are pre-rounded to fp16 values.
# ===========================================================================

PT_PROB = 16  # image_prob_size at oracle scale


def _pretrain_scenario():
    """One coherent 2-item trajectory batch in BOTH input formats.

    item 0: path a0->a1->a2 (3 steps); frontier f1, f2. Step 2 re-offers a1
    as a candidate (exercises the visited-candidate exclusion,
    pretrain vilmodel.py:596-600).
    item 1: path b0->b1 (2 steps); frontier f3, f4.
    """
    rng = np.random.default_rng(7)
    B, T, VM1, G_OURS, V_OURS, N = 2, 10, 6, 8, 7, 120
    f32 = np.float32

    paths = [["a0", "a1", "a2"], ["b0", "b1"]]
    # per step: (cand vpids, total token count)
    cands = [
        [["a1", "f1"], ["a2", "f1", "f2"], ["a1", "f2"]],
        [["b1", "f3"], ["f3", "f4"]],
    ]
    n_tok = [[4, 5, 5], [4, 4]]
    gmap_vpids = [
        [None, "a0", "a1", "a2", "f1", "f2"],
        [None, "b0", "b1", "f3", "f4"],
    ]
    gmap_lens = [6, 5]
    steps = [3, 2]
    S, GREF = max(steps), max(gmap_lens)
    total_steps = sum(steps)

    txt_lens = np.array([8, 10])
    txt_ids = rng.integers(1, VOCAB, size=(B, T)).astype(np.int64)
    txt_mask = np.arange(T)[None] < txt_lens[:, None]
    txt_ids[~txt_mask] = 0

    # ---- trajectory tokens, ours (B,S,VM1) / reference (total_steps, L) ----
    view_fts = rng.standard_normal((B, S, VM1, IMG_FEAT)).astype(f32) * 0.3
    loc_fts = rng.standard_normal((B, S, VM1, ANGLE + 3)).astype(f32) * 0.3
    nav_types = np.zeros((B, S, VM1), np.int32)
    token_mask = np.zeros((B, S, VM1), bool)
    step_mask = np.zeros((B, S), bool)
    visited_idx = np.full((B, S, VM1), -1, np.int32)
    cand_idx = np.full((B, S, VM1), -1, np.int32)
    slot_of = [{vp: j + 1 for j, vp in enumerate(gv[1:])} for gv in gmap_vpids]
    visited_sets = [set(p) for p in paths]
    for i in range(B):
        for t in range(steps[i]):
            k = n_tok[i][t]
            token_mask[i, t, :k] = True
            step_mask[i, t] = True
            nav_types[i, t, :len(cands[i][t])] = 1
            view_fts[i, t, k:] = 0.0
            loc_fts[i, t, k:] = 0.0
            visited_idx[i, t, :k] = slot_of[i][paths[i][t]]
            for j, cvp in enumerate(cands[i][t]):
                if cvp not in visited_sets[i]:  # ever-visited never accumulate
                    cand_idx[i, t, j] = slot_of[i][cvp]

    # ---- gmap arrays ----
    gmap_mask = np.zeros((B, G_OURS), bool)
    gmap_visited = np.zeros((B, G_OURS), bool)
    gmap_step_ids = np.zeros((B, G_OURS), np.int32)
    gmap_pos = rng.standard_normal((B, G_OURS, ANGLE + 3)).astype(f32) * 0.3
    for i in range(B):
        gmap_mask[i, :gmap_lens[i]] = True
        gmap_pos[i, gmap_lens[i]:] = 0.0
        for t, vp in enumerate(paths[i]):
            s = slot_of[i][vp]
            gmap_visited[i, s] = True
            gmap_step_ids[i, s] = t + 1

    # ---- vp (last step) ----
    vp_pos_fts = rng.standard_normal((B, V_OURS, 2 * ANGLE + 6)).astype(f32) * 0.3
    vp_nav_mask = np.zeros((B, V_OURS), bool)
    vp_nav_mask[:, 0] = True
    for i in range(B):
        vp_pos_fts[i, n_tok[i][-1] + 1:] = 0.0
        vp_nav_mask[i, 1:1 + len(cands[i][-1])] = True

    # ---- fused-logit index maps (from the same vpid bookkeeping) ----
    fused_add_idx = np.full((B, G_OURS), -2, np.int32)
    cand_backtrack = np.zeros((B, V_OURS), bool)
    for i in range(B):
        cand_col = {cvp: j + 1 for j, cvp in enumerate(cands[i][-1])}
        for vp, s in slot_of[i].items():
            if vp in visited_sets[i]:
                continue
            fused_add_idx[i, s] = cand_col.get(vp, -1)
        for j, cvp in enumerate(cands[i][-1]):
            if cvp in visited_sets[i]:
                cand_backtrack[i, j + 1] = True

    # ---- grid (fp16-rounded values so both sides see identical inputs) ----
    grid_fts = (rng.standard_normal((B, N, IMG_FEAT)) * 0.3).astype(
        np.float16).astype(f32)
    grid_cells = np.where(rng.random((B, N)) < 0.2, -1,
                          rng.integers(0, CELLS, (B, N))).astype(np.int32)
    gridmap_pos_fts = rng.standard_normal((B, CELLS, 5)).astype(f32) * 0.2

    # ---- task labels ----
    mlm_sel = (rng.random((B, T)) < 0.3) & txt_mask
    mlm_sel[:, 0] = False
    txt_labels = np.where(mlm_sel, txt_ids, -1).astype(np.int64)
    masked_ids = np.where(mlm_sel, 3, txt_ids).astype(np.int64)  # 3 = [MASK]

    ref_vwidth = max(n[-1] for n in n_tok)  # reference last-step pad width
    view_mrc_masks = np.zeros((B, VM1), bool)
    view_mrc_masks[0, [0, 2]] = True
    view_mrc_masks[1, [1, 3]] = True
    view_probs = rng.random((B, VM1, PT_PROB)).astype(f32)
    view_probs /= view_probs.sum(-1, keepdims=True)

    global_act = np.array([slot_of[0]["f2"], 0], np.int64)
    local_act = np.array([2, 0], np.int64)  # f2 = candidate col 2 at step 2

    # ---------------------------------------------------- reference format
    ref = {}
    L = max(max(n) for n in n_tok)
    r_view = np.zeros((total_steps, L, IMG_FEAT), f32)
    r_loc = np.zeros((total_steps, L, ANGLE + 3), f32)
    r_nav = np.zeros((total_steps, L), np.int64)
    r_vlens = np.zeros((total_steps,), np.int64)
    row = 0
    for i in range(B):
        for t in range(steps[i]):
            k = n_tok[i][t]
            r_view[row, :k] = view_fts[i, t, :k]
            r_loc[row, :k] = loc_fts[i, t, :k]
            r_nav[row, :k] = nav_types[i, t, :k]
            r_vlens[row] = k
            row += 1
    ref["txt_ids"] = torch.from_numpy(masked_ids)
    ref["txt_lens"] = torch.from_numpy(txt_lens)
    ref["traj_view_img_fts"] = torch.from_numpy(r_view)
    ref["traj_obj_img_fts"] = None
    ref["traj_loc_fts"] = torch.from_numpy(r_loc)
    ref["traj_nav_types"] = torch.from_numpy(r_nav)
    ref["traj_step_lens"] = steps
    ref["traj_vp_view_lens"] = torch.from_numpy(r_vlens)
    ref["traj_vp_obj_lens"] = None
    ref["traj_vpids"] = paths
    ref["traj_cand_vpids"] = cands
    ref["gmap_lens"] = torch.tensor(gmap_lens)
    ref["gmap_step_ids"] = torch.from_numpy(
        gmap_step_ids[:, :GREF].astype(np.int64))
    ref["gmap_pos_fts"] = torch.from_numpy(gmap_pos[:, :GREF])
    ref["gmap_pair_dists"] = torch.zeros(B, GREF, GREF)
    ref["gmap_vpids"] = gmap_vpids
    ref["vp_pos_fts"] = torch.from_numpy(vp_pos_fts[:, :ref_vwidth + 1])
    ref["grid_fts"] = [torch.from_numpy(grid_fts[i]).to(torch.float16)
                       for i in range(B)]
    ref["grid_map"] = [torch.from_numpy(grid_cells[i].astype(np.int64))
                       for i in range(B)]
    ref["gridmap_pos_fts"] = torch.from_numpy(gridmap_pos_fts)
    ref["target_patch_id"] = None
    ref["gmap_visited_masks"] = torch.from_numpy(gmap_visited[:, :GREF])
    ref["txt_labels"] = torch.from_numpy(txt_labels)
    ref["vp_view_mrc_masks"] = torch.from_numpy(view_mrc_masks[:, :ref_vwidth])
    ref["vp_view_probs"] = torch.from_numpy(view_probs[:, :ref_vwidth])
    ref["vp_obj_mrc_masks"] = None
    ref["vp_obj_probs"] = None
    ref["global_act_labels"] = torch.from_numpy(global_act)
    ref["local_act_labels"] = torch.from_numpy(local_act)

    # --------------------------------------------------------- ours format
    from gridmm_tpu.train.pretrain import PretrainBatch

    ours = PretrainBatch(
        txt_ids=jnp.asarray(masked_ids.astype(np.int32)),
        txt_mask=jnp.asarray(txt_mask),
        traj_view_fts=jnp.asarray(view_fts),
        traj_loc_fts=jnp.asarray(loc_fts),
        traj_nav_types=jnp.asarray(nav_types),
        traj_token_mask=jnp.asarray(token_mask),
        traj_step_mask=jnp.asarray(step_mask),
        visited_idx=jnp.asarray(visited_idx),
        cand_idx=jnp.asarray(cand_idx),
        gmap_step_ids=jnp.asarray(gmap_step_ids),
        gmap_pos_fts=jnp.asarray(gmap_pos),
        gmap_mask=jnp.asarray(gmap_mask),
        gmap_visited_mask=jnp.asarray(gmap_visited),
        vp_pos_fts=jnp.asarray(vp_pos_fts),
        vp_nav_mask=jnp.asarray(vp_nav_mask),
        fused_add_idx=jnp.asarray(fused_add_idx),
        cand_backtrack_mask=jnp.asarray(cand_backtrack),
        grid_fts=jnp.asarray(grid_fts),
        grid_cells=jnp.asarray(grid_cells),
        gridmap_pos_fts=jnp.asarray(gridmap_pos_fts),
        txt_labels=jnp.asarray(txt_labels.astype(np.int32)),
        view_mrc_masks=jnp.asarray(view_mrc_masks),
        view_probs=jnp.asarray(view_probs),
        global_act_labels=jnp.asarray(global_act.astype(np.int32)),
        local_act_labels=jnp.asarray(local_act.astype(np.int32)),
        obj_labels=jnp.zeros((B,), jnp.int32),
        vp_obj_mask=jnp.zeros((B, V_OURS), bool),
    )
    return ref, ours, dict(ref_vwidth=ref_vwidth, GREF=GREF)


@pytest.fixture(scope="module")
def ref_pretrain():
    """The real GlocalTextPathCMTPreTraining with seeded random weights."""
    require_reference()
    pc = load_ref_module("pretrain_src", "model.pretrain_cmt")
    torch.manual_seed(11)
    cfg = nav_bert_config(num_l_layers=NL, num_x_layers=NX,
                          num_pano_layers=NP, heads=HEADS, intermediate=INTER,
                          image_feat_size=IMG_FEAT, angle_feat_size=ANGLE,
                          vocab=VOCAB)
    cfg.pretrain_tasks = ["mlm", "mrc", "sap"]
    cfg.image_prob_size = PT_PROB
    cfg.obj_prob_size = 0
    # the pretrain model configs all enable the lang2visn branch (MLM needs
    # it; r2r_model_config.json:32), unlike the fine-tune navigator
    cfg.use_lang2visn_attn = True
    model = pc.GlocalTextPathCMTPreTraining(cfg).eval()
    return model


@pytest.fixture(scope="module")
def our_pretrain(ref_pretrain):
    from gridmm_tpu.config import GridMMConfig, GridConfig, NavigatorShapes
    from gridmm_tpu.models.pretrain import GridMMPretrain
    from gridmm_tpu.train.pretrain import init_pretrain_params
    from gridmm_tpu.utils import checkpoint as CK
    import dataclasses

    mc = dataclasses.replace(_our_model_cfg(), image_prob_size=PT_PROB)
    sh = NavigatorShapes(max_txt_len=10, max_gmap_len=8, max_vp_len=7,
                         max_points=120)
    cfg = GridMMConfig(model=mc, shapes=sh, grid=GridConfig())
    model = GridMMPretrain(mc)
    _, ours, _ = _pretrain_scenario()
    params = init_pretrain_params(model, cfg, jax.random.PRNGKey(0), ours)
    loaded, report = CK.import_torch_pretrain(
        ref_pretrain.state_dict(), params, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP)
    # legitimately-unconsumed torch keys: the tied MLM decoder weight, and
    # the grid_txt_encoder x-layer's lang branch — with use_lang2visn_attn
    # the reference builds it (vilmodel.py:374-380) but grid_txt_encoder only
    # ever visn-attends (forward_mlm/forward never call forward_lang2visn on
    # it), so those 16 weights are dead in the reference too
    unused = set(report["unused_torch_keys"])
    assert "mlm_head.predictions.decoder.weight" in unused
    unused.discard("mlm_head.predictions.decoder.weight")
    assert unused and all(
        k.startswith("bert.grid_txt_encoder.x_layers.0.lang") for k in unused)
    assert report["unfilled_flax_leaves"] == []
    return model, loaded


def test_ref_oracle_pretrain_sap(ref_pretrain, our_pretrain):
    """forward_sap logits + stop-reweighted losses (pretrain_cmt.py:217-289)."""
    from gridmm_tpu.train.losses import sap_loss
    from gridmm_tpu.models.pretrain import GridMMPretrain
    from gridmm_tpu.train.pretrain import _enc_kwargs

    ref, ours, meta = _pretrain_scenario()
    model, loaded = our_pretrain
    with torch.no_grad():
        g, l, f, _, _ = ref_pretrain.forward(ref, "sap", compute_loss=False)
        losses = ref_pretrain.forward(ref, "sap", compute_loss=True)

    enc = model.apply(loaded, ours.txt_ids, ours.txt_mask,
                      method=GridMMPretrain.encode, **_enc_kwargs(ours))
    og, ol, of, ogr = model.apply(
        loaded, enc, ours.gmap_mask, ours.gmap_visited_mask, ours.vp_nav_mask,
        ours.fused_add_idx, ours.cand_backtrack_mask,
        method=GridMMPretrain.forward_sap_logits)
    our_losses = sap_loss(og, ol, of, ogr, ours.global_act_labels,
                          ours.local_act_labels)

    GREF, VW = meta["GREF"], meta["ref_vwidth"] + 1

    def cmp(name, ours_arr, ref_t, width, atol):
        o = np.asarray(ours_arr)[:, :width]
        r = ref_t.numpy()
        finite = np.isfinite(r)
        np.testing.assert_array_equal(np.isfinite(o), finite, err_msg=name)
        np.testing.assert_allclose(o[finite], r[finite], atol=atol,
                                   err_msg=name)

    # fp16 grid path in the reference bounds achievable agreement (~1e-3)
    cmp("sap_global", og, g, GREF, 5e-3)
    cmp("sap_local", ol, l, VW, 5e-3)
    cmp("sap_fused", of, f, GREF, 5e-3)
    np.testing.assert_allclose(np.asarray(our_losses), losses.numpy(),
                               atol=2e-2)


def test_ref_oracle_pretrain_mlm(ref_pretrain, our_pretrain):
    """forward_mlm masked-token CE (pretrain_cmt.py:125-153)."""
    from gridmm_tpu.train.pretrain import task_loss

    ref, ours, _ = _pretrain_scenario()
    model, loaded = our_pretrain
    with torch.no_grad():
        scores = ref_pretrain.forward(ref, "mlm", compute_loss=False)
        mask_loss = ref_pretrain.forward(ref, "mlm", compute_loss=True)

    our_loss = float(task_loss(model, loaded, ours, "mlm"))
    assert scores.shape == (int((np.asarray(ours.txt_labels) != -1).sum()),
                            VOCAB)
    np.testing.assert_allclose(our_loss, float(mask_loss.mean()), atol=2e-3)


def test_ref_oracle_pretrain_mrc(ref_pretrain, our_pretrain):
    """forward_mrc KL over masked view tokens (pretrain_cmt.py:161-212),
    including the dataset-side feature zeroing (tasks.py _mask_img_feat)."""
    from gridmm_tpu.train.pretrain import task_loss

    ref, ours, meta = _pretrain_scenario()
    model, loaded = our_pretrain

    # the reference receives features ALREADY zeroed by MrcDataset
    # (tasks.py:195-196); ours zeroes inside task_loss from view_mrc_masks
    vm = ref["vp_view_mrc_masks"].numpy()
    r_view = ref["traj_view_img_fts"].clone()
    steps = ref["traj_step_lens"]
    row = -1
    starts = np.cumsum([0] + list(steps))
    for i, s in enumerate(steps):
        last_row = starts[i] + s - 1
        r_view[last_row, :vm.shape[1]][torch.from_numpy(vm[i])] = 0.0
    ref = {**ref, "traj_view_img_fts": r_view}

    with torch.no_grad():
        mrc_loss = ref_pretrain.forward(ref, "mrc", compute_loss=True)

    our_loss = float(task_loss(model, loaded, ours, "mrc"))
    np.testing.assert_allclose(our_loss, float(mrc_loss.mean()), atol=5e-3)


# ===========================================================================
# MLM masking oracle: the reference's random_word (tasks.py:11-51) runs with
# a seeded global `random`; our random_word_masking consumes an identically
# seeded random.Random — decisions must match BIT-EXACTLY (same Mersenne
# stream, same draw sequence).
# ===========================================================================

def test_ref_oracle_mlm_masking():
    import random as pyrandom

    require_reference()
    tasks = load_ref_module("pretrain_src", "data.tasks")
    from gridmm_tpu.data.pretrain_data import random_word_masking

    rng = np.random.default_rng(5)
    for seed in range(20):
        tokens = rng.integers(1996, 29611, size=rng.integers(1, 60)).tolist()
        pyrandom.seed(seed)
        ref_ids, ref_labels = tasks.random_word(
            list(tokens), (1996, 29611), 103)
        ours_ids, ours_labels = random_word_masking(
            np.asarray(tokens, np.int64), pyrandom.Random(seed))
        np.testing.assert_array_equal(ours_ids, ref_ids)
        np.testing.assert_array_equal(ours_labels, ref_labels)


# ===========================================================================
# Discrete eval-metrics oracle: the real R2RNavBatch._eval_item + eval_utils
# (map_nav_src/r2r/env.py:640-709, r2r/eval_utils.py) score the same synthetic
# trajectories as env/metrics.evaluate_trajectory.
# ===========================================================================

def _toy_distances(rng, n=12):
    """Random metric-ish all-pairs distances over synthetic nodes (symmetric,
    zero diagonal) shaped like the reference's dict-of-dict Dijkstra table."""
    names = [f"n{i}" for i in range(n)]
    pos = rng.random((n, 2)) * 20
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    return {a: {b: float(d[i, j]) for j, b in enumerate(names)}
            for i, a in enumerate(names)}, names


def test_ref_oracle_eval_metrics():
    require_reference()
    renv = load_ref_module("map_nav_src", "r2r.env")
    from gridmm_tpu.env.metrics import aggregate_metrics, evaluate_trajectory

    rng = np.random.default_rng(9)
    shortest, names = _toy_distances(rng)
    ref_env = renv.R2RNavBatch.__new__(renv.R2RNavBatch)
    ref_env.shortest_distances = {"scanX": shortest}

    per_traj = []
    for case in range(6):
        gt = [names[0]] + list(rng.choice(names[1:], size=3, replace=False))
        # pred paths are lists of per-action sub-paths (env.py:652-655)
        pred = [[gt[0]]] + [
            list(rng.choice(names, size=int(rng.integers(1, 3))))
            for _ in range(int(rng.integers(1, 4)))]
        ref_scores = ref_env._eval_item("scanX", pred, gt)
        ours = evaluate_trajectory(shortest, pred, gt)
        assert set(ours) == set(ref_scores)
        for k in ref_scores:
            np.testing.assert_allclose(ours[k], float(ref_scores[k]),
                                       atol=1e-9, err_msg=k)
        per_traj.append(ours)

    # aggregation (env.py:696-708): same names, same x100 scaling
    agg = aggregate_metrics(per_traj)
    for k in ("sr", "spl", "oracle_sr", "nDTW", "SDTW", "CLS", "nav_error",
              "lengths", "steps", "action_steps", "oracle_error"):
        assert k in agg


def test_ref_oracle_eval_metrics_reverie():
    """REVERIE `_eval_item` (reverie/env.py:685-709) executed directly:
    success = stopping AT an obj2vps member, oracle = PASSING one, rgs =
    unconditional str(pred)==str(gt), rgspl over the same SPL denominator."""
    require_reference()
    renv = load_ref_module("map_nav_src", "reverie.env")
    from gridmm_tpu.env.metrics import evaluate_reverie_trajectory

    rng = np.random.default_rng(17)
    shortest, names = _toy_distances(rng)
    gt_end_vps = [names[3], names[7]]
    ref_env = renv.ReverieObjectNavBatch.__new__(renv.ReverieObjectNavBatch)
    ref_env.shortest_distances = {"scanX": shortest}
    ref_env.obj2vps = {"scanX_obj0": gt_end_vps}

    cases = []
    for case in range(8):
        gt = [names[0]] + list(rng.choice(names[1:], size=3, replace=False))
        pred = [[gt[0]]] + [
            list(rng.choice(names, size=int(rng.integers(1, 3))))
            for _ in range(int(rng.integers(1, 4)))]
        pred_obj = rng.choice(["obj0", "obj1", 0, None])
        cases.append((pred, gt, pred_obj))
    # engineered: stop exactly at a goal viewpoint, correct grounding
    cases.append(([[names[0]], [names[5], names[3]]],
                  [names[0], names[4]], "obj0"))
    # engineered: pass THROUGH a goal viewpoint but stop elsewhere
    cases.append(([[names[0]], [names[7], names[1]]],
                  [names[0], names[4]], "obj1"))

    for pred, gt, pred_obj in cases:
        ref_scores = ref_env._eval_item("scanX", pred, pred_obj, gt, "obj0")
        ours = evaluate_reverie_trajectory(shortest, pred, gt, gt_end_vps,
                                           pred_obj, "obj0")
        for k in ref_scores:  # ours carries framework extras (nDTW/CLS)
            np.testing.assert_allclose(ours[k], float(ref_scores[k]),
                                       atol=1e-9, err_msg=k)


def test_ref_oracle_eval_metrics_soon():
    """SOON `_eval_item` (soon/env.py:331-393) executed directly — including
    the goal UPDATE when the agent stops at any bbox viewpoint (:347-349),
    the oracle-nearest computed against the ORIGINAL goal (:346), the
    shapely polygon det test (:359-368, under tests/ref_oracle's ray-cast
    stub), and the shortest-dist gt length (:389-390)."""
    require_reference()
    senv = load_ref_module("map_nav_src", "soon.env")
    from gridmm_tpu.env.metrics import evaluate_soon_trajectory

    rng = np.random.default_rng(23)
    shortest, names = _toy_distances(rng)
    ref_env = senv.SoonObjectNavBatch.__new__(senv.SoonObjectNavBatch)
    ref_env.shortest_distances = {"scanX": shortest}

    def bbox(h, e, dh=0.05, de=0.04):
        return {"heading": h, "elevation": e, "target": {
            "left_top": {"heading": h - dh, "elevation": e + de},
            "right_top": {"heading": h + dh, "elevation": e + de},
            "right_bottom": {"heading": h + dh, "elevation": e - de},
            "left_bottom": {"heading": h - dh, "elevation": e - de}}}

    goal_a, goal_b = names[4], names[8]
    gt_bboxes = {goal_a: bbox(0.30, 0.55), goal_b: bbox(0.80, 0.45)}

    cases = []
    for case in range(8):
        gt = [names[0]] + list(rng.choice(names[1:], size=3, replace=False))
        gt[-1] = goal_a
        pred = [[gt[0]]] + [
            list(rng.choice(names, size=int(rng.integers(1, 3))))
            for _ in range(int(rng.integers(1, 4)))]
        oh, oe = float(rng.random()), float(rng.random())
        cases.append((pred, gt, oh, oe))
    # engineered: stop at the GT goal, direction INSIDE its polygon
    cases.append(([[names[0]], [names[2], goal_a]],
                  [names[0], names[2], goal_a], 0.31, 0.54))
    # engineered: stop at the OTHER bbox viewpoint (goal update), inside
    cases.append(([[names[0]], [goal_b]],
                  [names[0], names[2], goal_a], 0.79, 0.46))
    # engineered: stop at a bbox viewpoint, direction OUTSIDE the polygon
    cases.append(([[names[0]], [goal_a]],
                  [names[0], names[2], goal_a], 0.90, 0.10))

    for pred, gt, oh, oe in cases:
        gt_item = {"scan": "scanX", "path": gt, "bboxes": gt_bboxes,
                   "instr_id": "x"}
        ref_scores = ref_env._eval_item(pred, oh, oe, gt_item)
        ours = evaluate_soon_trajectory(shortest, pred, gt, gt_bboxes, oh, oe)
        for k in ref_scores:  # ours carries framework extras (nDTW/CLS)
            np.testing.assert_allclose(
                np.asarray(ref_scores[k], np.float64), ours[k],
                atol=1e-9, err_msg=k)


# ===========================================================================
# CLIP oracle: the vendored OpenAI visual tower (preprocess/model_clip.py)
# with seeded weights vs our ClipVisionTransformer through
# import_torch_clip_visual — all token hiddens, no projection/pooling
# (the P1 feature-extraction contract, get_map_feature.py:129-137).
# ===========================================================================

def test_ref_oracle_clip_visual():
    require_reference()
    mc = load_ref_module("preprocess", "model_clip")
    from gridmm_tpu.models.clip_vit import ClipVisionConfig, ClipVisionTransformer
    from gridmm_tpu.utils import checkpoint as CK

    torch.manual_seed(21)
    res, patch, width, layers, heads = 64, 32, 48, 2, 4
    tm = mc.VisionTransformer(res, patch, width, layers, heads).eval()
    imgs = torch.randn(3, 3, res, res) * 0.5
    with torch.no_grad():
        want = tm(imgs).numpy()  # all token hiddens (B, g*g+1, width)

    fm = ClipVisionTransformer(ClipVisionConfig(
        input_resolution=res, patch_size=patch, width=width, layers=layers,
        heads=heads, compute_dtype="float32"))
    imgs_nhwc = jnp.asarray(imgs.permute(0, 2, 3, 1).numpy())
    params = fm.init(jax.random.PRNGKey(0), imgs_nhwc)
    sd = {f"visual.{k}": v for k, v in tm.state_dict().items()}
    loaded = CK.import_torch_clip_visual(sd, params, layers=layers)
    got = np.asarray(fm.apply(loaded, imgs_nhwc))
    assert got.shape == want.shape == (3, (res // patch) ** 2 + 1, width)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ===========================================================================
def test_ref_oracle_ce_pos_helpers():
    """The real VLN_CE helpers executed directly: calculate_vp_rel_pos_fts
    (models/utils.py:125-144, the (x, z, y) unpacking our
    ce/agent.rel_pos_features transcribes) and get_camera_orientations
    (vlnce_baselines/utils.py:155-163, hardcoded pi/6 radian step)."""
    require_reference()
    from ref_oracle import load_ce_policy

    load_ce_policy()
    import sys as _sys

    mu = _sys.modules["vlnce_baselines.models.utils"]
    from gridmm_tpu.ce.agent import rel_pos_features
    from gridmm_tpu.ce.habitat_env import get_camera_orientations

    rng = np.random.default_rng(47)
    for _ in range(64):
        a = rng.uniform(-12, 12, 3)
        b = rng.uniform(-12, 12, 3)
        bh = float(rng.uniform(-np.pi, np.pi))
        be = float(rng.uniform(-1.0, 1.0))
        want = mu.calculate_vp_rel_pos_fts(a, b, bh, be)
        got = rel_pos_features(a, b, bh, be)
        np.testing.assert_allclose(got, want, atol=1e-9)
    # degenerate same-point case returns the (0, 0, 0) triple (:130-131)
    same = np.array([1.5, 2.0, -3.0])
    assert rel_pos_features(same, same.copy(), 0.7, 0.1) == (0.0, 0.0, 0.0)
    assert mu.calculate_vp_rel_pos_fts(same, same.copy(), 0.7, 0.1) \
        == (0, 0, 0)

    # vlnce_baselines/__init__ pulls habitat, so load utils.py by file path
    # (its module scope needs only torch/numpy/math)
    import importlib.util as _ilu
    spec = _ilu.spec_from_file_location(
        "_ref_vlnce_utils", "/root/reference/VLN_CE/vlnce_baselines/utils.py")
    ref_utils = _ilu.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)
    for nv in (12, 6):
        want = ref_utils.get_camera_orientations(nv)
        got = get_camera_orientations(nv)
        assert list(got) == list(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], atol=1e-12)


@pytest.mark.parametrize("dataset", ["R2R", "RxR"])
def test_ref_oracle_grid_build_ce(dataset, monkeypatch):
    """Grid-build oracle (G3): the real CE GridMap.getGlobalMap
    (VLN_CE/.../Policy_ViewSelection_GridMap.py:689-807) driven standalone
    over a 3-step synthetic episode (habitat metre depth at the 7 patch
    centers 19+36i of a 256px frame, CLIP-p32 features) vs our ops/geometry
    with the r2r_ce/rxr_ce GridConfig — per-point cell ids, window half_len
    (the CE 2/3 scale + (W-1) clamp quantization), and gridmap_pos_fts at
    every step. RxR flips the Policy's DATASET global: HFOV 79 deg depth
    back-projection (:637-638) and MAX_DIST 40 (:280-286). Upgrades the
    transcription-golden test
    (tests/test_geometry.py::test_ce_grid_build_matches_reference) to an
    executed-reference oracle."""
    require_reference()
    from ref_oracle import load_ce_policy

    vm = load_ce_policy()
    from gridmm_tpu.config import r2r_ce_config, rxr_ce_config
    from gridmm_tpu.ops import geometry as G

    monkeypatch.setattr(vm, "DATASET", dataset)
    if dataset == "RxR":
        monkeypatch.setattr(vm, "MAX_DIST", 40)
    rng = np.random.default_rng(41)
    cfg = (r2r_ce_config() if dataset == "R2R" else rxr_ce_config()).grid
    b, steps = 2, 3
    pci = np.array([19 + i * 36 for i in range(7)])

    refs = []
    for _ in range(b):
        g = vm.GridMap.__new__(vm.GridMap)
        # per-env state exactly as reset by ss_trainer_GridMap.py:242-249 /
        # Policy:194-204 (batch lists of size 1 per instance)
        g.global_fts = [[]]
        g.global_position_x = [[]]
        g.global_position_y = [[]]
        g.global_mask = [[]]
        g.global_map_index = [[]]
        g.max_x, g.min_x = [-10000], [10000]
        g.max_y, g.min_y = [-10000], [10000]
        g.headings = [0.0]
        refs.append(g)

    state = G.PointCloudState.create(b, cfg)
    for t in range(steps):
        depth49 = rng.uniform(0.0, 8.0, size=(b, 12, 49)).astype(np.float32)
        depth49[rng.random((b, 12, 49)) < 0.08] = 0.0
        feats = rng.standard_normal((b, 588, 768)).astype(np.float32)
        pos = rng.uniform(-5, 5, size=(b, 2)).astype(np.float32)
        heading = rng.uniform(-np.pi, np.pi, size=(b,)).astype(np.float32)

        state = G.append_panorama(
            state, jnp.asarray(depth49), jnp.asarray(feats),
            jnp.asarray(pos), cfg, headings=jnp.asarray(heading))
        cells, half_len, _ = G.egocentric_grid_assignment(
            state, jnp.asarray(pos), jnp.asarray(heading), cfg)
        our_pos_fts = np.asarray(G.gridmap_pos_fts(
            half_len, cfg.grid_width, cfg.grid_height, cfg.max_dist,
            convention=cfg.pos_fts_convention))

        for i in range(b):
            # scatter the 49 per-view samples onto a full habitat frame at
            # the reference's own patch-center indices (Policy:729-731)
            frame = np.zeros((12, 256, 256), np.float32)
            for vx in range(7):
                for vy in range(7):
                    frame[:, pci[vx], pci[vy]] = depth49[i, :, vx * 7 + vy]
            grid_ft = np.zeros((12, 50, 768), np.float32)
            grid_ft[:, 1:] = feats[i].reshape(12, 49, 768)
            refs[i].headings = [float(heading[i])]
            (gf, _gx, _gy, _gm, map_index, _mx, _mnx, _my, _mny,
             r_pos_fts) = refs[i].getGlobalMap(
                 0, {"x": float(pos[i, 0]), "y": float(pos[i, 1])},
                 float(heading[i]), frame, grid_ft, [])
            # numpy 2: `ndarray == []` raises on broadcast; the reference's
            # step-0 test (Policy:745) relies on numpy<2's scalar False —
            # re-wrap the accumulator like the rollout oracle's _CmpArr
            from test_ref_oracle_rollout import _CmpArr
            refs[i].global_fts[0] = np.asarray(
                refs[i].global_fts[0]).view(_CmpArr)

            n = (t + 1) * 588
            assert gf.shape == (n, 768)
            np.testing.assert_array_equal(
                np.asarray(cells[i])[:n], map_index.astype(np.int32))
            np.testing.assert_allclose(our_pos_fts[i], r_pos_fts, atol=1e-5)


# ===========================================================================
# Grid-build oracle (G2): the real ReverieTextPathData.getGlobalMap
# (pretrain_src/data/dataset.py:351-473) runs over a synthetic 3-step
# trajectory (uint16 depth store, CLIP-p32 features, viewpoint_info) and our
# ops/geometry pipeline must reproduce cell ids, window extents,
# gridmap_pos_fts, and the SAP grid target at EVERY step.
# ===========================================================================

class _FakeDB:
    def __init__(self, table):
        self.table = table

    def get_image_feature(self, scan, vp):
        return self.table[f"{scan}_{vp}"]


def test_ref_oracle_grid_build_offline():
    require_reference()
    ds_mod = load_ref_module("pretrain_src", "data.dataset")
    from gridmm_tpu.config import GridConfig
    from gridmm_tpu.ops import geometry as G

    rng = np.random.default_rng(13)
    gc = GridConfig()
    path = ["vpA", "vpB", "vpC"]
    positions = {"vpA": (0.0, 0.0, 1.2), "vpB": (2.5, 1.0, 1.2),
                 "vpC": (4.0, -1.5, 1.2)}
    headings = [0.0, np.pi / 6, np.pi / 2]

    depth_tbl, sem_tbl, vpinfo = {}, {}, {}
    for vp in path:
        d = rng.integers(0, 16000, size=(36, 128, 128)).astype(np.uint16)
        d[rng.random((36, 128, 128)) < 0.1] = 0  # zero-depth holes
        depth_tbl[f"scanX_{vp}"] = d
        sem_tbl[f"scanX_{vp}"] = rng.standard_normal(
            (12, 50, 768)).astype(np.float32)
        x, y, z = positions[vp]
        vpinfo[f"scanX_{vp}"] = {"x": x, "y": y, "z": z}

    # ---- reference execution ----
    ref = ds_mod.ReverieTextPathData.__new__(ds_mod.ReverieTextPathData)
    ref.DepthDB = _FakeDB(depth_tbl)
    ref.SemanticDB = _FakeDB(sem_tbl)
    ref.viewpoint_info = vpinfo
    ref.gt_path = path
    ref.global_semantic, ref.global_position_x = [], []
    ref.global_position_y, ref.global_mask = [], []
    ref.max_x, ref.min_x = -10000, 10000
    ref.max_y, ref.min_y = -10000, 10000
    ref.global_map = None
    # `if self.global_semantic == []` (dataset.py:388) relies on OLD numpy
    # semantics where ndarray == [] evaluates False; modern numpy raises a
    # broadcast error. Emulate the original behavior with a False-comparing
    # sentinel between steps (the attribute is write-only inside getGlobalMap
    # apart from that comparison).
    class _NotEmpty:
        def __eq__(self, other):
            return False

    ref_steps = []
    for t, vp in enumerate(path):
        ref.heading = headings[t]
        (_sem, ref.global_position_x, ref.global_position_y,
         ref.global_mask, ref.global_map, ref.max_x, ref.min_x, ref.max_y,
         ref.min_y, r_pos_fts, r_target) = ref.getGlobalMap("scanX", vp)
        ref.global_semantic = _NotEmpty()
        ref_steps.append((np.array(ref.global_map), np.array(r_pos_fts),
                          int(r_target), float(ref.max_x), float(ref.min_x)))

    # ---- our pipeline (exactly what data/pretrain_data.get_input runs) ----
    from gridmm_tpu.env.world import _depth_to_patches

    state = G.PointCloudState.create(1, gc, max_points=588 * len(path))
    for t, vp in enumerate(path):
        patches = _depth_to_patches(depth_tbl[f"scanX_{vp}"]).astype(
            np.float32)
        fts = sem_tbl[f"scanX_{vp}"][:, 1:].reshape(-1, 768)
        x, y, _ = positions[vp]
        state = G.append_panorama(
            state, jnp.asarray(patches[None]), jnp.asarray(fts[None]),
            jnp.asarray([[x, y]], jnp.float32), gc,
            headings=jnp.asarray([headings[t]], jnp.float32))
        cells, half_len, pos_fts = G.egocentric_grid_assignment(
            state, jnp.asarray([[x, y]], jnp.float32),
            jnp.asarray([headings[t]], jnp.float32), gc)

        r_map, r_pos, r_target, r_max_x, r_min_x = ref_steps[t]
        n = 588 * (t + 1)
        ours_cells = np.asarray(cells[0])
        # every accumulated point gets the identical cell id (or -1 for the
        # zero-depth holes); untouched buffer tail stays -1
        np.testing.assert_array_equal(ours_cells[:n],
                                      r_map.astype(np.int32), err_msg=f"t={t}")
        assert (ours_cells[n:] == -1).all()
        np.testing.assert_allclose(np.asarray(pos_fts[0]), r_pos, atol=2e-5,
                                   err_msg=f"pos_fts t={t}")
        # window extents: reference's running max/min must equal the implied
        # half_len = window_scale * max(|pos-extent|) used on our side
        x_half = max(x - r_min_x, r_max_x - x)
        assert float(half_len[0]) > 0
        # SAP grid target for the next GT node (dataset.py:422-439)
        if t + 1 < len(path):
            nx, ny, _ = positions[path[t + 1]]
            ours_t = int(G.target_cell_id(
                jnp.float32(nx), jnp.float32(ny), jnp.float32(x),
                jnp.float32(y), jnp.float32(headings[t]), half_len[0]))
        else:
            ours_t = 0
        assert ours_t == r_target, f"target t={t}: {ours_t} vs {r_target}"


# ===========================================================================
# CE model oracle (V4): the real VLN_CE gridmap GlocalTextPathNavCMT
# (vlnce_baselines/models/gridmap/vilmodel.py:624-800) executes
# forward_navigation_per_step; our navigator + ce_action_logits must
# reproduce its fused = global+local CE action head. The reference's CE
# traj-gmap leads with [stop]+candidates then the trajectory nodes; ours
# keeps [stop]+visited-chain+frontier-waypoints — per-node embeddings are
# placed by each side's layout and masked attention is permutation-
# equivariant, so the action logits must agree.
# ===========================================================================

def test_ref_oracle_ce_navigation():
    import types

    require_reference()
    from ref_oracle import load_ref_package_dir

    vm = load_ref_package_dir("VLN_CE/vlnce_baselines/models/gridmap",
                              "ce_gridmap", "vilmodel")
    # neuter the in-model perception towers (CLIP p32 + timm ViT): they are
    # not touched by forward_navigation_per_step
    vm.timm = types.SimpleNamespace(
        create_model=lambda *a, **k: torch.nn.Identity())
    vm.CLIP = lambda **kw: torch.nn.Identity()
    torch.manual_seed(31)
    ref = vm.GlocalTextPathNavCMT(nav_bert_config(
        num_l_layers=NL, num_x_layers=NX, num_pano_layers=NP, heads=HEADS,
        intermediate=INTER, image_feat_size=IMG_FEAT, angle_feat_size=ANGLE,
        vocab=VOCAB)).eval()

    # ---- import into our navigator (same key space minus og_head) ----
    from gridmm_tpu.config import NavigatorShapes
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.utils import checkpoint as CK

    model = GridMMNavigator(_our_model_cfg())
    shapes = NavigatorShapes(max_txt_len=10, max_gmap_len=8, max_vp_len=7,
                             max_points=120)
    params = init_navigator(model, shapes, jax.random.PRNGKey(0))
    loaded, report = CK.import_torch_navigator(
        ref.state_dict(), params, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP)
    assert report["unused_torch_keys"] == []
    assert report["unfilled_flax_leaves"] == []

    # ---- dual-layout synthetic step ----
    rng = np.random.default_rng(31)
    B, T, V, N = 2, 10, 7, 120
    G_OURS = 8
    n_cands = [3, 2]
    n_traj = [2, 3]
    cand_lens = [c + 1 for c in n_cands]   # [stop]+cands (Policy naming)
    maxC = max(cand_lens)
    GREF = max(1 + c + t for c, t in zip(n_cands, n_traj))

    txt = rng.standard_normal((B, T, HID)).astype(np.float32) * 0.3
    txt_mask = np.zeros((B, T), bool)
    txt_mask[0, :8] = True
    txt_mask[1, :10] = True

    # per-node random attributes (embed, step_id, pos_ft)
    node_emb = rng.standard_normal((B, 8, HID)).astype(np.float32) * 0.3
    node_pos = rng.standard_normal((B, 8, ANGLE + 3)).astype(np.float32) * 0.3

    r_gmap = np.zeros((B, GREF, HID), np.float32)
    r_step = np.zeros((B, GREF), np.int64)
    r_pos = np.zeros((B, GREF, ANGLE + 3), np.float32)
    r_mask = np.zeros((B, GREF), bool)
    o_gmap = np.zeros((B, G_OURS, HID), np.float32)
    o_step = np.zeros((B, G_OURS), np.int32)
    o_pos = np.zeros((B, G_OURS, ANGLE + 3), np.float32)
    o_mask = np.zeros((B, G_OURS), bool)
    o_visited = np.zeros((B, G_OURS), bool)
    cand_gmap_idx = np.full((B, V - 1), -1, np.int32)
    for i in range(B):
        r_mask[i, 0] = o_mask[i, 0] = True  # [stop] zero embed both sides
        # candidates: reference cols 1..n_cands, ours frontier after chain
        for j in range(n_cands[i]):
            emb, pos = node_emb[i, j], node_pos[i, j]
            sid = n_traj[i] + 1
            rcol = 1 + j
            ocol = n_traj[i] + 1 + j
            r_gmap[i, rcol], r_pos[i, rcol], r_step[i, rcol] = emb, pos, sid
            r_mask[i, rcol] = True
            o_gmap[i, ocol], o_pos[i, ocol], o_step[i, ocol] = emb, pos, sid
            o_mask[i, ocol] = True
            cand_gmap_idx[i, j] = ocol
        # trajectory nodes: reference appends them reversed after candidates
        # (Policy:549-560), ours keeps the chronological chain at slots 1..
        for j in range(n_traj[i]):
            emb, pos = node_emb[i, 4 + j], node_pos[i, 4 + j]
            sid = j + 1
            rcol = 1 + n_cands[i] + (n_traj[i] - 1 - j)
            ocol = 1 + j
            r_gmap[i, rcol], r_pos[i, rcol], r_step[i, rcol] = emb, pos, sid
            r_mask[i, rcol] = True
            o_gmap[i, ocol], o_pos[i, ocol], o_step[i, ocol] = emb, pos, sid
            o_mask[i, ocol] = True
            o_visited[i, ocol] = True

    # vp tokens: [stop] + pano tokens; nav mask = [stop]+candidates
    vp_img = rng.standard_normal((B, V, HID)).astype(np.float32) * 0.3
    vp_img[:, 0] = 0.0
    vp_pos = rng.standard_normal((B, V, 2 * ANGLE + 6)).astype(np.float32) * 0.3
    vp_mask = np.zeros((B, V), bool)
    vp_mask[0, :6] = True
    vp_mask[1, :5] = True
    vp_nav = np.zeros((B, V), bool)
    for i in range(B):
        vp_nav[i, 0] = True
        vp_nav[i, 1:1 + n_cands[i]] = True

    grid_fts = rng.standard_normal((B, N, IMG_FEAT)).astype(np.float32) * 0.4
    grid_cells = np.where(rng.random((B, N)) < 0.2, -1,
                          rng.integers(0, CELLS, (B, N))).astype(np.int32)
    grid_pos = rng.standard_normal((B, CELLS, 5)).astype(np.float32) * 0.2

    with torch.no_grad():
        r_fused = ref.forward_navigation_per_step(
            torch.from_numpy(txt), torch.from_numpy(txt_mask),
            torch.from_numpy(r_gmap), torch.from_numpy(r_step),
            torch.from_numpy(r_pos), torch.from_numpy(r_mask),
            torch.from_numpy(vp_img), torch.from_numpy(vp_pos),
            torch.from_numpy(vp_mask), torch.from_numpy(vp_nav),
            [torch.from_numpy(grid_fts[i]) for i in range(B)],
            [torch.from_numpy(grid_cells[i].astype(np.int64))
             for i in range(B)],
            torch.from_numpy(grid_pos), cand_lens)

    out = model.apply(
        loaded, "navigation", {
            "txt_embeds": jnp.asarray(txt), "txt_mask": jnp.asarray(txt_mask),
            "gmap_img_embeds": jnp.asarray(o_gmap),
            "gmap_step_ids": jnp.asarray(o_step),
            "gmap_pos_fts": jnp.asarray(o_pos),
            "gmap_mask": jnp.asarray(o_mask),
            "gmap_visited_mask": jnp.asarray(o_visited),
            "vp_img_embeds": jnp.asarray(vp_img),
            "vp_pos_fts": jnp.asarray(vp_pos),
            "vp_mask": jnp.asarray(vp_mask),
            "vp_nav_mask": jnp.asarray(vp_nav),
            "grid_fts": jnp.asarray(grid_fts),
            "grid_cells": jnp.asarray(grid_cells),
            "gridmap_pos_fts": jnp.asarray(grid_pos),
            "fused_add_idx": jnp.full((B, G_OURS), -2, jnp.int32),
            "cand_backtrack_mask": jnp.zeros((B, V), bool),
            "txt_relevance_mask": None,
        })
    from gridmm_tpu.ce.device_step import ce_action_logits
    ours = np.asarray(ce_action_logits(
        out.global_logits, out.local_logits,
        jnp.asarray(cand_gmap_idx)))[:, :maxC]

    want = r_fused.numpy()
    assert want.shape == (B, maxC)
    finite = np.isfinite(want)
    np.testing.assert_array_equal(np.isfinite(ours), finite)
    # the two sides place gmap tokens in different slot orders (reference:
    # [stop]+cands+reversed-traj, ours: [stop]+chain+frontier); masked
    # attention is permutation-equivariant but f32 softmax/LayerNorm
    # accumulation order is not, which bounds agreement near ~1e-3 at 768
    # width (the same-ordering discrete oracle above holds 5e-4)
    np.testing.assert_allclose(ours[finite], want[finite], atol=3e-3)


# ===========================================================================
def test_ref_oracle_waypoint_nms():
    """The real waypoint NMS (VLN_CE/waypoint_prediction/utils.py:37-64)
    through the Policy's wrap-pad call site (Policy_ViewSelection_GridMap.py
    :373-384) vs our waypoint_nms — bit-exact kept-peak maps on random
    softmax heatmaps plus engineered boundary/wrap/fractional-center cases.
    Pins the three reference quirks: fractional y_mu from torch true
    division, one-sided circular distance wrap, pad-row duplicate capture."""
    require_reference()
    wutils = load_ref_module("VLN_CE", "waypoint_prediction.utils")
    import jax.numpy as jnp

    from gridmm_tpu.models.waypoint import waypoint_nms

    def ref_nms(hm, mp=5, sigma=(7.0, 5.0)):
        t = torch.from_numpy(hm)
        wrap = torch.cat((t[:, -1:, :], t, t[:, :1, :]), dim=1)
        out = wutils.nms(wrap.unsqueeze(1), max_predictions=mp, sigma=sigma)
        return out.squeeze(1)[:, 1:-1, :].numpy()

    rng = np.random.default_rng(31)
    A, D = 120, 12
    logits = rng.normal(size=(16, A * D)).astype(np.float32) * 3
    probs = torch.softmax(torch.from_numpy(logits), dim=1).reshape(
        16, A, D).numpy()
    np.testing.assert_array_equal(
        ref_nms(probs),
        np.asarray(waypoint_nms(jnp.asarray(probs), max_predictions=5,
                                sigma=(7.0, 5.0))))

    eng = np.zeros((4, A, D), np.float32)
    eng[0, 0, 5], eng[0, 118, 5] = 3.0, 2.5       # pad-row duplicate
    eng[1, 50, 11], eng[1, 50, 1] = 3.0, 2.5      # one-sided distance wrap
    eng[2, 50, 6], eng[2, 46, 6], eng[2, 54, 6] = 3.0, 2.5, 2.0  # frac y_mu
    eng[3, 119, 0], eng[3, 2, 3] = 3.0, 2.5       # boundary + near-dist
    for mp in (2, 5):
        np.testing.assert_array_equal(
            ref_nms(eng, mp=mp, sigma=(4.0, 4.0)),
            np.asarray(waypoint_nms(jnp.asarray(eng), max_predictions=mp,
                                    sigma=(4.0, 4.0))))


# ===========================================================================
# Waypoint-predictor oracle (V5): the real BinaryDistPredictor_TRM /
# DepthDistPredictor_TRM (VLN_CE/waypoint_prediction/TRM_net.py:9-164) at
# FULL released dims with seeded weights, state_dict through
# import_torch_waypoint, vs our WaypointPredictor — heatmap logits including
# the neighbor attention mask and the HEATMAP_OFFSET roll.
# ===========================================================================

@pytest.mark.parametrize("use_rgb", [True, False])
def test_ref_oracle_waypoint_predictor(use_rgb):
    require_reference()
    trm = load_ref_module("VLN_CE", "waypoint_prediction.TRM_net")
    from gridmm_tpu.models.waypoint import WaypointConfig, WaypointPredictor
    from gridmm_tpu.utils import checkpoint as CK

    torch.manual_seed(41)
    if use_rgb:
        ref = trm.BinaryDistPredictor_TRM(device="cpu").eval()
    else:
        ref = trm.DepthDistPredictor_TRM(device="cpu").eval()

    B = 2
    rgb = torch.randn(B * 12, 2048, 7, 7) * 0.2
    depth = torch.randn(B * 12, 128, 4, 4) * 0.2
    with torch.no_grad():
        want = ref(rgb, depth).numpy()

    fm = WaypointPredictor(WaypointConfig(use_rgb=use_rgb))
    rgb_flat = jnp.asarray(rgb.reshape(B * 12, -1).numpy())
    depth_flat = jnp.asarray(depth.reshape(B * 12, -1).numpy())
    params = fm.init(jax.random.PRNGKey(0),
                     rgb_flat if use_rgb else None, depth_flat)
    loaded, report = CK.import_torch_waypoint(
        ref.state_dict(), params, num_layers=2, use_rgb=use_rgb)
    assert report["unfilled_flax_leaves"] == []
    if use_rgb:
        assert report["unused_torch_keys"] == []
    else:
        # the depth-only model constructs visual_merge + mergefeats_LayerNorm
        # but its forward never applies them (TRM_net.py:139-147) — dead
        # weights in the reference too
        assert all(k.startswith(("visual_merge.", "mergefeats_LayerNorm."))
                   for k in report["unused_torch_keys"])
    got = np.asarray(fm.apply(loaded, rgb_flat if use_rgb else None,
                              depth_flat))
    assert got.shape == want.shape == (B, 120, 12)
    np.testing.assert_allclose(got, want, atol=5e-4)


# ===========================================================================
# Topological-map oracle (M11): the real GraphMap/FloydGraph
# (map_nav_src/models/graph_utils.py) drives the same random exploration as
# env/graph.TopoMap — incremental Floyd-Warshall distances, path hop counts,
# visited bookkeeping, and the 7-dim rel-pos features.
# ===========================================================================

def test_ref_oracle_graph_map():
    require_reference()
    gu = load_ref_module("map_nav_src", "models.graph_utils")
    from gridmm_tpu.env.graph import TopoMap

    rng = np.random.default_rng(17)
    n = 10
    names = [f"v{i}" for i in range(n)]
    pos = {v: tuple(rng.random(3) * 12) for v in names}
    # random connected-ish neighbor sets
    nbrs = {v: sorted(rng.choice([w for w in names if w != v],
                                 size=3, replace=False))
            for v in names}

    ref = gu.GraphMap("v0")
    ours = TopoMap("v0")
    walk = ["v0"]
    for _ in range(5):
        walk.append(str(rng.choice(nbrs[walk[-1]])))

    for vp in walk:
        ob = {"viewpoint": vp, "position": pos[vp],
              "candidate": [{"viewpointId": c, "position": pos[c]}
                            for c in nbrs[vp]]}
        ref.update_graph(ob)
        ours.update(vp, pos[vp], [(c, pos[c]) for c in nbrs[vp]])

    seen = sorted(ref.node_positions)
    assert seen == sorted(ours.node_positions)
    for x in seen:
        assert ref.graph.visited(x) == ours.graph.visited(x)
        for y in seen:
            rd = ref.graph.distance(x, y)
            od = ours.graph.distance(x, y)
            if rd >= 95959595:  # reference's unreachable sentinel
                assert od == float("inf") or od >= 1e8
            else:
                np.testing.assert_allclose(od, rd, atol=1e-9)
                assert len(ours.graph.path(x, y)) == len(ref.graph.path(x, y))

    # 7-dim rel-pos features vs get_pos_fts over [None]+nodes
    cur = walk[-1]
    vpids = [None] + seen
    want = ref.get_pos_fts(cur, vpids, 0.7, 0.0, 4)
    got = ours.pos_features(cur, vpids, 0.7, 0.0, 4)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


# ===========================================================================
# REVERIE/SOON object-variant oracle: the real navigator with obj_feat_size>0
# (obj_linear/obj_layer_norm path, vilmodel.py:500-509/745-760, og_head
# :903-907) — panorama with object tokens and object-grounding logits.
# ===========================================================================

def test_ref_oracle_navigator_objects():
    require_reference()
    vm = load_ref_module("map_nav_src", "models.vilmodel")
    from gridmm_tpu.config import NavigatorShapes
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.utils import checkpoint as CK

    OBJ_FEAT = 10
    torch.manual_seed(51)
    ref = vm.GlocalTextPathNavCMT(nav_bert_config(
        num_l_layers=NL, num_x_layers=NX, num_pano_layers=NP, heads=HEADS,
        intermediate=INTER, image_feat_size=IMG_FEAT, angle_feat_size=ANGLE,
        vocab=VOCAB, obj_feat_size=OBJ_FEAT)).eval()

    model = GridMMNavigator(_our_model_cfg(obj_feat_size=OBJ_FEAT))
    shapes = NavigatorShapes(max_txt_len=12, max_gmap_len=8, max_vp_len=8,
                             max_points=120, max_obj_len=2)
    params = init_navigator(model, shapes, jax.random.PRNGKey(0))
    loaded, report = CK.import_torch_navigator(
        ref.state_dict(), params, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP, has_obj=True)
    assert report["unused_torch_keys"] == []
    assert report["unfilled_flax_leaves"] == []

    # ---- panorama with object tokens (views at full width so the compact
    # reference layout coincides with ours; objs ragged) ----
    torch.manual_seed(52)
    B, LV, LO = 2, 5, 2
    view = torch.randn(B, LV, IMG_FEAT) * 0.4
    obj = torch.randn(B, LO, OBJ_FEAT) * 0.4
    loc = torch.randn(B, LV + LO, ANGLE + 3) * 0.3
    nav_types = torch.cat([torch.randint(0, 2, (B, LV)),
                           torch.full((B, LO), 2)], 1)
    view_lens = torch.tensor([LV, LV])
    obj_lens = torch.tensor([2, 1])
    with torch.no_grad():
        r_pano, r_masks = ref.forward_panorama_per_step(
            view, obj, loc, nav_types, view_lens, obj_lens)

    tok_mask = np.zeros((B, LV + LO), bool)
    for i in range(B):
        tok_mask[i, :LV + int(obj_lens[i])] = True
    # our compact layout matches because view_lens are full-width; objs pad
    # at the tail under the mask. item1's single obj sits at reference col
    # LV (compact) == our col LV; our col LV+1 is masked padding.
    o_pano, _ = model.apply(
        loaded, "panorama",
        {"view_img_fts": jnp.asarray(view.numpy()),
         "obj_img_fts": jnp.asarray(obj.numpy()),
         "loc_fts": jnp.asarray(loc.numpy()),
         "nav_types": jnp.asarray(nav_types.numpy().astype(np.int32)),
         "view_mask": jnp.asarray(tok_mask)})
    o_pano = np.asarray(o_pano)
    np.testing.assert_array_equal(r_masks.numpy(), tok_mask)
    np.testing.assert_allclose(o_pano[tok_mask],
                               r_pano.numpy()[tok_mask], atol=2e-4)

    # ---- navigation with object-grounding logits ----
    rng = np.random.default_rng(53)
    T, G, V, N = 12, 8, 8, 120
    txt = torch.randn(B, T, HID) * 0.3
    txt_mask = torch.ones(B, T, dtype=torch.bool)
    gmap_img = torch.randn(B, G, HID) * 0.3
    gmap_step_ids = torch.randint(0, 5, (B, G))
    gmap_pos = torch.randn(B, G, ANGLE + 3) * 0.3
    gmap_mask = torch.ones(B, G, dtype=torch.bool)
    gmap_visited = torch.zeros(B, G, dtype=torch.bool)
    gmap_visited[:, 1:3] = True
    gmap_vpids = [[None, "v1", "v2", "u3", "u4", "u5", "u6", "u7"]] * B
    cand_vpids = [[None, "u3", "v1"]] * B
    vp_img = torch.randn(B, V, HID) * 0.3
    vp_pos = torch.randn(B, V, 2 * ANGLE + 6) * 0.3
    vp_mask = torch.ones(B, V, dtype=torch.bool)
    vp_nav_mask = torch.zeros(B, V, dtype=torch.bool)
    vp_nav_mask[:, :3] = True
    vp_obj_mask = torch.zeros(B, V, dtype=torch.bool)
    vp_obj_mask[:, 6:8] = True  # object tokens at the pano tail + [stop] offs
    grid_fts = [torch.randn(N, IMG_FEAT) * 0.4 for _ in range(B)]
    grid_map = [torch.tensor(np.where(rng.random(N) < 0.2, -1,
                                      rng.integers(0, CELLS, N)).astype(
        np.int64)) for _ in range(B)]
    gridmap_pos_fts = torch.randn(B, CELLS, 5) * 0.2

    with torch.no_grad():
        outs = ref.forward_navigation_per_step(
            txt, txt_mask, gmap_img, gmap_step_ids, gmap_pos, gmap_mask,
            torch.zeros(B, G, G), gmap_visited, gmap_vpids,
            vp_img, vp_pos, vp_mask, vp_nav_mask, vp_obj_mask, cand_vpids,
            grid_fts, grid_map, gridmap_pos_fts)

    fused_add_idx = np.full((B, G), -2, np.int32)
    fused_add_idx[:, 3] = 1
    fused_add_idx[:, 4:] = -1
    cand_backtrack = np.zeros((B, V), bool)
    cand_backtrack[:, 2] = True  # v1 visited

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
            "vp_obj_mask": jnp.asarray(vp_obj_mask.numpy()),
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
    cmp("fused", out.fused_logits, outs["fused_logits"])
    cmp("obj", out.obj_logits, outs["obj_logits"])


def test_ref_oracle_compaction_stray_keys(ref_navigator, our_loaded):
    """The reference's compaction loop mutates grid_masks[b] through an
    aliased view (vilmodel.py:816-820), leaving zero-embedding rows
    attendable for items with fewer occupied cells than the batch max. Cell
    occupancy here is engineered so item 0 carries EXACTLY 5 stray keys
    (occupied at 10..19 and 25..34: cnt=20, K=10, window [20,30) holds 5
    ones) while item 1 (60 cells at 0..59) sets max_cell_num — our
    log(count)-bias zero token must reproduce the reference bit-for-bit
    (same token ordering, so only generic f32 noise remains)."""
    model, loaded = our_loaded
    from gridmm_tpu.ops.masking import compaction_stray_count

    torch.manual_seed(61)
    rng = np.random.default_rng(61)
    B, T, G, V, N = 2, 12, 8, 7, 120

    # engineered occupancy
    occ0 = list(range(10, 20)) + list(range(25, 35))
    occ1 = list(range(60))
    cells0 = np.asarray([occ0[i % len(occ0)] for i in range(N)], np.int64)
    cells1 = np.asarray([occ1[i % len(occ1)] for i in range(N)], np.int64)
    cell_mask = np.zeros((B, CELLS), bool)
    cell_mask[0, occ0] = True
    cell_mask[1, occ1] = True
    stray = np.asarray(compaction_stray_count(jnp.asarray(cell_mask)))
    np.testing.assert_array_equal(stray, [5, 0])

    txt = torch.randn(B, T, HID) * 0.3
    txt_mask = torch.ones(B, T, dtype=torch.bool)
    gmap_img = torch.randn(B, G, HID) * 0.3
    gmap_step_ids = torch.randint(0, 5, (B, G))
    gmap_pos = torch.randn(B, G, ANGLE + 3) * 0.3
    gmap_mask = torch.ones(B, G, dtype=torch.bool)
    gmap_visited = torch.zeros(B, G, dtype=torch.bool)
    gmap_visited[:, 1:3] = True
    gmap_vpids = [[None, "v1", "v2", "u3", "u4", "u5", "u6", "u7"]] * B
    cand_vpids = [[None, "u3", "v1"]] * B
    vp_img = torch.randn(B, V, HID) * 0.3
    vp_pos = torch.randn(B, V, 2 * ANGLE + 6) * 0.3
    vp_mask = torch.ones(B, V, dtype=torch.bool)
    vp_nav_mask = torch.zeros(B, V, dtype=torch.bool)
    vp_nav_mask[:, :3] = True
    grid_fts = [torch.randn(N, IMG_FEAT) * 0.4 for _ in range(B)]
    grid_map = [torch.from_numpy(cells0), torch.from_numpy(cells1)]
    gridmap_pos_fts = torch.randn(B, CELLS, 5) * 0.2

    with torch.no_grad():
        outs = ref_navigator.forward_navigation_per_step(
            txt, txt_mask, gmap_img, gmap_step_ids, gmap_pos, gmap_mask,
            torch.zeros(B, G, G), gmap_visited, gmap_vpids,
            vp_img, vp_pos, vp_mask, vp_nav_mask, None, cand_vpids,
            grid_fts, grid_map, gridmap_pos_fts)

    fused_add_idx = np.full((B, G), -2, np.int32)
    fused_add_idx[:, 3] = 1
    fused_add_idx[:, 4:] = -1
    cand_backtrack = np.zeros((B, V), bool)
    cand_backtrack[:, 2] = True

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
            "txt_relevance_mask": None,
        })

    for name, key in (("global", "global_logits"), ("local", "local_logits"),
                      ("grid", "grid_logits"), ("fused", "fused_logits")):
        ours, theirs = np.asarray(getattr(out, key)), outs[key].numpy()
        finite = np.isfinite(theirs)
        np.testing.assert_array_equal(np.isfinite(ours), finite, err_msg=name)
        np.testing.assert_allclose(ours[finite], theirs[finite], atol=5e-4,
                                   err_msg=name)
