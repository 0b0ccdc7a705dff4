"""Full-forward parity: the navigation step vs a torch replica.

Builds the reference's forward_navigation_per_step (vilmodel.py:782-918) from
torch primitives — including the per-cell python pooling loop and the
dict-based graph-aware logit fusion — exports its state_dict through the
checkpoint importer, and compares every output of our jitted navigator. This
is the end-to-end evidence that released reference checkpoints will reproduce
decisions (the only parts not covered are the language/pano encoders, which
have their own parity tests)."""

import math
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gridmm_tpu.config import ModelConfig  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, dummy_batches  # noqa: E402
from gridmm_tpu.utils import checkpoint as CK  # noqa: E402

H, HEADS, INTER = 64, 4, 128
NXL = 2  # x-layers
CELLS = 196


# ---------------------------------------------------------------- torch bits
class TSelfAttn(tnn.Module):
    def __init__(self):
        super().__init__()
        self.query = tnn.Linear(H, H)
        self.key = tnn.Linear(H, H)
        self.value = tnn.Linear(H, H)

    def forward(self, x, bias, kv=None):
        kv = x if kv is None else kv
        b, lq, _ = x.shape
        lk = kv.shape[1]
        hd = H // HEADS

        def split(t, l):
            return t.view(b, l, HEADS, hd).permute(0, 2, 1, 3)

        q = split(self.query(x), lq)
        k = split(self.key(kv), lk)
        v = split(self.value(kv), lk)
        s = q @ k.transpose(-1, -2) / math.sqrt(hd)
        if bias is not None:
            s = s + bias
        p = torch.softmax(s, -1)
        return (p @ v).permute(0, 2, 1, 3).reshape(b, lq, H)


class TAttnOut(tnn.Module):
    def __init__(self):
        super().__init__()
        self.dense = tnn.Linear(H, H)
        self.LayerNorm = tnn.LayerNorm(H, eps=1e-12)

    def forward(self, x, res):
        return self.LayerNorm(self.dense(x) + res)


class TBertAttention(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self = TSelfAttn()
        self.output = TAttnOut()

    def forward(self, x, bias):
        return self.output(self.self(x, bias), x)


class TXAttention(tnn.Module):
    """BertXAttention: att(q=x, kv=ctx) + output."""

    def __init__(self):
        super().__init__()
        self.att = TSelfAttn()
        self.output = TAttnOut()

    def forward(self, x, ctx, ctx_bias):
        return self.output(self.att(x, ctx_bias, kv=ctx), x)


class TFFNPart(tnn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.dense = tnn.Linear(din, dout)


class TXLayer(tnn.Module):
    """GraphLXRTXLayer visn path."""

    def __init__(self):
        super().__init__()
        self.visual_attention = TXAttention()
        self.visn_self_att = TBertAttention()
        self.visn_inter = TFFNPart(H, INTER)
        self.visn_output = tnn.Module()
        self.visn_output.dense = tnn.Linear(INTER, H)
        self.visn_output.LayerNorm = tnn.LayerNorm(H, eps=1e-12)

    def forward(self, lang, lang_bias, visn, visn_bias):
        x = self.visual_attention(visn, lang, lang_bias)
        x = self.visn_self_att(x, visn_bias)
        h = torch.nn.functional.gelu(self.visn_inter.dense(x))
        return self.visn_output.LayerNorm(self.visn_output.dense(h) + x)


class TClsHead(tnn.Module):
    def __init__(self, din=H):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Linear(din, H), tnn.ReLU(), tnn.LayerNorm(H, eps=1e-12),
            tnn.Linear(H, 1))

    def forward(self, x):
        return self.net(x)


class TorchNavigator(tnn.Module):
    """State-dict-compatible replica of the navigation-step parameter set."""

    def __init__(self):
        super().__init__()
        self.text_proj = tnn.Linear(H, H)
        self.grid_proj = tnn.Linear(H, H)
        self.grid_pos_embeddings = tnn.Sequential(
            tnn.Linear(5, H), tnn.LayerNorm(H, eps=1e-12))

        class GE(tnn.Module):  # global_encoder
            def __init__(self):
                super().__init__()
                self.gmap_pos_embeddings = tnn.Sequential(
                    tnn.Linear(7, H), tnn.LayerNorm(H, eps=1e-12))
                self.gmap_step_embeddings = tnn.Embedding(100, H)

        self.global_encoder = GE()

        class LE(tnn.Module):  # local_encoder
            def __init__(self):
                super().__init__()
                self.vp_pos_embeddings = tnn.Sequential(
                    tnn.Linear(14, H), tnn.LayerNorm(H, eps=1e-12))

                class Enc(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.x_layers = tnn.ModuleList(
                            [TXLayer() for _ in range(NXL)])

                self.encoder = Enc()

        self.local_encoder = LE()

        class GridEnc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.layers = tnn.ModuleList([tnn.TransformerEncoderLayer(
                    H, HEADS, dim_feedforward=INTER, dropout=0.0,
                    activation="gelu", batch_first=True, norm_first=True)])
                self.norm = tnn.LayerNorm(H, eps=1e-12)

        self.grid_encoder = GridEnc()

        class GridTxtEnc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.x_layers = tnn.ModuleList([TXLayer()])

        self.grid_txt_encoder = GridTxtEnc()
        self.global_sap_head = TClsHead()
        self.local_sap_head = TClsHead()
        self.grid_sap_head = TClsHead()
        self.sap_fuse_linear = TClsHead(H * 2)

    @staticmethod
    def _neg(mask):  # (B, L) bool -> additive -10000
        return ((1.0 - mask.float()) * -10000.0)[:, None, None, :]

    def forward(self, txt, txt_mask, gmap_img, gmap_step_ids, gmap_pos,
                gmap_mask, gmap_visited, gmap_vpids,
                vp_img, vp_pos, vp_mask, vp_nav_mask, cand_vpids,
                grid_fts, grid_map, gridmap_pos_fts):
        """vilmodel.py:782-918, faithful loops included."""
        bsz = len(grid_fts)
        grid_map_input = torch.zeros(bsz, CELLS, H)
        text_fts = self.text_proj(txt).permute(0, 2, 1)
        grid_masks = torch.zeros(bsz, CELLS)
        for b in range(bsz):
            fts = grid_fts[b]
            w = (fts @ text_fts[b]).max(dim=-1)[0]
            proj = self.grid_proj(fts)
            for i in range(CELLS):
                sel = grid_map[b] == i
                if sel.sum() == 0:
                    continue
                grid_masks[b, i] = 1
                sm = torch.softmax(w[sel], dim=-1).unsqueeze(-1)
                grid_map_input[b, i] = (proj[sel] * sm).sum(-2)
        grid_map_input = grid_map_input + self.grid_pos_embeddings(
            gridmap_pos_fts)
        grid_masks_b = grid_masks.bool()

        gmap_embeds = (gmap_img
                       + self.global_encoder.gmap_step_embeddings(gmap_step_ids)
                       + self.global_encoder.gmap_pos_embeddings(gmap_pos))
        vp_embeds = vp_img + self.local_encoder.vp_pos_embeddings(vp_pos)

        map_embeds = torch.cat([grid_map_input, gmap_embeds], 1)
        map_masks = torch.cat([grid_masks_b, gmap_mask], 1)
        map_embeds = self.grid_encoder.norm(self.grid_encoder.layers[0](
            map_embeds, src_key_padding_mask=~map_masks))
        mm_bias = self._neg(map_masks)
        txt_bias = self._neg(txt_mask)
        map_embeds = self.grid_txt_encoder.x_layers[0](
            txt, txt_bias, map_embeds, mm_bias)
        gmap_out = map_embeds[:, CELLS:]

        kv = torch.cat([map_embeds, txt], 1)
        kv_mask = torch.cat([map_masks, txt_mask], 1)
        q = torch.cat([gmap_out, vp_embeds], 1)
        q_mask = torch.cat([gmap_mask, vp_mask], 1)
        kv_bias = self._neg(kv_mask)
        q_bias = self._neg(q_mask)
        for layer in self.local_encoder.encoder.x_layers:
            q = layer(kv, kv_bias, q, q_bias)
        g_len = gmap_mask.shape[1]
        gmap_out, vp_out = q[:, :g_len], q[:, g_len:]

        fuse = torch.sigmoid(self.sap_fuse_linear(
            torch.cat([gmap_out[:, 0], vp_out[:, 0]], 1)))
        global_logits = self.global_sap_head(gmap_out).squeeze(2) * fuse
        global_logits.masked_fill_(gmap_visited, -float("inf"))
        global_logits.masked_fill_(~gmap_mask, -float("inf"))
        grid_logits = self.grid_sap_head(map_embeds[:, CELLS:]).squeeze(2)
        grid_logits.masked_fill_(gmap_visited, -float("inf"))
        grid_logits.masked_fill_(~gmap_mask, -float("inf"))
        local_logits = self.local_sap_head(vp_out).squeeze(2) * (1 - fuse)
        local_logits.masked_fill_(~vp_nav_mask, -float("inf"))

        fused = global_logits.clone()
        fused[:, 0] += local_logits[:, 0]
        for i in range(bsz):
            visited = set(v for v, m in zip(gmap_vpids[i], gmap_visited[i])
                          if m)
            tmp, bw = {}, 0
            for j, cand in enumerate(cand_vpids[i]):
                if j > 0 and cand is not None:
                    if cand in visited:
                        bw = bw + local_logits[i, j]
                    else:
                        tmp[cand] = local_logits[i, j]
            for j, vp in enumerate(gmap_vpids[i]):
                if j > 0 and vp is not None and vp not in visited:
                    fused[i, j] = fused[i, j] + (
                        tmp[vp] if vp in tmp else bw)
        return global_logits, local_logits, fused, grid_logits


def test_full_navigation_parity():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B, T, G, V, N = 2, 6, 8, 7, 120

    tm = TorchNavigator().eval()

    # --- synthetic structured inputs ---
    txt = torch.randn(B, T, H) * 0.3
    txt_mask = torch.zeros(B, T, dtype=torch.bool)
    txt_mask[0, :5] = True
    txt_mask[1, :6] = True
    gmap_img = torch.randn(B, G, H) * 0.3
    gmap_step_ids = torch.randint(0, 5, (B, G))
    gmap_pos = torch.randn(B, G, 7) * 0.3
    gmap_mask = torch.zeros(B, G, dtype=torch.bool)
    gmap_mask[:, :6] = True
    gmap_visited = torch.zeros(B, G, dtype=torch.bool)
    gmap_visited[:, 1:3] = True
    # vpids: visited v1,v2; unvisited u3 (a candidate), u4, u5 (not candidates)
    gmap_vpids = [[None, "v1", "v2", "u3", "u4", "u5", None, None]] * B
    vp_img = torch.randn(B, V, H) * 0.3
    vp_pos = torch.randn(B, V, 14) * 0.3
    vp_mask = torch.ones(B, V, dtype=torch.bool)
    vp_nav_mask = torch.zeros(B, V, dtype=torch.bool)
    vp_nav_mask[:, :4] = True  # stop + 3 candidates
    cand_vpids = [[None, "u3", "v1", "x9"]] * B  # cand->unvisited/visited/offgraph

    grid_fts = [torch.randn(N, H) * 0.4 for _ in range(B)]
    grid_map = [torch.tensor(
        np.where(rng.random(N) < 0.2, -1,
                 rng.integers(0, CELLS, N)).astype(np.int64)) for _ in range(B)]
    gridmap_pos_fts = torch.randn(B, CELLS, 5) * 0.2

    with torch.no_grad():
        tg, tl, tf, tgr = tm(txt, txt_mask, gmap_img, gmap_step_ids, gmap_pos,
                             gmap_mask, gmap_visited, gmap_vpids,
                             vp_img, vp_pos, vp_mask, vp_nav_mask, cand_vpids,
                             grid_fts, grid_map, gridmap_pos_fts)

    # --- import weights into our navigator ---
    cfg = ModelConfig(hidden_size=H, num_attention_heads=HEADS,
                      intermediate_size=INTER, num_l_layers=1,
                      num_x_layers=NXL, num_pano_layers=1, image_feat_size=H,
                      vocab_size=64, max_position_embeddings=16,
                      # this replica implements the CLEAN compaction (no
                      # aliased-view stray keys); the executed-reference
                      # oracle (tests/test_reference_oracle.py) covers the
                      # stray-emulating default
                      compaction_stray_keys=False)
    model = GridMMNavigator(cfg)
    from gridmm_tpu.config import NavigatorShapes
    from gridmm_tpu.models.navigator import init_navigator

    shapes = NavigatorShapes(max_txt_len=T, max_gmap_len=G, max_vp_len=V,
                             max_points=N)
    params = init_navigator(model, shapes, jax.random.PRNGKey(0))
    loaded, report = CK.import_torch_navigator(
        tm.state_dict(), params, num_l_layers=1, num_x_layers=NXL,
        num_pano_layers=1)
    # everything present in the torch replica must have been consumed
    assert report["unused_torch_keys"] == []

    # --- index maps for the graph-aware fusion (what the agent builds) ---
    # slot u3 matches candidate 1; u4/u5 unmatched -> backtrack pool (-1)
    fused_add_idx = np.full((B, G), -2, np.int32)
    fused_add_idx[:, 3] = 1
    fused_add_idx[:, 4] = -1
    fused_add_idx[:, 5] = -1
    cand_backtrack = np.zeros((B, V), bool)
    cand_backtrack[:, 2] = True  # candidate 2 is visited v1

    out = model.apply(
        loaded, "navigation", {
            "txt_embeds": jnp.asarray(txt.numpy()),
            "txt_mask": jnp.asarray(txt_mask.numpy()),
            "gmap_img_embeds": jnp.asarray(gmap_img.numpy()),
            "gmap_step_ids": jnp.asarray(gmap_step_ids.numpy()),
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
            # the reference takes the relevance max over padded text too
            "txt_relevance_mask": None,
        })

    def cmp(name, ours, theirs, atol=3e-4):
        ours = np.asarray(ours)
        theirs = theirs.numpy()
        finite = np.isfinite(theirs)
        np.testing.assert_array_equal(np.isfinite(ours), finite, err_msg=name)
        np.testing.assert_allclose(ours[finite], theirs[finite], atol=atol,
                                   err_msg=name)

    cmp("global", out.global_logits, tg)
    cmp("local", out.local_logits, tl)
    cmp("grid", out.grid_logits, tgr)
    cmp("fused", out.fused_logits, tf)
