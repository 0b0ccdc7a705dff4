"""Trajectory-level pretraining model + proxy-task heads (MLM/MRC/SAP/OG).

Re-implements GlocalTextPathCMT (pretrain_src/model/vilmodel.py:640-854) and
GlocalTextPathCMTPreTraining (pretrain_src/model/pretrain_cmt.py:38-321) on the
shared navigator trunk.

TPU-first re-design of the trajectory encoding:
  * The reference flattens each trajectory's steps into a ragged list and pads
    per batch (vilmodel.py:470-541); here trajectories are a fixed (B, S, V)
    token grid with step/token masks.
  * The per-item python gmap aggregation loops (vilmodel.py:578-612) become
    scatter-mean over two host-precomputed index maps: `visited_idx` routes a
    visit-step's tokens to its node slot, `cand_idx` routes candidate tokens to
    frontier slots.
  * Grid pooling and the map/fusion trunk reuse GridMMNavigator.encode_grid /
    fusion_trunk; MLM uses the x-layers' lang2visn branch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gridmm_tpu.config import ModelConfig
from gridmm_tpu.models.layers import LayerNorm, _dense, ACT2FN
from gridmm_tpu.models.navigator import GridMMNavigator


class TrajectoryEncodings(NamedTuple):
    txt_embeds: jnp.ndarray     # (B, T, D)
    gmap_out: jnp.ndarray       # (B, G, D) fused gmap tokens
    vp_out: jnp.ndarray         # (B, V, D) fused last-step viewpoint tokens
    grid_gmap_out: jnp.ndarray  # (B, G, D) map-encoder gmap tokens (grid head)
    vp_mask: jnp.ndarray        # (B, V)


class RegionClassification(nn.Module):
    """linear -> ReLU -> LN -> linear(label_dim) (pretrain_cmt.py:12-22)."""

    cfg: ModelConfig
    label_dim: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = _dense(c.hidden_size, "net_0", c.dtype)(x)
        x = jax.nn.relu(x)
        x = LayerNorm(1e-12, name="net_2")(x)
        return _dense(self.label_dim, "net_3", c.dtype)(x)


class MLMHead(nn.Module):
    """BertLMPredictionHead with weights tied to the word embeddings
    (vilmodel.py:274-306, pretrain_cmt.py:68-71)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, hidden, word_embedding_table):
        c = self.cfg
        h = _dense(c.hidden_size, "transform_dense", c.dtype)(hidden)
        h = ACT2FN[c.hidden_act](h)
        h = LayerNorm(c.layer_norm_eps, name="transform_LayerNorm")(h)
        bias = self.param("bias", nn.initializers.zeros, (c.vocab_size,))
        logits = h @ word_embedding_table.T.astype(h.dtype)
        return logits + bias


class GridMMPretrain(nn.Module):
    """`bert` trunk + task heads (pretrain_cmt.py:38-66)."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.bert = GridMMNavigator(c, name="bert")
        self.mlm_head = MLMHead(c, name="mlm_head")
        self.image_classifier = RegionClassification(
            c, c.image_prob_size, name="image_classifier")
        if c.obj_prob_size > 0 and c.obj_prob_size != c.image_prob_size:
            self.obj_classifier = RegionClassification(
                c, c.obj_prob_size, name="obj_classifier")
        else:
            self.obj_classifier = None

    def _stray(self, cell_mask):
        """Compaction-alias stray keys (pretrain vilmodel.py has the same
        aliased-view compaction loop as the navigator; see
        ops/masking.compaction_stray_count)."""
        if not self.cfg.compaction_stray_keys:
            return None
        from gridmm_tpu.ops.masking import compaction_stray_count
        return compaction_stray_count(cell_mask)

    # ------------------------------------------------------------ aggregation
    @staticmethod
    def _aggregate_gmap(pano_embeds, pano_mask, visited_idx, cand_idx, g):
        """Scatter-mean trajectory tokens into gmap node slots.

        pano_embeds: (B, S, V, D); *_idx: (B, S, V) int32 slot or -1.
        Visited nodes receive their visit-step's masked token mean; frontier
        nodes the mean of their candidate-token occurrences
        (pretrain vilmodel.py:578-612)."""
        b, s, v, d = pano_embeds.shape
        flat = pano_embeds.reshape(b, s * v, d).astype(jnp.float32)
        bi = jnp.arange(b)[:, None]

        def scatter(idx):
            idxf = idx.reshape(b, s * v)
            valid = (idxf >= 0) & pano_mask.reshape(b, s * v)
            tgt = jnp.where(valid, idxf, 0)
            ssum = jnp.zeros((b, g, d), jnp.float32).at[bi, tgt].add(
                jnp.where(valid[..., None], flat, 0.0))
            cnt = jnp.zeros((b, g), jnp.float32).at[bi, tgt].add(
                valid.astype(jnp.float32))
            return ssum, cnt

        vsum, vcnt = scatter(visited_idx)
        csum, ccnt = scatter(cand_idx)
        # visited slots take the visit-step mean; others the candidate mean
        use_visited = vcnt > 0
        ssum = jnp.where(use_visited[..., None], vsum, csum)
        cnt = jnp.where(use_visited, vcnt, ccnt)
        gmap_img = ssum / jnp.maximum(cnt, 1.0)[..., None]
        return gmap_img.at[:, 0].set(0.0)  # [stop] slot

    # --------------------------------------------------------------- encoding
    def _encode_trunk(
        self, txt_ids, txt_mask,
        traj_view_fts, traj_loc_fts, traj_nav_types, traj_token_mask,
        traj_step_mask, visited_idx, cand_idx,
        gmap_step_ids, gmap_pos_fts, gmap_mask, vp_pos_fts,
        grid_fts, grid_cells, gridmap_pos_fts, deterministic,
    ):
        """Shared prefix of encode() and forward_mlm_logits(): text encode,
        per-step panorama encode, gmap aggregation, last-step vp tokens, grid
        encode. Returns (txt_embeds, gmap_embeds, vp_embeds, vp_mask,
        grid_embeds, cell_mask)."""
        b, s, vm1, _ = traj_view_fts.shape
        c = self.cfg
        g = gmap_mask.shape[1]

        txt_embeds = self.bert.forward_text(txt_ids, txt_mask, deterministic)

        # panorama tokens for every step at once (B*S as batch)
        def flat(x):
            return x.reshape((b * s,) + x.shape[2:])

        pano, _ = self.bert.forward_panorama(
            flat(traj_view_fts), flat(traj_loc_fts), flat(traj_nav_types),
            flat(traj_token_mask), deterministic=deterministic)
        pano = pano.reshape(b, s, vm1, c.hidden_size)
        token_mask = traj_token_mask & traj_step_mask[..., None]

        gmap_img = self._aggregate_gmap(
            pano, token_mask, visited_idx, cand_idx, g)
        gmap_embeds = (
            gmap_img.astype(c.dtype)
            + self.bert.gmap_step_embeddings(gmap_step_ids)
            + self.bert.gmap_pos_ln(self.bert.gmap_pos_dense(gmap_pos_fts))
        )

        # vp tokens: [stop] + last step's panorama tokens
        # (pretrain vilmodel.py:543-565); the last VALID step per item
        last_idx = jnp.maximum(
            jnp.sum(traj_step_mask, axis=1).astype(jnp.int32) - 1, 0)
        bi = jnp.arange(b)
        last_pano = pano[bi, last_idx]                 # (B, V-1, D)
        last_tok_mask = traj_token_mask[bi, last_idx]  # (B, V-1)
        vp_img = jnp.concatenate(
            [jnp.zeros((b, 1, c.hidden_size), last_pano.dtype), last_pano], 1)
        vp_mask = jnp.concatenate([jnp.ones((b, 1), bool), last_tok_mask], 1)
        vp_embeds = vp_img + self.bert.vp_pos_ln(
            self.bert.vp_pos_dense(vp_pos_fts))

        grid_embeds, cell_mask = self.bert.encode_grid(
            txt_embeds, grid_fts, grid_cells, gridmap_pos_fts,
            # default None = the reference pretrain model's max over PADDED
            # text (pretrain_src/model/vilmodel.py:688-692 applies no mask)
            txt_mask if self.cfg.mask_txt_relevance else None)
        return (txt_embeds, gmap_embeds, vp_embeds, vp_mask, grid_embeds,
                cell_mask)

    def encode(
        self,
        txt_ids, txt_mask,
        traj_view_fts,    # (B, S, V-1, D_img) per-step tokens (views [+objs])
        traj_loc_fts,     # (B, S, V-1, angle+3)
        traj_nav_types,   # (B, S, V-1)
        traj_token_mask,  # (B, S, V-1)
        traj_step_mask,   # (B, S)
        visited_idx,      # (B, S, V-1)
        cand_idx,         # (B, S, V-1)
        gmap_step_ids, gmap_pos_fts, gmap_mask,
        vp_pos_fts,
        grid_fts, grid_cells, gridmap_pos_fts,
        deterministic=True,
    ) -> TrajectoryEncodings:
        (txt_embeds, gmap_embeds, vp_embeds, vp_mask, grid_embeds,
         cell_mask) = self._encode_trunk(
            txt_ids, txt_mask, traj_view_fts, traj_loc_fts, traj_nav_types,
            traj_token_mask, traj_step_mask, visited_idx, cand_idx,
            gmap_step_ids, gmap_pos_fts, gmap_mask, vp_pos_fts,
            grid_fts, grid_cells, gridmap_pos_fts, deterministic)

        map_embeds, gmap_out, vp_out = self.bert.fusion_trunk(
            txt_embeds, txt_mask, grid_embeds, cell_mask,
            gmap_embeds, gmap_mask, vp_embeds, vp_mask, deterministic,
            stray_count=self._stray(cell_mask))
        return TrajectoryEncodings(
            txt_embeds=txt_embeds, gmap_out=gmap_out, vp_out=vp_out,
            grid_gmap_out=map_embeds[:, -gmap_mask.shape[1]:],
            vp_mask=vp_mask)

    # ------------------------------------------------------------------ tasks
    def forward_mlm_logits(self, txt_ids, txt_mask, enc_kwargs,
                           deterministic=True):
        """Language tokens re-attend to the fused [gmap||vp] context, then the
        tied-embedding MLM head scores every position
        (pretrain vilmodel.py:765-854, pretrain_cmt.py:125-153)."""
        (txt_embeds, gmap_embeds, vp_embeds, vp_mask, grid_embeds,
         cell_mask) = self._encode_trunk(
            txt_ids, txt_mask, enc_kwargs["traj_view_fts"],
            enc_kwargs["traj_loc_fts"], enc_kwargs["traj_nav_types"],
            enc_kwargs["traj_token_mask"], enc_kwargs["traj_step_mask"],
            enc_kwargs["visited_idx"], enc_kwargs["cand_idx"],
            enc_kwargs["gmap_step_ids"], enc_kwargs["gmap_pos_fts"],
            enc_kwargs["gmap_mask"], enc_kwargs["vp_pos_fts"],
            enc_kwargs["grid_fts"], enc_kwargs["grid_cells"],
            enc_kwargs["gridmap_pos_fts"], deterministic)

        # map encoder (no fusion of vp queries; MLM attends lang->[gmap||vp],
        # pretrain vilmodel.py:828-853)
        stray = self._stray(cell_mask)
        key_bias = None
        if stray is not None:
            b = grid_embeds.shape[0]
            grid_embeds = jnp.concatenate(
                [grid_embeds,
                 jnp.zeros((b, 1, grid_embeds.shape[-1]), grid_embeds.dtype)],
                axis=1)
            cell_mask = jnp.concatenate([cell_mask, (stray > 0)[:, None]], 1)
            key_bias = jnp.zeros(
                (b, grid_embeds.shape[1] + enc_kwargs["gmap_mask"].shape[1]),
                jnp.float32).at[:, grid_embeds.shape[1] - 1].set(
                jnp.log(jnp.maximum(stray.astype(jnp.float32), 1.0)))
        num_cells = grid_embeds.shape[1]
        map_embeds = jnp.concatenate([grid_embeds, gmap_embeds], axis=1)
        map_mask = jnp.concatenate(
            [cell_mask, enc_kwargs["gmap_mask"]], axis=1)
        map_embeds = self.bert.grid_encoder(map_embeds, map_mask,
                                            deterministic, key_bias=key_bias)
        map_embeds = self.bert.grid_txt_encoder(
            txt_embeds, txt_mask, map_embeds, map_mask,
            deterministic=deterministic, img_key_bias=key_bias)
        gmap_ctx = map_embeds[:, num_cells:]

        # the MLM lang2visn context is [gmap||vp] WITHOUT the stray token:
        # the reference concatenates map_embeds[:, max_cell_num:] (the gmap
        # region) + vp (pretrain vilmodel.py:846-853), and strays live in the
        # map region below max_cell_num — excluded there, excluded here.
        visn = jnp.concatenate([gmap_ctx, vp_embeds], axis=1)
        visn_mask = jnp.concatenate([enc_kwargs["gmap_mask"], vp_mask], axis=1)
        txt_embeds = self.bert.local_encoder.lang2visn(
            txt_embeds, txt_mask, visn, visn_mask, deterministic)

        word_table = self.bert.embeddings.variables["params"][
            "word_embeddings"]["embedding"]
        return self.mlm_head(txt_embeds, word_table)

    def forward_mrc_logits(self, enc: TrajectoryEncodings):
        """Soft-label region classification over view tokens
        (pretrain_cmt.py:161-212). Returns (B, V-1, prob_size) logits for the
        last step's view tokens (positions 1..)."""
        view_embeds = enc.vp_out[:, 1:]
        return self.image_classifier(view_embeds)

    def forward_sap_logits(self, enc: TrajectoryEncodings,
                           gmap_mask, gmap_visited_mask, vp_nav_mask,
                           fused_add_idx, cand_backtrack_mask):
        """Four-head SAP logits (pretrain_cmt.py:217-289) via the navigator's
        head block."""
        from gridmm_tpu.ops.masking import mask_logits
        f32 = jnp.float32
        b = self.bert
        if b.sap_fuse_linear is None:
            fuse = jnp.float32(0.5)
        else:
            fuse = jax.nn.sigmoid(b.sap_fuse_linear(jnp.concatenate(
                [enc.gmap_out[:, 0], enc.vp_out[:, 0]], axis=-1)))
        valid_unvisited = gmap_mask & ~gmap_visited_mask
        global_logits = mask_logits(
            b.global_sap_head(enc.gmap_out)[..., 0].astype(f32) * fuse,
            valid_unvisited)
        grid_logits = mask_logits(
            b.grid_sap_head(enc.grid_gmap_out)[..., 0].astype(f32),
            valid_unvisited)
        local_logits = mask_logits(
            b.local_sap_head(enc.vp_out)[..., 0].astype(f32) * (1.0 - fuse),
            vp_nav_mask)

        fused = global_logits.at[:, 0].add(local_logits[:, 0])
        bt = cand_backtrack_mask & vp_nav_mask
        bt = bt.at[:, 0].set(False)
        bw = jnp.sum(jnp.where(bt, local_logits, 0.0), axis=1)
        idx = jnp.maximum(fused_add_idx, 0)
        gathered = jnp.take_along_axis(local_logits, idx, axis=1)
        add = jnp.where(fused_add_idx >= 0, gathered,
                        jnp.where(fused_add_idx == -1, bw[:, None], 0.0))
        slot = jnp.arange(fused.shape[1])[None, :]
        addable = valid_unvisited & (slot > 0) & (fused_add_idx != -2)
        fused = fused + jnp.where(addable, add, 0.0)
        return global_logits, local_logits, fused, grid_logits

    def forward_og_logits(self, enc: TrajectoryEncodings, vp_obj_mask):
        from gridmm_tpu.ops.masking import mask_logits
        return mask_logits(
            self.bert.og_head(enc.vp_out)[..., 0].astype(jnp.float32),
            vp_obj_mask)
