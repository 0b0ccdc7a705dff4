"""GridMM navigator: the cross-modal grid/graph/viewpoint policy network.

TPU-native re-design of GlocalTextPathNavCMT (map_nav_src/models/vilmodel.py:676-939
and the pretrain twin pretrain_src/model/vilmodel.py:640-854). Three entry points
mirror the reference's 3-mode callable (models/model.py:21-40):

  * forward_text         — instruction encoding (vilmodel.py:730-734)
  * forward_panorama     — per-step panorama token encoding (vilmodel.py:736-780)
  * forward_navigation   — per-step action prediction (vilmodel.py:782-918)

Key deviations, all shape-and-compile driven, semantics preserved:
  * Every sequence is padded to a static cap with a boolean mask; the reference's
    per-batch dynamic padding (models/ops.py:pad_tensors_wgrad) disappears.
  * The grid memory keeps all 196 cell slots with an occupancy mask instead of
    compacting to `max_cell_num` (vilmodel.py:809-823) — attention with key
    masking makes the compaction a no-op semantically.
  * The O(196*N) python pooling loop becomes a fused scatter-pool op
    (ops/grid_pool.py, Pallas kernel in ops/pallas/).
  * The graph-aware fused-logit dict loop (vilmodel.py:884-899) becomes a
    host-precomputed index map (`fused_add_idx`) + on-device gather.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gridmm_tpu.config import ModelConfig
from gridmm_tpu.models.layers import (
    BertEmbeddings,
    BertLayer,
    ClsPrediction,
    CrossmodalEncoder,
    LayerNorm,
    PreNormEncoder,
    _dense,
)
from gridmm_tpu.ops.grid_pool import grid_scatter_pool, instruction_relevance
from gridmm_tpu.ops.masking import attn_bias_from_mask, mask_logits


class NavOutputs(NamedTuple):
    """Per-step policy outputs (vilmodel.py:909-917)."""

    gmap_embeds: jnp.ndarray
    vp_embeds: jnp.ndarray
    global_logits: jnp.ndarray
    local_logits: jnp.ndarray
    fused_logits: jnp.ndarray
    grid_logits: jnp.ndarray
    obj_logits: Optional[jnp.ndarray]


class LanguageEncoder(nn.Module):
    """num_l_layers BERT layers (vilmodel.py:429-449)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, txt_embeds, txt_mask, deterministic=True):
        bias = attn_bias_from_mask(txt_mask)
        x = txt_embeds
        for i in range(self.cfg.num_l_layers):
            x = BertLayer(self.cfg, name=f"layer_{i}")(x, bias, deterministic)
        if not self.cfg.update_lang_bert:
            x = jax.lax.stop_gradient(x)
        return x


class ImageEmbeddings(nn.Module):
    """Panorama token embedder + pano self-attention (vilmodel.py:470-541).

    The per-step variant (forward_panorama_per_step, vilmodel.py:736-780) is the
    same computation on a (B, V, ...) batch; object tokens, when enabled, arrive
    pre-concatenated into the view axis with nav_type==2.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, view_img_fts, loc_fts, nav_types, mask,
                 token_type_embeds, obj_img_fts=None, deterministic=True):
        c = self.cfg
        # visual-feature dropout applied before projection
        # (models/model.py:29-31 drop_env)
        view_img_fts = nn.Dropout(c.feat_dropout)(
            view_img_fts, deterministic=deterministic)
        img_linear = _dense(c.hidden_size, "img_linear", c.dtype)
        img_ln = LayerNorm(1e-12, name="img_layer_norm")
        img = img_ln(img_linear(view_img_fts))
        if obj_img_fts is not None and c.obj_feat_size > 0:
            obj_img_fts = nn.Dropout(c.feat_dropout)(
                obj_img_fts, deterministic=deterministic)
            if c.obj_feat_size != c.image_feat_size:
                obj = _dense(c.hidden_size, "obj_linear", c.dtype)(obj_img_fts)
                obj = LayerNorm(1e-12, name="obj_layer_norm")(obj)
            else:
                # equal dims share the image projection (vilmodel.py:506-509,
                # 745-749: obj_linear is None -> img_linear path)
                obj = img_ln(img_linear(obj_img_fts))
            img = jnp.concatenate([img, obj], axis=1)
        loc = _dense(c.hidden_size, "loc_linear", c.dtype)(loc_fts)
        loc = LayerNorm(1e-12, name="loc_layer_norm")(loc)
        nav = nn.Embed(3, c.hidden_size, name="nav_type_embedding",
                       dtype=c.dtype)(nav_types)
        # reference adds token_type_embeddings(1) — the "image" type slot
        # (vilmodel.py:768-771) — provided by the caller
        x = img + loc + nav + token_type_embeds
        x = LayerNorm(1e-12, name="layer_norm")(x)
        x = nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)
        if c.num_pano_layers > 0:
            x = PreNormEncoder(c, c.num_pano_layers, name="pano_encoder")(
                x, mask, deterministic)
        return x


class Critic(nn.Module):
    """Value head for A2C (models/model.py:43-54). The released configs train
    with gamma=0 (run_r2r.sh), so this is inactive in the shipped recipes but
    available for RL fine-tuning."""

    cfg: ModelConfig
    dropout: float = 0.5

    @nn.compact
    def __call__(self, state, deterministic=True):
        x = _dense(512, "fc1", self.cfg.dtype)(state)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return _dense(1, "fc2", self.cfg.dtype)(x)[..., 0]


class GridMMNavigator(nn.Module):
    """The flagship model. Parameter tree mirrors the reference for checkpoint
    import (utils/checkpoint.py maps torch names onto this tree)."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        # shared token-type table (text uses id 0, panorama tokens use id 1;
        # vilmodel.py:71,768-771)
        self.token_type_embeddings = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings",
            dtype=c.dtype)
        self.embeddings = BertEmbeddings(c, name="embeddings")
        self.lang_encoder = LanguageEncoder(c, name="lang_encoder")
        self.img_embeddings = ImageEmbeddings(c, name="img_embeddings")

        # local branch (LocalVPEncoder, vilmodel.py:543-575)
        self.vp_pos_dense = _dense(c.hidden_size, "vp_pos_dense", c.dtype)
        self.vp_pos_ln = LayerNorm(1e-12, name="vp_pos_ln")
        self.local_encoder = CrossmodalEncoder(c, c.num_x_layers, name="local_encoder")

        # global branch (GlobalMapEncoder, vilmodel.py:577-660)
        self.gmap_pos_dense = _dense(c.hidden_size, "gmap_pos_dense", c.dtype)
        self.gmap_pos_ln = LayerNorm(1e-12, name="gmap_pos_ln")
        self.gmap_step_embeddings = nn.Embed(
            c.max_action_steps, c.hidden_size, name="gmap_step_embeddings",
            dtype=c.dtype)

        # grid branch (vilmodel.py:691-703)
        self.grid_encoder = PreNormEncoder(c, 1, name="grid_encoder")
        self.grid_txt_encoder = CrossmodalEncoder(c, 1, name="grid_txt_encoder")
        self.grid_pos_dense = _dense(c.hidden_size, "grid_pos_dense", c.dtype)
        self.grid_pos_ln = LayerNorm(1e-12, name="grid_pos_ln")
        self.text_proj = _dense(c.hidden_size, "text_proj", jnp.float32)
        self.grid_proj = _dense(c.hidden_size, "grid_proj", jnp.float32)

        # heads (vilmodel.py:687-710)
        self.global_sap_head = ClsPrediction(c, name="global_sap_head")
        self.local_sap_head = ClsPrediction(c, name="local_sap_head")
        self.grid_sap_head = ClsPrediction(c, name="grid_sap_head")
        if c.glocal_fuse:
            self.sap_fuse_linear = ClsPrediction(
                c, input_size=c.hidden_size * 2, name="sap_fuse_linear")
        else:
            self.sap_fuse_linear = None
        if c.obj_feat_size > 0:
            self.og_head = ClsPrediction(c, name="og_head")
        else:
            self.og_head = None

    # ------------------------------------------------------------------ text
    def forward_text(self, txt_ids, txt_mask, deterministic=True):
        tok = self.token_type_embeddings(jnp.zeros_like(txt_ids))
        emb = self.embeddings(txt_ids, tok, deterministic=deterministic)
        return self.lang_encoder(emb, txt_mask, deterministic)

    # -------------------------------------------------------------- panorama
    def forward_panorama(self, view_img_fts, loc_fts, nav_types, view_mask,
                         obj_img_fts=None, deterministic=True):
        tok = self.token_type_embeddings(jnp.ones((1, 1), jnp.int32))
        pano = self.img_embeddings(
            view_img_fts, loc_fts, nav_types, view_mask,
            tok, obj_img_fts, deterministic)
        return pano, view_mask

    # ----------------------------------------------------------- shared trunk
    def project_grid_points(self, txt_embeds, patch_fts, txt_relevance_mask=None):
        """Project newly observed grid points once at insertion time: returns
        (grid_proj(patch_fts), relevance weights). Exact factoring of
        vilmodel.py:793-807 — both the projection and the per-point relevance
        are constant over an episode, so the reference's per-step recompute
        over the whole accumulated cloud is redundant."""
        f32 = jnp.float32
        proj_txt = self.text_proj(txt_embeds.astype(f32))
        w = instruction_relevance(patch_fts.astype(f32), proj_txt,
                                  txt_relevance_mask)
        g = self.grid_proj(patch_fts.astype(f32))
        return g, w

    def encode_grid_prepooled(self, proj_fts, weights, grid_cells,
                              gridmap_pos_fts):
        """Pool already-projected points (see project_grid_points)."""
        num_cells = gridmap_pos_fts.shape[1]
        if self.cfg.use_pallas_grid_pool and num_cells == 196:
            from gridmm_tpu.ops.grid_pool import grid_scatter_pool_pallas
            pooled, cell_mask = grid_scatter_pool_pallas(
                proj_fts.astype(jnp.float32), grid_cells,
                weights.astype(jnp.float32))
        else:
            pooled, cell_mask = grid_scatter_pool(
                proj_fts.astype(jnp.float32), grid_cells,
                weights.astype(jnp.float32), num_cells)
        grid_embeds = pooled.astype(self.cfg.dtype) + self.grid_pos_ln(
            self.grid_pos_dense(gridmap_pos_fts))
        return grid_embeds, cell_mask

    def encode_grid(self, txt_embeds, grid_fts, grid_cells, gridmap_pos_fts,
                    txt_relevance_mask=None):
        """Instruction-relevance pooling of grid points into cell embeddings
        (vilmodel.py:788-824). Returns (grid_embeds, cell_mask)."""
        f32 = jnp.float32
        num_cells = gridmap_pos_fts.shape[1]
        proj_txt = self.text_proj(txt_embeds.astype(f32))
        rel_w = instruction_relevance(grid_fts.astype(f32), proj_txt,
                                      txt_relevance_mask)
        grid_proj_fts = self.grid_proj(grid_fts.astype(f32))
        if self.cfg.use_pallas_grid_pool and num_cells == 196:
            from gridmm_tpu.ops.grid_pool import grid_scatter_pool_pallas
            pooled, cell_mask = grid_scatter_pool_pallas(
                grid_proj_fts, grid_cells, rel_w)
        else:
            pooled, cell_mask = grid_scatter_pool(
                grid_proj_fts, grid_cells, rel_w, num_cells)
        grid_embeds = pooled.astype(self.cfg.dtype) + self.grid_pos_ln(
            self.grid_pos_dense(gridmap_pos_fts))
        return grid_embeds, cell_mask

    def fusion_trunk(self, txt_embeds, txt_mask, grid_embeds, cell_mask,
                     gmap_embeds, gmap_mask, vp_embeds, vp_mask,
                     deterministic=True, stray_count=None):
        """Map encoder + cross-modal fusion shared by the per-step navigator
        and the trajectory-level pretraining model (vilmodel.py:837-856 /
        pretrain vilmodel.py:735-760).

        `stray_count` (B,) int32 emulates the reference's compaction-alias
        stray keys (ops/masking.compaction_stray_count): all strays are
        IDENTICAL zero-embedding rows, so n of them are mathematically one
        extra zero token whose key column carries a +log(n) attention bias in
        every attention where map tokens are keys (the grid self-encoder, the
        grid-txt x-layer's self-attention, and the fusion kv). The token is
        inserted between the grid cells and the gmap tokens, exactly where
        the reference's padding rows live.

        Returns (map_embeds, gmap_out, vp_out); the gmap region of
        map_embeds is always its LAST gmap_mask.shape[1] columns."""
        b = grid_embeds.shape[0]
        key_bias = None
        if stray_count is not None:
            zero_tok = jnp.zeros((b, 1, grid_embeds.shape[-1]),
                                 grid_embeds.dtype)
            grid_embeds = jnp.concatenate([grid_embeds, zero_tok], axis=1)
            cell_mask = jnp.concatenate(
                [cell_mask, (stray_count > 0)[:, None]], axis=1)
            key_bias = jnp.zeros((b, grid_embeds.shape[1]
                                  + gmap_mask.shape[1]), jnp.float32)
            key_bias = key_bias.at[:, grid_embeds.shape[1] - 1].set(
                jnp.log(jnp.maximum(stray_count.astype(jnp.float32), 1.0)))
        num_cells = grid_embeds.shape[1]
        map_embeds = jnp.concatenate([grid_embeds, gmap_embeds], axis=1)
        map_mask = jnp.concatenate([cell_mask, gmap_mask], axis=1)
        map_embeds = self.grid_encoder(map_embeds, map_mask, deterministic,
                                       key_bias=key_bias)
        map_embeds = self.grid_txt_encoder(
            txt_embeds, txt_mask, map_embeds, map_mask,
            deterministic=deterministic, img_key_bias=key_bias)
        gmap_embeds = map_embeds[:, num_cells:]

        kv_embeds = jnp.concatenate([map_embeds, txt_embeds], axis=1)
        kv_mask = jnp.concatenate([map_mask, txt_mask], axis=1)
        kv_key_bias = None
        if key_bias is not None:
            kv_key_bias = jnp.concatenate(
                [key_bias, jnp.zeros((b, txt_mask.shape[1]), jnp.float32)],
                axis=1)
        q_embeds = jnp.concatenate([gmap_embeds, vp_embeds], axis=1)
        q_mask = jnp.concatenate([gmap_mask, vp_mask], axis=1)
        q_embeds = self.local_encoder(
            kv_embeds, kv_mask, q_embeds, q_mask, deterministic=deterministic,
            txt_key_bias=kv_key_bias)

        g_len = gmap_mask.shape[1]
        return map_embeds, q_embeds[:, :g_len], q_embeds[:, g_len:]

    # ------------------------------------------------------------ navigation
    def forward_navigation(
        self,
        txt_embeds, txt_mask,
        gmap_img_embeds, gmap_step_ids, gmap_pos_fts, gmap_mask,
        gmap_visited_mask,
        vp_img_embeds, vp_pos_fts, vp_mask, vp_nav_mask,
        grid_fts, grid_cells, gridmap_pos_fts,
        fused_add_idx,            # (B, G) int32: k>=0 gather local[k]; -1 add
                                  # backtrack sum; -2 add nothing
        cand_backtrack_mask,      # (B, V) bool: candidate is a visited node
        vp_obj_mask=None,
        txt_relevance_mask=None,  # None reproduces the reference's unmasked max
        grid_weights=None,        # set when grid_fts are pre-projected
        deterministic=True,
        grid_embeds=None,         # pre-pooled (B, C, D) cell embeddings —
        cell_mask=None,           # skips the pool (stacked batched replay)
    ) -> NavOutputs:
        c = self.cfg
        num_cells = (grid_embeds if grid_embeds is not None
                     else gridmap_pos_fts).shape[1]
        f32 = jnp.float32

        # --- grid memory pooling (vilmodel.py:788-824, fused) ---
        if grid_embeds is not None:
            pass  # caller pooled already (mode "grid_pool")
        elif grid_weights is not None:
            grid_embeds, cell_mask = self.encode_grid_prepooled(
                grid_fts, grid_weights, grid_cells, gridmap_pos_fts)
        else:
            grid_embeds, cell_mask = self.encode_grid(
                txt_embeds, grid_fts, grid_cells, gridmap_pos_fts,
                txt_relevance_mask)

        # --- global branch input (vilmodel.py:828-830) ---
        gmap_embeds = (
            gmap_img_embeds
            + self.gmap_step_embeddings(gmap_step_ids)
            + self.gmap_pos_ln(self.gmap_pos_dense(gmap_pos_fts))
        )

        # --- local branch input (vilmodel.py:833) ---
        vp_embeds = vp_img_embeds + self.vp_pos_ln(self.vp_pos_dense(vp_pos_fts))

        stray_count = None
        if c.compaction_stray_keys:
            from gridmm_tpu.ops.masking import compaction_stray_count
            stray_count = compaction_stray_count(cell_mask)
        map_embeds, gmap_out, vp_out = self.fusion_trunk(
            txt_embeds, txt_mask, grid_embeds, cell_mask,
            gmap_embeds, gmap_mask, vp_embeds, vp_mask, deterministic,
            stray_count=stray_count)

        # --- logits (vilmodel.py:859-907) ---
        if self.sap_fuse_linear is None:
            fuse = jnp.float32(0.5)
        else:
            fuse = jax.nn.sigmoid(self.sap_fuse_linear(
                jnp.concatenate([gmap_out[:, 0], vp_out[:, 0]], axis=-1)))

        valid_unvisited = gmap_mask & ~gmap_visited_mask
        global_logits = self.global_sap_head(gmap_out)[..., 0].astype(f32) * fuse
        global_logits = mask_logits(global_logits, valid_unvisited)

        grid_logits = self.grid_sap_head(
            map_embeds[:, -gmap_mask.shape[1]:])[..., 0].astype(f32)
        grid_logits = mask_logits(grid_logits, valid_unvisited)

        local_logits = self.local_sap_head(vp_out)[..., 0].astype(f32) * (1.0 - fuse)
        local_logits = mask_logits(local_logits, vp_nav_mask)

        # graph-aware fusion (vilmodel.py:881-899): visited candidates pool into
        # a single "backtrack" logit; unvisited gmap nodes pick up their matching
        # candidate's local logit, or the backtrack logit if not visible.
        fused = global_logits
        fused = fused.at[:, 0].add(local_logits[:, 0])
        bt_mask = cand_backtrack_mask & vp_nav_mask
        bt_mask = bt_mask.at[:, 0].set(False)
        bw_logits = jnp.sum(jnp.where(bt_mask, local_logits, 0.0), axis=1)

        idx = jnp.maximum(fused_add_idx, 0)
        gathered = jnp.take_along_axis(local_logits, idx, axis=1)
        add = jnp.where(
            fused_add_idx >= 0, gathered,
            jnp.where(fused_add_idx == -1, bw_logits[:, None], 0.0))
        # only unvisited, in-graph, non-stop slots receive an addition
        slot = jnp.arange(fused.shape[1])[None, :]
        addable = valid_unvisited & (slot > 0) & (fused_add_idx != -2)
        fused = fused + jnp.where(addable & jnp.isfinite(fused), add, 0.0)

        if self.og_head is not None and vp_obj_mask is not None:
            obj_logits = mask_logits(
                self.og_head(vp_out)[..., 0].astype(f32), vp_obj_mask)
        else:
            obj_logits = None

        return NavOutputs(
            gmap_embeds=gmap_out,
            vp_embeds=vp_out,
            global_logits=global_logits,
            local_logits=local_logits,
            fused_logits=fused,
            grid_logits=grid_logits,
            obj_logits=obj_logits,
        )

    def init_all_modes(self, txt_ids, txt_mask, pano_batch, nav_batch):
        """Runs all three forwards once so `model.init` materializes every
        parameter (flax creates params lazily per executed path)."""
        txt = self.forward_text(txt_ids, txt_mask)
        pano = self.forward_panorama(**pano_batch)
        nav = self.forward_navigation(
            txt_embeds=txt, txt_mask=txt_mask, **nav_batch)
        return txt, pano, nav

    def __call__(self, mode: str, batch: dict, deterministic: bool = True):
        """3-mode dispatch (models/model.py:21-40)."""
        if mode == "language":
            return self.forward_text(
                batch["txt_ids"], batch["txt_mask"], deterministic)
        if mode == "panorama":
            return self.forward_panorama(
                batch["view_img_fts"], batch["loc_fts"], batch["nav_types"],
                batch["view_mask"], batch.get("obj_img_fts"), deterministic)
        if mode == "navigation":
            return self.forward_navigation(
                batch["txt_embeds"], batch["txt_mask"],
                batch["gmap_img_embeds"], batch["gmap_step_ids"],
                batch["gmap_pos_fts"], batch["gmap_mask"],
                batch["gmap_visited_mask"],
                batch["vp_img_embeds"], batch["vp_pos_fts"], batch["vp_mask"],
                batch["vp_nav_mask"],
                batch.get("grid_fts"), batch.get("grid_cells"),
                batch.get("gridmap_pos_fts"),
                batch["fused_add_idx"], batch["cand_backtrack_mask"],
                batch.get("vp_obj_mask"),
                batch.get("txt_relevance_mask"),
                batch.get("grid_weights"),
                deterministic,
                grid_embeds=batch.get("grid_embeds"),
                cell_mask=batch.get("cell_mask"),
            )
        if mode == "project_grid":
            return self.project_grid_points(
                batch["txt_embeds"], batch["patch_fts"],
                batch.get("txt_relevance_mask"))
        if mode == "grid_pool":
            # pool pre-projected points into cell embeddings (the stacked
            # replay computes this per step, then batches the rest over S*B)
            return self.encode_grid_prepooled(
                batch["proj_fts"], batch["weights"], batch["grid_cells"],
                batch["gridmap_pos_fts"])
        raise ValueError(f"unknown mode {mode!r}")


def dummy_batches(shapes, model_cfg: ModelConfig, batch: int = 1):
    """Zero-filled batches at the static caps, for parameter init and
    compile-time shape checks."""
    b = batch
    t, g, v, n, c = (shapes.max_txt_len, shapes.max_gmap_len, shapes.max_vp_len,
                     shapes.max_points, shapes.num_cells)
    d = model_cfg.image_feat_size
    txt_ids = jnp.zeros((b, t), jnp.int32)
    txt_mask = jnp.ones((b, t), bool)
    pano_batch = dict(
        view_img_fts=jnp.zeros((b, v - 1, d), jnp.float32),
        loc_fts=jnp.zeros((b, v - 1, model_cfg.angle_feat_size + 3), jnp.float32),
        nav_types=jnp.zeros((b, v - 1), jnp.int32),
        view_mask=jnp.ones((b, v - 1), bool),
    )
    if model_cfg.obj_feat_size > 0:
        # materialize the obj_linear/obj_layer_norm branch (flax creates
        # params lazily per executed path); loc/nav/mask widths grow by the
        # concatenated object tokens
        n_obj = max(int(getattr(shapes, "max_obj_len", 0) or 0), 1)
        pano_batch["obj_img_fts"] = jnp.zeros(
            (b, n_obj, model_cfg.obj_feat_size), jnp.float32)
        pano_batch["loc_fts"] = jnp.zeros(
            (b, v - 1 + n_obj, model_cfg.angle_feat_size + 3), jnp.float32)
        pano_batch["nav_types"] = jnp.zeros((b, v - 1 + n_obj), jnp.int32)
        pano_batch["view_mask"] = jnp.ones((b, v - 1 + n_obj), bool)
    nav_batch = dict(
        gmap_img_embeds=jnp.zeros((b, g, model_cfg.hidden_size), jnp.float32),
        gmap_step_ids=jnp.zeros((b, g), jnp.int32),
        gmap_pos_fts=jnp.zeros((b, g, model_cfg.angle_feat_size + 3), jnp.float32),
        gmap_mask=jnp.ones((b, g), bool),
        gmap_visited_mask=jnp.zeros((b, g), bool),
        vp_img_embeds=jnp.zeros((b, v, model_cfg.hidden_size), jnp.float32),
        vp_pos_fts=jnp.zeros((b, v, 2 * model_cfg.angle_feat_size + 6), jnp.float32),
        vp_mask=jnp.ones((b, v), bool),
        vp_nav_mask=jnp.ones((b, v), bool),
        grid_fts=jnp.zeros((b, n, d), jnp.float32),
        grid_cells=jnp.zeros((b, n), jnp.int32),
        gridmap_pos_fts=jnp.zeros((b, c, 5), jnp.float32),
        fused_add_idx=jnp.full((b, g), -2, jnp.int32),
        cand_backtrack_mask=jnp.zeros((b, v), bool),
    )
    if model_cfg.obj_feat_size > 0:
        nav_batch["vp_obj_mask"] = jnp.zeros((b, v), bool)
    return txt_ids, txt_mask, pano_batch, nav_batch


def init_navigator(model: GridMMNavigator, shapes, rng) -> dict:
    """Materialize the full parameter tree (all three modes)."""
    txt_ids, txt_mask, pano_batch, nav_batch = dummy_batches(shapes, model.cfg)
    return model.init(rng, txt_ids, txt_mask, pano_batch, nav_batch,
                      method=GridMMNavigator.init_all_modes)
