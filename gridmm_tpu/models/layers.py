"""Transformer building blocks (flax.linen).

Covers the reference's vendored BERT blocks (map_nav_src/models/vilmodel.py:64-427)
and the DETR-style pre-norm TransformerEncoder (map_nav_src/models/transformer.py,
built by models/ops.py:create_transformer_encoder). One implementation, shared by
the language encoder, panorama encoder, grid encoder, cross-modal encoders, the
pretraining model, and the CE waypoint predictor.

TPU notes: attention is expressed as batched einsums so XLA tiles it onto the MXU;
sequence lengths here are <=~600 tokens, where XLA's fused attention is already at
speed-of-light — a Pallas flash-attention path (ops/pallas/flash_attention.py) is
wired in for the CLIP encoder where batches are large.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gridmm_tpu.config import ModelConfig


def gelu_erf(x):
    """BERT's exact-erf gelu (vilmodel.py:47-53)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


ACT2FN: dict[str, Callable] = {
    "gelu": gelu_erf,
    "relu": jax.nn.relu,
    "swish": jax.nn.silu,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}


class LayerNorm(nn.Module):
    """LayerNorm computed in f32 regardless of activation dtype."""

    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        y = nn.LayerNorm(epsilon=self.eps, name="ln")(x)
        return y.astype(dtype)


class Int8Dense(nn.Module):
    """nn.Dense-compatible (identical param layout + init) dense layer that
    runs the matmul on the int8 MXU path (ops/quant.py). Serving-only: at
    small batch the per-step graph is weight-streaming-bound (161M params of
    f32 per action), so int8 weights quarter the HBM traffic; accuracy is
    flag-gated and must be validated per-checkpoint (cosine tests in
    tests/test_int8_nav.py)."""

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.normal(stddev=0.02),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from gridmm_tpu.ops.quant import int8_dense

        return int8_dense(x, kernel, bias)


def _dense(features: int, name: str, dtype=jnp.float32, int8: bool = False):
    if int8:
        return Int8Dense(features, name=name)
    return nn.Dense(
        features,
        name=name,
        dtype=dtype,
        kernel_init=nn.initializers.normal(stddev=0.02),
        bias_init=nn.initializers.zeros,
    )


class MultiHeadAttention(nn.Module):
    """Scaled dot-product attention with separate q / kv inputs.

    Implements both BertSelfAttention (vilmodel.py:95-157) and BertOutAttention
    (cross-attention, vilmodel.py:317-368): pass kv=x for self-attention.
    `bias` is an additive float mask broadcastable to (B, H, Lq, Lk).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, q_in, kv_in, bias=None, deterministic=True):
        c = self.cfg
        h, hd = c.num_attention_heads, c.head_dim
        dtype = c.dtype

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, h, hd)

        q = split(_dense(c.hidden_size, "query", dtype,
                         c.int8_matmuls)(q_in))
        k = split(_dense(c.hidden_size, "key", dtype, c.int8_matmuls)(kv_in))
        v = split(_dense(c.hidden_size, "value", dtype,
                         c.int8_matmuls)(kv_in))

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(hd)
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(c.attention_probs_dropout_prob)(
            probs, deterministic=deterministic
        )
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(dtype), v, preferred_element_type=jnp.float32
        ).astype(dtype)
        b, l = ctx.shape[:2]
        return ctx.reshape(b, l, c.hidden_size)


class AttentionOutput(nn.Module):
    """dense -> dropout -> LN(residual + x)  (BertSelfOutput, vilmodel.py:159-170)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, residual, deterministic=True):
        c = self.cfg
        x = _dense(c.hidden_size, "dense", c.dtype, c.int8_matmuls)(x)
        x = nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)
        return LayerNorm(c.layer_norm_eps, name="LayerNorm")(x + residual)


class BertAttention(nn.Module):
    """Self-attention block (vilmodel.py:172-182)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, bias=None, deterministic=True):
        ctx = MultiHeadAttention(self.cfg, name="self")(x, x, bias, deterministic)
        return AttentionOutput(self.cfg, name="output")(ctx, x, deterministic)


class BertCrossAttention(nn.Module):
    """Cross-attention block (BertXAttention, vilmodel.py:370-379)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, ctx, ctx_bias=None, deterministic=True):
        out = MultiHeadAttention(self.cfg, name="att")(x, ctx, ctx_bias, deterministic)
        return AttentionOutput(self.cfg, name="output")(out, x, deterministic)


class BertFFN(nn.Module):
    """intermediate + output (vilmodel.py:184-209)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.cfg
        h = _dense(c.intermediate_size, "intermediate_dense", c.dtype,
                   c.int8_matmuls)(x)
        h = ACT2FN[c.hidden_act](h)
        h = _dense(c.hidden_size, "output_dense", c.dtype, c.int8_matmuls)(h)
        h = nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        return LayerNorm(c.layer_norm_eps, name="output_LayerNorm")(h + x)


class BertLayer(nn.Module):
    """attention -> FFN (vilmodel.py:211-224)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, bias=None, deterministic=True):
        x = BertAttention(self.cfg, name="attention")(x, bias, deterministic)
        return BertFFN(self.cfg, name="ffn")(x, deterministic)


class BertEmbeddings(nn.Module):
    """word + position (+ externally shared token-type) embeddings
    (vilmodel.py:64-93). The token-type table is owned by the navigator because
    the panorama embedder reuses it (vilmodel.py:768-771)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, input_ids, token_type_embeds, position_ids=None,
                 deterministic=True):
        c = self.cfg
        b, l = input_ids.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(l)[None, :], (b, l))
        emb = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                       dtype=c.dtype)(input_ids)
        emb = emb + nn.Embed(c.max_position_embeddings, c.hidden_size,
                             name="position_embeddings", dtype=c.dtype)(position_ids)
        emb = emb + token_type_embeds
        emb = LayerNorm(c.layer_norm_eps, name="LayerNorm")(emb)
        return nn.Dropout(c.hidden_dropout_prob)(emb, deterministic=deterministic)


class GraphLXRTXLayer(nn.Module):
    """Cross-modal layer (vilmodel.py:381-427): the visn path cross-attends to
    language then self-attends (optionally graph-biased) then FFN; the lang2visn
    path (used by pretraining MLM, vilmodel.py:416-427) runs language queries
    over visual keys with a separate lang self-attention/FFN branch, sharing the
    cross-attention weights."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.visual_attention = BertCrossAttention(c, name="visual_attention")
        self.visn_self_att = BertAttention(c, name="visn_self_att")
        self.visn_ffn = BertFFN(c, name="visn_ffn")
        if c.use_lang2visn_attn:
            self.lang_self_att = BertAttention(c, name="lang_self_att")
            self.lang_ffn = BertFFN(c, name="lang_ffn")

    def __call__(self, lang, lang_bias, visn, visn_bias, graph_sprels=None,
                 deterministic=True):
        x = self.visual_attention(visn, lang, lang_bias, deterministic)
        self_bias = visn_bias if graph_sprels is None else visn_bias + graph_sprels
        x = self.visn_self_att(x, self_bias, deterministic)
        return self.visn_ffn(x, deterministic)

    def lang2visn(self, lang, lang_bias, visn, visn_bias, deterministic=True):
        x = self.visual_attention(lang, visn, visn_bias, deterministic)
        x = self.lang_self_att(x, lang_bias, deterministic)
        return self.lang_ffn(x, deterministic)


class CrossmodalEncoder(nn.Module):
    """Stack of GraphLXRTXLayers (vilmodel.py:451-468). Masks are bool (B, L)."""

    cfg: ModelConfig
    num_layers: int

    def setup(self):
        self.x_layers = [GraphLXRTXLayer(self.cfg, name=f"x_layers_{i}")
                         for i in range(self.num_layers)]

    def __call__(self, txt, txt_mask, img, img_mask, graph_sprels=None,
                 deterministic=True, txt_key_bias=None, img_key_bias=None):
        """`*_key_bias`: optional (B, L) float added to that side's additive
        attention bias — used to weight a single key as if it were n
        identical keys (compaction-stray emulation, ops/masking.py)."""
        from gridmm_tpu.ops.masking import attn_bias_from_mask

        txt_bias = attn_bias_from_mask(txt_mask)
        img_bias = attn_bias_from_mask(img_mask)
        if txt_key_bias is not None:
            txt_bias = txt_bias + txt_key_bias[:, None, None, :]
        if img_key_bias is not None:
            img_bias = img_bias + img_key_bias[:, None, None, :]
        for layer in self.x_layers:
            img = layer(txt, txt_bias, img, img_bias, graph_sprels,
                        deterministic)
        return img

    def lang2visn(self, txt, txt_mask, visn, visn_mask, deterministic=True):
        """Language tokens attend to visual context through every layer's lang
        branch (pretrain forward_mlm, vilmodel.py:846-853)."""
        from gridmm_tpu.ops.masking import attn_bias_from_mask

        txt_bias = attn_bias_from_mask(txt_mask)
        visn_bias = attn_bias_from_mask(visn_mask)
        for layer in self.x_layers:
            txt = layer.lang2visn(txt, txt_bias, visn, visn_bias, deterministic)
        return txt


class PreNormEncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer (models/transformer.py with
    normalize_before=True, built via models/ops.py:create_transformer_encoder)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, bias=None, deterministic=True):
        c = self.cfg
        h = LayerNorm(c.layer_norm_eps, name="norm1")(x)
        h = MultiHeadAttention(c, name="self_attn")(h, h, bias, deterministic)
        h = _dense(c.hidden_size, "attn_out", c.dtype, c.int8_matmuls)(h)
        x = x + nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        h = LayerNorm(c.layer_norm_eps, name="norm2")(x)
        h = _dense(c.intermediate_size, "linear1", c.dtype,
                   c.int8_matmuls)(h)
        h = ACT2FN[c.hidden_act](h)
        h = nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        h = _dense(c.hidden_size, "linear2", c.dtype, c.int8_matmuls)(h)
        x = x + nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        return x


class PreNormEncoder(nn.Module):
    """Stack of pre-norm layers + final LayerNorm (create_transformer_encoder
    with norm=True)."""

    cfg: ModelConfig
    num_layers: int

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True, key_bias=None):
        from gridmm_tpu.ops.masking import attn_bias_from_mask

        bias = None if mask is None else attn_bias_from_mask(mask, neg=-1e9)
        if key_bias is not None:
            kb = key_bias[:, None, None, :]
            bias = kb if bias is None else bias + kb
        for i in range(self.num_layers):
            x = PreNormEncoderLayer(self.cfg, name=f"layers_{i}")(
                x, bias, deterministic)
        return LayerNorm(self.cfg.layer_norm_eps, name="norm")(x)


class ClsPrediction(nn.Module):
    """linear -> ReLU -> LN -> linear(1) head (vilmodel.py:663-674)."""

    cfg: ModelConfig
    input_size: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = _dense(c.hidden_size, "net_0", c.dtype)(x)
        x = jax.nn.relu(x)
        x = LayerNorm(1e-12, name="net_2")(x)
        return _dense(1, "net_3", c.dtype)(x)
