"""CLIP Vision Transformer (visual tower), JAX-native.

Re-implements the reference's vendored OpenAI CLIP visual encoder
(preprocess/model_clip.py:29-98): conv patchify -> [cls] + pos embed -> ln_pre
-> N pre-norm residual attention blocks with QuickGELU -> ln_post, returning
ALL token hidden states (no projection/pooling — model_clip.py:126-137), which
feed the grid memory (patch tokens) downstream.

TPU-first details:
  * patchify is an unfold+matmul (einsum) rather than a conv — identical math,
    lands directly on the MXU with no im2col surprises;
  * bfloat16 activations by default with f32 LayerNorm (model_clip.py:15-21
    does the same fp32-LN trick for fp16);
  * attention over <=~197 tokens: batch is the parallel axis; XLA fuses QKV.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    compute_dtype: str = "bfloat16"
    use_pallas_attention: bool = False
    int8_matmuls: bool = False  # serving path: int8 MXU projections/MLP
    # serving path: keep raw attention scores in compute_dtype instead of f32.
    # Halves the (B, heads, T, T) HBM traffic (~12% end-to-end on the encode
    # pipeline); softmax still normalizes in f32. Default f32 for fidelity —
    # the torch reference's fp16 scores carry ~8x less rounding than bf16.
    attn_scores_f32: bool = True
    # timm-ViT variant knobs (vit_base_patch16_224 used as the CE view
    # encoder, VLN_CE gridmap/vilmodel.py:631): biased conv patchify, no
    # ln_pre, erf GELU. CLIP keeps the defaults.
    gelu: str = "quick"  # "quick" (CLIP) | "erf" (timm)
    ln_pre: bool = True
    conv_bias: bool = False
    # serving path: fused Pallas LayerNorm — one bf16 HBM read+write with
    # in-register f32 stats instead of XLA's materialized f32 upcast
    use_pallas_ln: bool = False
    # serving path: layout-native fused attention consuming the packed qkv
    # projection directly (head pairs = 128-lane tiles; block-diagonal
    # two-heads-per-matmul) — removes XLA's (B,L,H,64) relayout copies.
    # Requires head_dim 64.
    use_qkv_attention: bool = False

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.grid * self.grid + 1

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def clip_b32() -> ClipVisionConfig:
    """ViT-B/32 — produces the 7x7+1=50 grid tokens consumed by the grid memory
    (map_nav_src/r2r/env.py:100)."""
    return ClipVisionConfig(patch_size=32)


def clip_b16() -> ClipVisionConfig:
    """ViT-B/16 — 196+1 tokens (preprocess/get_map_feature.py:41-50 config)."""
    return ClipVisionConfig(patch_size=16)


def vit_b16_timm() -> ClipVisionConfig:
    """timm vit_base_patch16_224 — the CE live view encoder whose cls token
    is the per-view feature (Policy_ViewSelection_GridMap.py:338
    forward_features[:, 0, :]; weights from vit_base_p16_224.pth)."""
    return ClipVisionConfig(patch_size=16, gelu="erf", ln_pre=False,
                            conv_bias=True)


class _LnParams(nn.Module):
    """scale/bias with the exact nn.LayerNorm param tree (ln/scale, ln/bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class ClipLayerNorm(nn.Module):
    """f32 LayerNorm (model_clip.py:15-21), eps matches torch default 1e-5.

    use_pallas routes through ops/pallas/layernorm.fused_layernorm — same
    math and the same param tree, one HBM pass each way."""

    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        if self.use_pallas:
            from gridmm_tpu.ops.pallas.layernorm import fused_layernorm

            scale, bias = _LnParams(x.shape[-1], name="ln")()
            return fused_layernorm(x, scale, bias, eps=1e-5)
        return nn.LayerNorm(epsilon=1e-5, name="ln")(
            x.astype(jnp.float32)).astype(dt)


class MaybeInt8Dense(nn.Module):
    """nn.Dense-compatible layer (same param layout) with an optional int8
    MXU matmul path."""

    features: int
    use_int8: bool
    dtype: any

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.use_int8:
            from gridmm_tpu.ops.quant import int8_dense

            return int8_dense(x, kernel, bias)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        return y + bias.astype(self.dtype)


class ResidualAttentionBlock(nn.Module):
    """Pre-norm attention + QuickGELU MLP (model_clip.py:29-54)."""

    cfg: ClipVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h, hd = c.heads, c.width // c.heads
        dt = c.dtype

        def dense(features, name):
            return MaybeInt8Dense(features, c.int8_matmuls, dt, name=name)

        y = ClipLayerNorm(c.use_pallas_ln, name="ln_1")(x)
        qkv = dense(3 * c.width, "attn_in_proj")(y)
        if c.use_qkv_attention:
            from gridmm_tpu.ops.pallas.attention_qkv import fused_attention_qkv

            ctx = fused_attention_qkv(qkv, heads=h)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            b, l, _ = q.shape
            q = q.reshape(b, l, h, hd)
            k = k.reshape(b, l, h, hd)
            v = v.reshape(b, l, h, hd)
            if c.use_pallas_attention:
                from gridmm_tpu.ops.pallas.attention import fused_attention

                def fold(t):
                    return t.transpose(0, 2, 1, 3).reshape(b * h, l, hd)

                ctx = fused_attention(fold(q), fold(k), fold(v))
                ctx = ctx.reshape(b, h, l, hd).transpose(0, 2, 1, 3)
            elif c.attn_scores_f32:
                scores = jnp.einsum(
                    "bqhd,bkhd->bhqk", q, k,
                    preferred_element_type=jnp.float32) / jnp.sqrt(
                        jnp.float32(hd))
                probs = jax.nn.softmax(scores, axis=-1).astype(dt)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                                 preferred_element_type=jnp.float32).astype(dt)
            else:
                # scores in compute dtype (MXU still accumulates f32
                # internally); softmax upcasts to f32 in-register
                scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.asarray(
                    hd ** 0.5, dt)
                probs = jax.nn.softmax(scores.astype(jnp.float32),
                                       axis=-1).astype(dt)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                                 preferred_element_type=jnp.float32).astype(dt)
            ctx = ctx.reshape(b, l, c.width)
        x = x + dense(c.width, "attn_out_proj")(ctx)

        y = ClipLayerNorm(c.use_pallas_ln, name="ln_2")(x)
        y = dense(4 * c.width, "mlp_c_fc")(y)
        if c.gelu == "quick":
            y = y * jax.nn.sigmoid(1.702 * y)  # QuickGELU (model_clip.py:24-26)
        else:
            y = jax.nn.gelu(y.astype(jnp.float32),
                            approximate=False).astype(dt)  # timm nn.GELU
        x = x + dense(c.width, "mlp_c_proj")(y)
        return x


class ClipVisionTransformer(nn.Module):
    """Returns all token hiddens (B, grid^2+1, width)."""

    cfg: ClipVisionConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) float, already CLIP-normalized."""
        c = self.cfg
        dt = c.dtype
        b = images.shape[0]
        p, g = c.patch_size, c.grid

        # patchify: (B, g, p, g, p, 3) -> (B, g*g, p*p*3) @ (p*p*3, width)
        x = images.astype(dt).reshape(b, g, p, g, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
        x = nn.Dense(c.width, use_bias=c.conv_bias, dtype=dt, name="conv1")(x)

        cls = self.param("class_embedding",
                         nn.initializers.normal(c.width ** -0.5), (c.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (b, 1, c.width)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c.width ** -0.5),
                         (c.num_tokens, c.width))
        x = x + pos.astype(dt)
        if c.ln_pre:
            x = ClipLayerNorm(c.use_pallas_ln, name="ln_pre")(x)
        for i in range(c.layers):
            x = ResidualAttentionBlock(c, name=f"resblock_{i}")(x)
        return ClipLayerNorm(c.use_pallas_ln, name="ln_post")(x)


# CLIP preprocessing constants (OpenAI CLIP normalization used by
# preprocess/get_map_feature.py's img_transforms).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_images(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> CLIP-normalized float32."""
    x = images_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std


# timm vit_base_patch16_224 preprocessing (resolve_data_config defaults used
# by the reference CE policy, gridmap/vilmodel.py:632-633: mean=std=0.5).
TIMM_MEAN = (0.5, 0.5, 0.5)
TIMM_STD = (0.5, 0.5, 0.5)


def normalize_images_timm(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> timm-ViT-normalized float32."""
    x = images_uint8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(TIMM_MEAN, jnp.float32)) / jnp.asarray(
        TIMM_STD, jnp.float32)
