"""Layout-native fused attention for head_dim-64 ViT towers.

Device profile of the serving CLIP pipeline (B=192 images, int8 matmuls):
4.3 ms/iter of the 15.3 ms total is pure layout copies — XLA relayouts
(B, L, H, 64) q/k/v into per-(batch, head) tiles around the attention
einsums (36 copies of bf16[192,50,12,64] per iteration). This kernel reads
the qkv projection output (B, L, 3W) DIRECTLY:

  * head_dim 64 means two consecutive heads occupy exactly one 128-lane
    tile of the projection output — a head pair is a natural VMEM slice,
    no relayout anywhere;
  * per pair, scores for both heads come from ONE MXU matmul with a
    block-diagonal key matrix: [q0|q1] (L,128) @ blockdiag(k0,k1)^T (128,2L)
    = [q0k0^T | q1k1^T]. Contraction is the full 128 lanes — none of the
    pad-to-128 waste that made the per-head kernel (ops/pallas/attention.py)
    lose to XLA;
  * softmax is computed per half in f32 in-register; the (L, 2L) score
    block never touches HBM;
  * the PV matmul against blockdiag(v0, v1) lands the context back in the
    (L, [h0|h1]) lane layout, so the output is (B, L, W) with no transpose.

Semantics: full bidirectional attention over the true sequence length
(padding masked with -inf), matching softmax(QK^T/sqrt(hd))V per head.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_qkv_kernel(qkv_ref, o_ref, *, width: int, heads: int,
                     imgs_per_block: int, true_len: int, scale: float):
    lp = qkv_ref.shape[-2]
    hd = width // heads
    pairs = heads // 2

    # lane masks for the block-diagonal build: lanes [0,hd) / [hd,2hd)
    lane = jax.lax.broadcasted_iota(jnp.int32, (lp, 2 * hd), 1)
    lane_lo = (lane < hd).astype(jnp.float32)
    lane_hi = 1.0 - lane_lo

    # score mask: column j of the (lp, 2lp) block is key (j mod lp)
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, 2 * lp), 1)
    key_bias = jnp.where((col % lp) < true_len, 0.0, -1e30)
    is_lo = col < lp  # head-0 columns of the paired score block

    def img_body(i, _):
        def pair_body(p, _):
            q2 = qkv_ref[i, :, pl.ds(p * 2 * hd, 2 * hd)]
            k2 = qkv_ref[i, :, pl.ds(width + p * 2 * hd, 2 * hd)]
            v2 = qkv_ref[i, :, pl.ds(2 * width + p * 2 * hd, 2 * hd)]
            k2 = k2.astype(jnp.float32)
            v2 = v2.astype(jnp.float32)
            kbd = jnp.concatenate([k2 * lane_lo, k2 * lane_hi],
                                  axis=0)  # (2lp, 2hd) block-diagonal
            vbd = jnp.concatenate([v2 * lane_lo, v2 * lane_hi], axis=0)
            s = jax.lax.dot_general(
                q2.astype(jnp.float32) * scale, kbd,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + key_bias  # (lp, 2lp)
            # per-head softmax over the two column halves via masked
            # full-width reductions (Mosaic rejects lane-splitting reshapes)
            neg = jnp.float32(-1e30)
            m_lo = jnp.max(jnp.where(is_lo, s, neg), -1, keepdims=True)
            m_hi = jnp.max(jnp.where(is_lo, neg, s), -1, keepdims=True)
            e = jnp.exp(s - jnp.where(is_lo, m_lo, m_hi))
            z_lo = jnp.sum(jnp.where(is_lo, e, 0.0), -1, keepdims=True)
            z_hi = jnp.sum(jnp.where(is_lo, 0.0, e), -1, keepdims=True)
            prob = e / jnp.where(is_lo, z_lo, z_hi)
            ctx = jax.lax.dot_general(
                prob.astype(vbd.dtype), vbd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (lp, 2hd)
            o_ref[i, :, pl.ds(p * 2 * hd, 2 * hd)] = ctx.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, pairs, pair_body, 0)
        return 0

    jax.lax.fori_loop(0, imgs_per_block, img_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("heads", "imgs_per_block", "interpret"))
def fused_attention_qkv(qkv: jnp.ndarray, heads: int,
                        imgs_per_block: int = 8,
                        interpret: Optional[bool] = None) -> jnp.ndarray:
    """qkv: (B, L, 3*W) packed projection output -> context (B, L, W).

    Requires head_dim == 64 and W % 128 == 0 (ViT-B towers). interpret
    defaults to True off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, l, w3 = qkv.shape
    width = w3 // 3
    hd = width // heads
    if hd != 64 or width % 128 or heads % 2:
        raise ValueError(f"fused_attention_qkv needs head_dim 64 and even "
                         f"heads over a 128-multiple width, got "
                         f"width={width} heads={heads}")
    scale = 1.0 / (hd ** 0.5)
    lp = -(-l // 64) * 64  # one (lp, 2lp) f32 score tile per pair
    # keep the qkv block + output + per-pair f32 intermediates within the
    # ~16 MB VMEM budget: 8 images at lp=64 (CLIP p32), 2 at lp=256 (p16)
    imgs_per_block = max(1, min(imgs_per_block, (8 * 64) // lp))
    bp = -(-b // imgs_per_block) * imgs_per_block
    qkvp = qkv
    if lp != l or bp != b:
        qkvp = jnp.pad(qkv, ((0, bp - b), (0, lp - l), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_attn_qkv_kernel, width=width, heads=heads,
                          imgs_per_block=imgs_per_block, true_len=l,
                          scale=scale),
        grid=(bp // imgs_per_block,),
        in_specs=[pl.BlockSpec((imgs_per_block, lp, w3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((imgs_per_block, lp, width),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, lp, width), qkv.dtype),
        interpret=interpret,
    )(qkvp)
    return out[:b, :l, :]
