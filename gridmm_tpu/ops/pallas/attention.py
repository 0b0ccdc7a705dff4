"""Pallas fused attention for short-sequence ViT workloads.

The CLIP towers attend over 50 (p32) / 197 (p16) tokens with a huge batch of
(images x heads) — the whole sequence fits VMEM, so this is a single-pass
fused softmax(QK^T)V per (batch, head) block rather than an online-softmax
flash kernel: the (B, H, L, L) score tensor never reaches HBM. Sequence
padding is masked inside the kernel (the true length is static).

Wired behind ClipVisionConfig.use_pallas_attention, default OFF: measured on
the dev chip, the XLA path wins for ViT-B (head_dim 64 must pad to the
128-lane tile inside the kernel, doubling the attention work — 8225 vs 5911
views/s in the full bench pipeline). The kernel pays off for head_dim >= 128
workloads and is kept correctness-tested for that case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 heads_per_block: int, true_len: int):
    lp = q_ref.shape[-2]
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    key_bias = jnp.where(col < true_len, 0.0, -1e30).astype(jnp.float32)

    def body(h, _):
        q = q_ref[h]  # (Lp, hd)
        k = k_ref[h]
        v = v_ref[h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + key_bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[h] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads_per_block, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("heads_per_block", "interpret"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    heads_per_block: int = 8,
                    interpret: bool = False) -> jnp.ndarray:
    """q, k, v: (BH, L, hd) -> (BH, L, hd). Full (unmasked) attention over the
    true L; internal padding handled exactly."""
    bh, l, hd = q.shape
    scale = 1.0 / (hd ** 0.5)
    lp = -(-l // 8) * 8       # sublane-align sequence
    hdp = -(-hd // 128) * 128  # lane-align head dim

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, lp - l), (0, hdp - hd)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    if bh % heads_per_block != 0:
        padb = heads_per_block - bh % heads_per_block
        zeros = jnp.zeros((padb, lp, hdp), qp.dtype)
        qp = jnp.concatenate([qp, zeros])
        kp = jnp.concatenate([kp, zeros])
        vp = jnp.concatenate([vp, zeros])
    nb = qp.shape[0] // heads_per_block

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale,
                          heads_per_block=heads_per_block, true_len=l),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((heads_per_block, lp, hdp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((heads_per_block, lp, hdp),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:bh, :l, :hd]
