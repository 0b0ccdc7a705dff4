"""Int8 quantized matmul helpers (serving-path acceleration).

TPU MXUs run int8 x int8 -> int32 at ~2x bf16 throughput. For the offline
CLIP feature extractor (a pure inference workload), dynamic per-tensor
activation quantization + per-channel weight quantization trades a small
feature error (cosine > 0.999 in tests) for matmul speed. No reference
equivalent (the reference runs fp16/fp32); flag-gated via
ClipVisionConfig.int8_matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_per_channel(w: jnp.ndarray):
    """(in, out) weights -> int8 + per-out-channel scale."""
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_dense(x: jnp.ndarray, kernel: jnp.ndarray,
               bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """y = x @ kernel + bias with int8 MXU arithmetic.

    x: (..., in) float; kernel: (in, out) float (quantized on the fly — XLA
    hoists the weight quantization out of any loop since it is
    input-independent)."""
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_absmax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8)
    x_scale = x_absmax / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)

    wq, w_scale = quantize_per_channel(kernel.astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(in_dtype)
