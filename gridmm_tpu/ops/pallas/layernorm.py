"""Fused LayerNorm Pallas kernel.

The ViT serving path spends ~6 ms/iter in LayerNorms at B=16 (PARITY.md perf
profile): the f32-stats LN (model_clip.py:15-21 semantics) makes XLA
materialize an f32 upcast of the (B*V, L, W) activation around the two
reduces, turning a 2-pass bf16 op into ~4 passes over f32 data. This kernel
reads the bf16 block once into VMEM, computes mean/variance in f32
in-register, and writes the bf16 result — one HBM read + one write total.

Numerics match nn.LayerNorm(epsilon)(x.astype(f32)) to bf16 rounding.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (block_rows, C)
    m = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - m
    v = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(v + eps)
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    o_ref[...] = (y * g + b).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    eps: float = 1e-5, block_rows: int = 256,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """LayerNorm over the last axis with f32 statistics.

    x: (..., C) with C a multiple of 128 (the ViT widths are); scale/bias: (C,).
    Returns x.dtype. interpret defaults to True off-TPU (tests/CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    shape = x.shape
    c = shape[-1]
    if c % 128 != 0:  # fall back rather than pad lanes
        y = jax.nn.standardize(x.astype(jnp.float32), axis=-1, epsilon=eps)
        return (y * scale + bias).astype(x.dtype)
    rows = 1
    for s in shape[:-1]:
        rows *= s
    xr = x.reshape(rows, c)
    br = min(block_rows, -(-rows // 8) * 8)
    rp = -(-rows // br) * br
    if rp != rows:
        xr = jnp.pad(xr, ((0, rp - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rp // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, c), x.dtype),
        interpret=interpret,
    )(xr, scale.reshape(1, c), bias.reshape(1, c))
    return out[:rows].reshape(shape)
