"""Instruction-relevance grid scatter-pool.

This replaces the reference's #1 hot loop — the O(B * 196 * N) Python cell-pooling
at map_nav_src/models/vilmodel.py:788-824 (and its pretrain twin at
pretrain_src/model/vilmodel.py:688-715) — with a batched, static-shape op:

    weight[b, i]  = max_t  f[b, i] . text_proj(txt[b, t])          (vilmodel.py:793-798)
    pooled[b, c]  = sum_{i in cell c} softmax_cell(weight)[i] * grid_proj(f)[b, i]
                                                                    (vilmodel.py:801-807)
    mask[b, c]    = any point landed in cell c                      (vilmodel.py:802-806)

Design notes (TPU-first):
  * The per-cell softmax needs a per-cell max for stability; that is a scatter-max
    over at most `num_cells` segments — tiny. The heavy lift, the weighted pooling
    itself, is expressed as a dense (C, N) x (N, D) matmul over a probability
    matrix so it lands on the MXU instead of a scatter.
  * Invalid points carry cell id -1 and are routed to a trash row that is sliced
    off, so no boolean compaction / dynamic shape is ever needed.
  * A fused Pallas kernel (ops/pallas/grid_pool_kernel.py) implements the same
    contract for the production path; this XLA version is the semantic reference
    and the autodiff path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def instruction_relevance(
    point_fts: jnp.ndarray,   # (B, N, D) raw grid point features (f32)
    projected_txt: jnp.ndarray,  # (B, T, D) text_proj(txt_embeds)
    txt_mask: jnp.ndarray | None = None,  # (B, T) bool; None = all tokens
) -> jnp.ndarray:
    """Per-point instruction-relevance weight: max over text tokens of the
    dot product (vilmodel.py:793-798).

    The reference takes the max over the padded text length without masking;
    pass txt_mask=None to reproduce that exactly, or a mask to exclude pads.
    """
    scores = jnp.einsum(
        "bnd,btd->bnt", point_fts, projected_txt, preferred_element_type=jnp.float32
    )
    if txt_mask is not None:
        scores = jnp.where(txt_mask[:, None, :], scores, -jnp.inf)
    return jnp.max(scores, axis=-1)


@functools.partial(jax.jit, static_argnames=("num_cells",))
def grid_scatter_pool(
    point_fts: jnp.ndarray,   # (B, N, D) projected point features to pool
    cell_ids: jnp.ndarray,    # (B, N) int32 in [-1, num_cells); -1 = invalid
    weights: jnp.ndarray,     # (B, N) f32 relevance logits
    num_cells: int = 196,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment-softmax pooling of points into grid cells.

    Returns:
      pooled: (B, num_cells, D) — softmax(weights within cell) . features;
              zero for empty cells (reference zero-initializes, vilmodel.py:789).
      cell_mask: (B, num_cells) bool — cell received >= 1 point.
    """
    b, n, d = point_fts.shape
    valid = cell_ids >= 0
    # Route invalids to trash segment `num_cells`.
    seg = jnp.where(valid, cell_ids, num_cells).astype(jnp.int32)

    # Per-cell max for a numerically stable softmax. NOT a scatter: XLA
    # lowers .at[].max / fancy gathers to serialized scatter/gather ops that
    # measured ~18 ms each on a (8, 8820) buffer. A (B, C+1, N) masked
    # reduce fuses into two passes over the compare mask instead.
    neg = jnp.float32(-1e30)
    w = jnp.where(valid, weights.astype(jnp.float32), neg)
    match = seg[:, None, :] == jnp.arange(num_cells + 1)[None, :, None]
    cell_max = jnp.max(jnp.where(match, w[:, None, :], neg), axis=-1)
    # exactly one row of `match` is True per point -> the sum IS the gather
    point_max = jnp.sum(jnp.where(match, cell_max[:, :, None], 0.0), axis=1)

    exp_w = jnp.where(valid, jnp.exp(w - point_max), 0.0)

    # One-hot probability matrix -> MXU matmuls for both denominator and pooling.
    onehot = (seg[:, :, None] == jnp.arange(num_cells)[None, None, :]).astype(jnp.float32)
    denom = jnp.einsum("bnc,bn->bc", onehot, exp_w)  # (B, C)
    numer = jnp.einsum(
        "bnc,bn,bnd->bcd", onehot, exp_w, point_fts.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    cell_mask = denom > 0
    # Every nonempty cell has denom >= 1 (its max element contributes exp(0));
    # substituting 1 for empty cells is exact and keeps the division's VJP
    # finite (a tiny epsilon underflows to 0 when squared in the backward,
    # yielding 0/0 = NaN that leaks through the where).
    safe_denom = jnp.where(cell_mask, denom, 1.0)
    pooled = numer / safe_denom[..., None]
    pooled = jnp.where(cell_mask[..., None], pooled, 0.0)
    return pooled, cell_mask


def _chunk_and_pad(point_fts, cell_ids, weights):
    """Kernel chunking shared by forward and backward.

    Picks the largest sublane-aligned chunk that divides N, capped so the
    streamed feature block (+ one-hot) fits the ~16 MB scoped-VMEM budget
    WITH Pallas's input double-buffering: a bf16 buffer allows 4096 (3920 is
    the selected divisor at the serving N=11760 and beat the earlier 2352
    default), but an f32 buffer at chunk 2944/d=768 measured a 17.3 MB VMEM
    stack OOM on v5e — f32 caps at 2048. Fewer grid blocks is still better
    within the cap. A non-divisible N pads with invalid points (cell id -1
    never matches a one-hot row, so padding is exact)."""
    n = point_fts.shape[1]
    cap = 4096 if point_fts.dtype == jnp.bfloat16 else 2048
    return _chunk_and_pad_cap(point_fts, cell_ids, weights, cap)


def _chunk_and_pad_cap(point_fts, cell_ids, weights, cap: int):
    n = point_fts.shape[1]
    divisors = [c for c in range(cap, 15, -16) if n % c == 0]
    if divisors:
        return point_fts, cell_ids, weights, divisors[0]
    pad = (-n) % 512
    point_fts = jnp.pad(point_fts, ((0, 0), (0, pad), (0, 0)))
    cell_ids = jnp.pad(cell_ids, ((0, 0), (0, pad)), constant_values=-1)
    weights = jnp.pad(weights, ((0, 0), (0, pad)))
    return point_fts, cell_ids, weights, 512


@jax.custom_vjp
def grid_scatter_pool_pallas(point_fts, cell_ids, weights):
    """Pallas-kernel pool, forward AND backward (grid_pool_kernel.py):
    numerically the same contract as grid_scatter_pool, without ever
    materializing the (B, N, C) probability tensor the XLA VJP builds."""
    from gridmm_tpu.ops.pallas.grid_pool_kernel import pallas_grid_pool

    f, c, w, chunk = _chunk_and_pad(point_fts, cell_ids, weights)
    return pallas_grid_pool(f, c, w, chunk=chunk)


def _pallas_fwd(point_fts, cell_ids, weights):
    from gridmm_tpu.ops.pallas.grid_pool_kernel import pallas_grid_pool_raw

    f, c, w, chunk = _chunk_and_pad(point_fts, cell_ids, weights)
    pooled, cell_mask, denom_pad = pallas_grid_pool_raw(f, c, w, chunk=chunk)
    return (pooled, cell_mask), (point_fts, cell_ids, weights, denom_pad)


def _pallas_bwd(res, cot):
    import numpy as np

    from gridmm_tpu.ops.pallas.grid_pool_kernel import pallas_grid_pool_bwd

    point_fts, cell_ids, weights, denom_pad = res
    n = point_fts.shape[1]
    # the backward streams ~2.5x the forward per block (g in + dg out + the
    # gathered-cotangent intermediate), so it takes a tighter chunk cap to
    # stay inside scoped VMEM
    f, c, w, chunk = _chunk_and_pad_cap(point_fts, cell_ids, weights, 1024)
    d_f, d_w = pallas_grid_pool_bwd(f, c, w, denom_pad, cot[0], chunk=chunk)
    d_f = d_f[:, :n].astype(point_fts.dtype)
    d_w = d_w[:, :n].astype(weights.dtype)
    return d_f, np.zeros(cell_ids.shape, jax.dtypes.float0), d_w


grid_scatter_pool_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def relevance_weighted_grid(
    point_fts: jnp.ndarray,      # (B, N, D) raw CLIP patch features
    cell_ids: jnp.ndarray,       # (B, N) int32, -1 invalid
    txt_embeds: jnp.ndarray,     # (B, T, D)
    text_proj_w: jnp.ndarray,    # (D, D)
    text_proj_b: jnp.ndarray,    # (D,)
    grid_proj_w: jnp.ndarray,    # (D, D)
    grid_proj_b: jnp.ndarray,    # (D,)
    txt_mask: jnp.ndarray | None = None,
    num_cells: int = 196,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full fused contract: text projection -> relevance -> projection -> pool.

    Mirrors vilmodel.py:793-807 end to end. Projecting the T<=256 text tokens
    instead of the N~9k points keeps the relevance matmul cheap.
    """
    f32 = jnp.float32
    proj_txt = txt_embeds.astype(f32) @ text_proj_w.astype(f32) + text_proj_b.astype(f32)
    w = instruction_relevance(point_fts.astype(f32), proj_txt, txt_mask)
    g = point_fts.astype(f32) @ grid_proj_w.astype(f32) + grid_proj_b.astype(f32)
    if use_pallas and num_cells == 196:
        return grid_scatter_pool_pallas(g, cell_ids, w)
    return grid_scatter_pool(g, cell_ids, w, num_cells)
