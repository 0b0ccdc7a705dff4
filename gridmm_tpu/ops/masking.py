"""Mask utilities (static-shape replacements for map_nav_src/models/ops.py).

The reference builds boolean masks from python-int lengths and pads tensors to
per-batch maxima (ops.py:36-68); here every sequence lives in a fixed-capacity
buffer and masks are plain (B, L) bool arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

# BERT-style additive mask value (models/ops.py:33 uses -10000.0).
NEG_MASK = -10000.0
# Exact -inf for logit masking, matching the reference's masked_fill_
# (vilmodel.py:868-877). Downstream consumers MUST be -inf-safe: losses go
# through masked_log_softmax (train/losses.py) and host-side softmaxes in the
# agents special-case non-finite entries — do not feed these logits to a plain
# jax.nn.softmax if a row can be fully masked.
NEG_INF = -jnp.inf


def seq_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool (models/ops.py gen_seq_masks)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def attn_bias_from_mask(mask: jnp.ndarray, dtype=jnp.float32, neg: float = NEG_MASK) -> jnp.ndarray:
    """(B, Lk) bool key mask -> (B, 1, 1, Lk) additive bias
    (models/ops.py extend_neg_masks)."""
    return ((1.0 - mask.astype(dtype)) * neg)[:, None, None, :]


def mask_logits(logits: jnp.ndarray, mask: jnp.ndarray, neg=NEG_INF) -> jnp.ndarray:
    """Set logits to `neg` where mask is False (torch masked_fill_ equivalent)."""
    return jnp.where(mask, logits, neg)


def compaction_stray_count(cell_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-item count of the reference's stray compaction keys.

    The reference's max_cell_num compaction loop mutates grid_masks[b] through
    an ALIASED view (vilmodel.py:816-820): `grid_masks[b,:grid_mask.sum()]=1`
    re-writes the row `grid_mask` points at, so the following
    `grid_masks[b,grid_mask.sum():]=0` re-evaluates the sum on the mutated
    row (cnt ones up front plus the original ones at positions >= cnt) and
    zeroes only from cnt+K on. Net effect: positions
    p in [cnt, min(cnt+K, max_cell_num)) with an ORIGINAL occupied bit keep
    mask=1 while their embedding rows are zero padding — every batch item
    with fewer occupied cells than the batch max attends to that many
    all-zero keys. Released checkpoints were trained under this behavior, so
    the TPU model reproduces it exactly (see GridMMNavigator.fusion_trunk:
    all strays are identical zero tokens, hence ONE extra token with a
    log(count) key bias).

    cell_mask: (B, C) bool occupied-cell mask. Returns (B,) int32.
    """
    m = cell_mask.astype(jnp.int32)
    cnt = jnp.sum(m, axis=1)                       # (B,)
    max_cell = jnp.max(cnt)                        # batch max_cell_num
    idx = jnp.arange(cell_mask.shape[1])[None, :]  # (1, C)
    ge = m * (idx >= cnt[:, None])
    k = jnp.sum(ge, axis=1)                        # ones at positions >= cnt
    hi = jnp.minimum(cnt + k, max_cell)[:, None]
    return jnp.sum(ge * (idx < hi), axis=1).astype(jnp.int32)
