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
