"""Layout-native qkv fused attention vs the einsum reference (golden)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ops.pallas.attention_qkv import fused_attention_qkv  # noqa: E402


def _ref(qkv, heads):
    b, l, w3 = qkv.shape
    w = w3 // 3
    hd = w // heads
    q, k, v = jnp.split(qkv, 3, -1)
    q = q.reshape(b, l, heads, hd)
    k = k.reshape(b, l, heads, hd)
    v = v.reshape(b, l, heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, l, w)


@pytest.mark.parametrize("b,l,heads", [(3, 50, 4), (2, 64, 2), (5, 197, 12)])
def test_fused_attention_qkv_golden(b, l, heads):
    rng = np.random.default_rng(b + l)
    qkv = jnp.asarray(
        rng.standard_normal((b, l, 3 * heads * 64)).astype(np.float32))
    got = fused_attention_qkv(qkv, heads=heads, imgs_per_block=2,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref(qkv, heads)), atol=2e-5)


def test_fused_attention_qkv_rejects_bad_shapes():
    qkv = jnp.zeros((2, 50, 3 * 5 * 64))  # odd head count
    with pytest.raises(ValueError):
        fused_attention_qkv(qkv, heads=5, interpret=True)
    qkv = jnp.zeros((2, 50, 3 * 4 * 32))  # head_dim 32
    with pytest.raises(ValueError):
        fused_attention_qkv(qkv, heads=4, interpret=True)


def test_tower_qkv_attention_matches_xla():
    """use_qkv_attention produces the same tower output as the einsum path."""
    import dataclasses

    from gridmm_tpu.models.clip_vit import (ClipVisionConfig,
                                            ClipVisionTransformer)

    cfg = ClipVisionConfig(input_resolution=64, patch_size=32, width=128,
                           layers=2, heads=2, compute_dtype="float32")
    rng = np.random.default_rng(9)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    m0 = ClipVisionTransformer(cfg)
    p = m0.init(jax.random.PRNGKey(0), imgs)
    m1 = ClipVisionTransformer(
        dataclasses.replace(cfg, use_qkv_attention=True))
    out0 = m0.apply(p, imgs)
    out1 = m1.apply(p, imgs)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=2e-4)
