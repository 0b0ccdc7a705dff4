"""Fused Pallas LayerNorm vs the XLA f32-stats LayerNorm (golden)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ops.pallas.layernorm import fused_layernorm  # noqa: E402


def _ref(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    m = xf.mean(-1, keepdims=True)
    v = ((xf - m) ** 2).mean(-1, keepdims=True)
    return ((xf - m) / jnp.sqrt(v + eps) * scale + bias).astype(x.dtype)


def test_fused_layernorm_golden_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 50, 256)).astype(np.float32) * 2)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (256,)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((256,)).astype(np.float32) * 0.1)
    got = fused_layernorm(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(
        _ref(x, scale, bias)), atol=1e-5)


def test_fused_layernorm_golden_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((7, 384)).astype(np.float32)).astype(
        jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (384,)).astype(np.float32))
    bias = jnp.zeros((384,), jnp.float32)
    got = fused_layernorm(x, scale, bias, interpret=True)
    want = _ref(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_fused_layernorm_row_padding():
    """Rows not a multiple of the block are padded and sliced exactly."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((13, 128)).astype(np.float32))
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    got = fused_layernorm(x, scale, bias, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(
        _ref(x, scale, bias)), atol=1e-5)


def test_fused_layernorm_non_tile_width_fallback():
    """C not a multiple of 128 takes the XLA fallback, same numerics."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 100)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (100,)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((100,)).astype(np.float32))
    got = fused_layernorm(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(
        _ref(x, scale, bias)), atol=1e-5)


def test_clip_tower_pallas_ln_matches():
    """The flag changes the compute path, not the function: tower outputs
    agree and the param tree is identical."""
    from gridmm_tpu.models.clip_vit import (ClipVisionConfig,
                                            ClipVisionTransformer)

    cfg = ClipVisionConfig(input_resolution=64, patch_size=32, width=128,
                           layers=1, heads=4, compute_dtype="float32")
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    m0 = ClipVisionTransformer(cfg)
    p0 = m0.init(jax.random.PRNGKey(0), imgs)
    import dataclasses

    m1 = ClipVisionTransformer(dataclasses.replace(cfg, use_pallas_ln=True))
    p1 = m1.init(jax.random.PRNGKey(0), imgs)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    out0 = m0.apply(p0, imgs)
    out1 = m1.apply(p0, imgs)  # same params, pallas-LN path (interpret on CPU)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-4)
