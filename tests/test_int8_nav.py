"""Int8 serving path of the navigator trunk.

ModelConfig.int8_matmuls swaps the transformer projections/FFN onto the int8
MXU path with an UNCHANGED param layout: the same checkpoint tree must apply
to both models, and the quantized forward must track the f32 forward closely
(per-tensor activation + per-channel weight quantization)."""

import dataclasses
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.config import tiny_config  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.train.step import init_carry, nav_device_step  # noqa: E402
from gridmm_tpu.utils.export import zero_step_inputs  # noqa: E402


def _cos(a, b):
    a, b = a.ravel(), b.ravel()
    return float(np.dot(a, b) /
                 (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_int8_param_layout_identical_and_logits_track_f32():
    cfg = tiny_config()
    cfg8 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, int8_matmuls=True))
    model = GridMMNavigator(cfg.model)
    model8 = GridMMNavigator(cfg8.model)

    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    params8 = init_navigator(model8, cfg8.shapes, jax.random.PRNGKey(0))
    # identical checkpoint tree: every leaf same path/shape/dtype
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flat8 = jax.tree_util.tree_flatten_with_path(params8)[0]
    assert [(p, v.shape, v.dtype) for p, v in flat] == \
           [(p, v.shape, v.dtype) for p, v in flat8]

    rng = np.random.default_rng(0)
    b = 2
    t = cfg.shapes.max_txt_len
    txt_ids = np.asarray(rng.integers(1, 100, (b, t)), np.int32)
    txt_mask = (np.arange(t)[None] < 9) * np.ones((b, 1), bool)
    x = zero_step_inputs(cfg, b)
    x = x._replace(
        view_img_fts=np.asarray(
            rng.standard_normal(x.view_img_fts.shape), np.float32) * 0.3,
        view_mask=np.ones(x.view_mask.shape, bool),
        nav_types=np.ones(x.nav_types.shape, np.int32),
        depth=np.asarray(rng.integers(100, 15000, x.depth.shape), np.float32),
        patch_fts=np.asarray(
            rng.standard_normal(x.patch_fts.shape), np.float32) * 0.3,
        gmap_mask=(np.arange(x.gmap_mask.shape[1])[None] < 4)
        * np.ones((b, 1), bool),
        vp_nav_mask=np.ones(x.vp_nav_mask.shape, bool),
    )

    outs = {}
    for name, m, c in (("f32", model, cfg), ("int8", model8, cfg8)):
        txt = jax.jit(lambda p, i, mk, m=m: m.apply(
            p, "language", {"txt_ids": i, "txt_mask": mk}))(
                params, txt_ids, txt_mask)
        _, out = jax.jit(lambda p, tt, mk, cr, xx, m=m, c=c: nav_device_step(
            m, c, p, tt, mk, cr, xx))(
                params, txt, txt_mask, init_carry(c, b), x)
        outs[name] = out

    ref = np.asarray(outs["f32"].fused_logits)
    got = np.asarray(outs["int8"].fused_logits)
    fin = np.isfinite(ref)
    assert (np.isfinite(got) == fin).all()  # identical masking
    assert _cos(got[fin], ref[fin]) > 0.99
    # quantization error must stay small vs the logit spread
    spread = ref[fin].max() - ref[fin].min() + 1e-9
    assert np.abs(got[fin] - ref[fin]).max() / spread < 0.2
