"""Waypoint predictor + NMS tests."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.models.waypoint import (WaypointConfig, WaypointPredictor,  # noqa: E402
                                        neighbor_attention_mask, waypoint_nms)


def test_neighbor_mask_circular():
    m = np.asarray(neighbor_attention_mask(12, 1))
    assert m[0, 0] and m[0, 1] and m[0, 11]        # wraps around
    assert not m[0, 2] and not m[0, 6]
    assert (m.sum(1) == 3).all()


def test_predictor_shapes_and_finiteness():
    cfg = WaypointConfig(hidden_dim=64, rgb_feat_dim=96, depth_feat_dim=48,
                         num_layers=1, num_heads=4)
    model = WaypointPredictor(cfg)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((2 * 12, 96)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((2 * 12, 48)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), rgb, depth)
    out = model.apply(params, rgb, depth)
    assert out.shape == (2, 120, 12)
    assert bool(jnp.isfinite(out).all())


def test_depth_only_variant():
    cfg = WaypointConfig(hidden_dim=64, depth_feat_dim=48, num_layers=1,
                         num_heads=4, use_rgb=False)
    model = WaypointPredictor(cfg)
    depth = jnp.ones((12, 48))
    params = model.init(jax.random.PRNGKey(0), None, depth)
    out = model.apply(params, None, depth)
    assert out.shape == (1, 120, 12)


def test_nms_selects_separated_peaks():
    a, d = 120, 12
    hm = np.zeros((1, a, d), np.float32)
    hm[0, 10, 5] = 3.0
    hm[0, 11, 5] = 2.5   # within suppression radius of the first -> dropped
    hm[0, 60, 2] = 2.0
    hm[0, 118, 8] = 1.5
    out = np.asarray(waypoint_nms(jnp.asarray(hm), max_predictions=3,
                                  sigma=(4.0, 4.0)))
    kept = sorted(zip(*np.nonzero(out[0])))
    assert (10, 5) in kept and (60, 2) in kept and (118, 8) in kept
    assert (11, 5) not in kept
    assert len(kept) == 3


def test_nms_pad_row_duplicate_burns_iteration():
    """Reference-exact pad-row behavior (Policy:373-384): an angle-0 peak is
    duplicated onto the trailing pad row; the duplicate is picked on a later
    iteration and stripped, AND its suppression window reaches back across
    the boundary to kill the weaker angle-118 peak — which the direct
    suppression from angle 0 never touches (the pad wrap is only +/-1 row).
    Verified against the executed reference: angle 118 is lost at ANY
    max_predictions."""
    a, d = 120, 12
    hm = np.zeros((1, a, d), np.float32)
    hm[0, 0, 5] = 3.0
    hm[0, 118, 5] = 2.5
    for mp in (2, 4):
        out = np.asarray(waypoint_nms(jnp.asarray(hm), max_predictions=mp,
                                      sigma=(4.0, 4.0)))
        assert out[0, 0, 5] > 0
        assert out[0, 118, 5] == 0


def test_nms_one_sided_distance_wrap():
    """utils.py:25 circular_x = min(|dx|, |dx + W|): a far-distance peak also
    suppresses the NEAR bins of its column, but not vice versa."""
    a, d = 120, 12
    hm = np.zeros((1, a, d), np.float32)
    hm[0, 50, 11] = 3.0
    hm[0, 50, 1] = 2.5    # dx = -10, |dx + 12| = 2 <= 4 -> suppressed
    out = np.asarray(waypoint_nms(jnp.asarray(hm), max_predictions=2,
                                  sigma=(4.0, 4.0)))
    assert out[0, 50, 11] > 0 and out[0, 50, 1] == 0
    hm2 = np.zeros((1, a, d), np.float32)
    hm2[0, 50, 1] = 3.0
    hm2[0, 50, 11] = 2.5  # dx = +10, |dx + 12| = 22 -> NOT suppressed
    out2 = np.asarray(waypoint_nms(jnp.asarray(hm2), max_predictions=2,
                                   sigma=(4.0, 4.0)))
    assert out2[0, 50, 1] > 0 and out2[0, 50, 11] == 2.5


def test_nms_fractional_angle_center():
    """utils.py:54 `y = ix / W` true division: at distance bin > 0 the angle
    window is [ang - (sigma-1), ang + sigma], asymmetric."""
    a, d = 120, 12
    hm = np.zeros((1, a, d), np.float32)
    hm[0, 50, 6] = 3.0    # y_mu = 50 + 6/12 = 50.5 on the unpadded grid
    hm[0, 46, 6] = 2.5    # dy = -4.5 -> |dy| > 4 -> SURVIVES
    hm[0, 54, 6] = 2.0    # dy = +3.5 -> suppressed
    out = np.asarray(waypoint_nms(jnp.asarray(hm), max_predictions=3,
                                  sigma=(4.0, 4.0)))
    assert out[0, 50, 6] > 0
    assert out[0, 46, 6] == 2.5
    assert out[0, 54, 6] == 0


# ------------------------------------------------- released-ckpt import parity
def _build_torch_trm(use_rgb, hidden=64, heads=4, inter=128, layers=2,
                     rgb_dim=96, depth_dim=48, n_classes=12, num_angles=120,
                     num_imgs=12):
    """State-dict-compatible torch replica of TRM_net.py Binary/DepthDist
    predictors (key space of the released waypoint checkpoints)."""
    import math as _math

    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    tnn = torch.nn

    class TSelf(tnn.Module):
        def __init__(self):
            super().__init__()
            self.query = tnn.Linear(hidden, hidden)
            self.key = tnn.Linear(hidden, hidden)
            self.value = tnn.Linear(hidden, hidden)

        def forward(self, x, bias):
            b, l, _ = x.shape
            hd = hidden // heads

            def split(t):
                return t.view(b, l, heads, hd).permute(0, 2, 1, 3)

            q, k, v = split(self.query(x)), split(self.key(x)), \
                split(self.value(x))
            s = q @ k.transpose(-1, -2) / _math.sqrt(hd) + bias
            return (torch.softmax(s, -1) @ v).permute(0, 2, 1, 3).reshape(
                b, l, hidden)

    class TLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attention = tnn.Module()
            self.attention.self = TSelf()
            self.attention.output = tnn.Module()
            self.attention.output.dense = tnn.Linear(hidden, hidden)
            self.attention.output.LayerNorm = tnn.LayerNorm(hidden, eps=1e-12)
            self.intermediate = tnn.Module()
            self.intermediate.dense = tnn.Linear(hidden, inter)
            self.output = tnn.Module()
            self.output.dense = tnn.Linear(inter, hidden)
            self.output.LayerNorm = tnn.LayerNorm(hidden, eps=1e-12)

        def forward(self, x, bias):
            a = self.attention.output.LayerNorm(
                self.attention.output.dense(self.attention.self(x, bias)) + x)
            h = torch.nn.functional.gelu(self.intermediate.dense(a))
            return self.output.LayerNorm(self.output.dense(h) + a)

    class TTRM(tnn.Module):
        def __init__(self):
            super().__init__()
            per_img = num_angles // num_imgs
            if use_rgb:
                self.visual_fc_rgb = tnn.Sequential(
                    tnn.Flatten(), tnn.Linear(rgb_dim, hidden),
                    tnn.ReLU(True))
                self.visual_merge = tnn.Sequential(
                    tnn.Linear(hidden * 2, hidden), tnn.ReLU(True))
            self.visual_fc_depth = tnn.Sequential(
                tnn.Flatten(), tnn.Linear(depth_dim, hidden), tnn.ReLU(True))
            self.waypoint_TRM = tnn.Module()
            self.waypoint_TRM.bert = tnn.Module()
            self.waypoint_TRM.bert.encoder = tnn.Module()
            self.waypoint_TRM.bert.encoder.layer = tnn.ModuleList(
                [TLayer() for _ in range(layers)])
            self.vis_classifier = tnn.Sequential(
                tnn.Linear(hidden, hidden), tnn.ReLU(),
                tnn.Linear(hidden, n_classes * per_img))

        def forward(self, rgb, depth):
            bsi = depth.shape[0] // num_imgs
            depth_x = self.visual_fc_depth(depth).reshape(bsi, num_imgs, -1)
            if use_rgb:
                rgb_x = self.visual_fc_rgb(rgb).reshape(bsi, num_imgs, -1)
                vis = self.visual_merge(torch.cat((rgb_x, depth_x), -1))
            else:
                vis = depth_x  # TRM_net.py:146-156 — merge NOT applied
            # circular neighbor mask, additive -10000 outside
            idx = torch.arange(num_imgs)
            diff = (idx[None] - idx[:, None]).abs()
            diff = torch.minimum(diff, num_imgs - diff)
            bias = (~(diff <= 1)).float() * -10000.0
            bias = bias[None, None]
            for lyr in self.waypoint_TRM.bert.encoder.layer:
                vis = lyr(vis, bias)
            logits = self.vis_classifier(vis).reshape(
                bsi, num_angles, n_classes)
            return torch.cat((logits[:, 5:], logits[:, :5]), 1)

    return TTRM()


@pytest.mark.parametrize("use_rgb", [True, False])
def test_waypoint_import_matches_torch(use_rgb):
    """import_torch_waypoint over a TRM_net-key-space state_dict reproduces
    the torch heatmap to float tolerance (base_il_trainer.py:96-117 ckpts)."""
    import pytest as _pytest

    torch = _pytest.importorskip("torch")

    from gridmm_tpu.utils.checkpoint import import_torch_waypoint

    rgb_dim, depth_dim = 96, 48
    tm = _build_torch_trm(use_rgb, rgb_dim=rgb_dim, depth_dim=depth_dim)
    tm.eval()
    cfg = WaypointConfig(hidden_dim=64, num_heads=4, num_layers=2,
                         intermediate_size=128, rgb_feat_dim=rgb_dim,
                         depth_feat_dim=depth_dim, use_rgb=use_rgb)
    model = WaypointPredictor(cfg)
    rng = np.random.default_rng(0)
    rgb = rng.standard_normal((24, rgb_dim)).astype(np.float32)
    depth = rng.standard_normal((24, depth_dim)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                        jnp.asarray(depth))

    sd = tm.state_dict()
    params, report = import_torch_waypoint(sd, params, num_layers=2,
                                           use_rgb=use_rgb)
    assert not report["unfilled_flax_leaves"], report
    if not use_rgb:
        # depth-only ckpts carry merge weights the forward never applies
        assert all(k.startswith(("visual_merge", "mergefeats"))
                   for k in report["unused_torch_keys"])

    ours = np.asarray(model.apply(params, jnp.asarray(rgb),
                                  jnp.asarray(depth)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(rgb), torch.from_numpy(depth)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)
