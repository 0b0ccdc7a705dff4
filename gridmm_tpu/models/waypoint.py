"""Waypoint predictor for continuous environments (VLN-CE).

Re-implements BinaryDistPredictor_TRM / DepthDistPredictor_TRM
(VLN_CE/waypoint_prediction/TRM_net.py:9-164): per-view RGB/depth feature
projection, a 2-layer transformer with a circular neighbor attention mask
(waypoint_prediction/utils.py:90-102), and a (120 angles x 12 distance bins)
heatmap rolled by the heading offset. The iterative NMS candidate selection
(utils.py:37-64) is a fixed-iteration lax.fori_loop — fully jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gridmm_tpu.config import ModelConfig
from gridmm_tpu.models.layers import BertLayer, _dense


@dataclasses.dataclass(frozen=True)
class WaypointConfig:
    hidden_dim: int = 768
    num_angles: int = 120
    num_imgs: int = 12
    n_classes: int = 12          # distance bins
    num_layers: int = 2
    num_heads: int = 12
    intermediate_size: int = 3072  # BertConfig() default (TRM_net.py:38-44)
    neighbor: int = 1            # attention neighborhood radius
    heatmap_offset: int = 5      # each view points at the agent heading
    rgb_feat_dim: int = 2048 * 7 * 7     # flattened ResNet feature
    depth_feat_dim: int = 128 * 4 * 4    # flattened ddppo depth feature
    use_rgb: bool = True         # False = DepthDistPredictor (RxR)


def neighbor_attention_mask(num_imgs: int, neighbor: int) -> jnp.ndarray:
    """Circulant 0/1 mask: view i attends to i-neighbor..i+neighbor
    (utils.py:90-102)."""
    idx = jnp.arange(num_imgs)
    diff = jnp.abs(idx[None, :] - idx[:, None])
    diff = jnp.minimum(diff, num_imgs - diff)  # circular distance
    return (diff <= neighbor)


class WaypointPredictor(nn.Module):
    cfg: WaypointConfig

    @nn.compact
    def __call__(self, rgb_feats, depth_feats, deterministic=True):
        """rgb_feats: (B*12, rgb_feat_dim) or None; depth_feats:
        (B*12, depth_feat_dim). Returns (B, num_angles, n_classes) logits."""
        c = self.cfg
        bsi = depth_feats.shape[0] // c.num_imgs

        depth_x = jax.nn.relu(_dense(c.hidden_dim, "visual_fc_depth")(
            depth_feats.reshape(bsi * c.num_imgs, -1)))
        if c.use_rgb:
            rgb_x = jax.nn.relu(_dense(c.hidden_dim, "visual_fc_rgb")(
                rgb_feats.reshape(bsi * c.num_imgs, -1)))
            vis = jnp.concatenate([rgb_x, depth_x], axis=-1)
            vis = jax.nn.relu(_dense(c.hidden_dim, "visual_merge")(vis))
        else:
            # depth-only variant feeds depth_x straight to the transformer —
            # visual_merge exists in the released ckpt but is NOT applied
            # (TRM_net.py:146-156 vis_x = depth_x)
            vis = depth_x
        vis = vis.reshape(bsi, c.num_imgs, c.hidden_dim)

        bert_cfg = ModelConfig(
            hidden_size=c.hidden_dim, num_attention_heads=c.num_heads,
            intermediate_size=c.intermediate_size, hidden_dropout_prob=0.3,
            attention_probs_dropout_prob=0.1)
        mask = neighbor_attention_mask(c.num_imgs, c.neighbor)
        bias = (1.0 - mask.astype(jnp.float32)) * -10000.0
        bias = bias[None, None]  # (1, 1, V, V)
        for i in range(c.num_layers):
            vis = BertLayer(bert_cfg, name=f"layer_{i}")(
                vis, bias, deterministic)
        # WaypointBert drops out the sequence output before classification
        # (waypoint_bert.py WaypointBert.forward, p=hidden_dropout_prob)
        vis = nn.Dropout(0.3)(vis, deterministic=deterministic)

        per_img = c.num_angles // c.num_imgs
        logits = _dense(c.hidden_dim, "cls_hidden")(vis)
        logits = jax.nn.relu(logits)
        logits = _dense(c.n_classes * per_img, "cls_out")(logits)
        logits = logits.reshape(bsi, c.num_angles, c.n_classes)
        # roll so angle 0 aligns with the agent heading (TRM_net.py:77-80)
        return jnp.roll(logits, -c.heatmap_offset, axis=1)


def waypoint_nms(heatmap: jnp.ndarray, max_predictions: int = 10,
                 sigma: tuple = (7.0, 5.0)) -> jnp.ndarray:
    """Iterative non-maximum suppression over an (angles, dists) heatmap,
    batched — reference-exact, including the call-site wrap rows: the Policy
    concatenates the last angle row before and the first after, runs nms on
    the (A+2, D) map, and strips the pads (Policy_ViewSelection_GridMap.py
    :373-384; utils.py:37-64).

    Three executed-reference-verified quirks are reproduced deliberately
    (pinned by tests/test_reference_oracle.py::test_ref_oracle_waypoint_nms):

    * sigma follows the reference's (distance_radius, angle_radius) order —
      sigma[0] applies to the LAST axis (distance bins, utils.py:55-58
      x = ix % width), sigma[1] to the angle axis;
    * the angle-axis suppression window is centered at the FRACTIONAL
      y_mu = flat_ix / D (utils.py:54 `y = ix / shape[-1]` — torch true
      division keeps the remainder), so for a peak at distance bin > 0 the
      window covers rows [ang-(sigma_ang-1), ang+sigma_ang], not ±sigma_ang;
    * the distance-axis wrap is ONE-SIDED: min(|dx|, |dx + D|)
      (utils.py:25 `circular_x` adds +x_range only), so a peak at a far
      distance bin also suppresses the near bins of the same column;
    * a global max that lands on a duplicated pad row is recorded there and
      stripped — the candidate burns an NMS iteration and the original row
      survives to be re-picked (or lost if iterations run out), exactly as
      in the reference (ties resolve to the first flat index in both
      torch.max and jnp.argmax).

    heatmap: (B, A, D) non-negative scores. Returns (B, A, D) sparse map of
    kept peaks."""
    b, a, d = heatmap.shape
    sigma_dist, sigma_ang = sigma
    pad = jnp.concatenate(
        [heatmap[:, -1:, :], heatmap, heatmap[:, :1, :]], axis=1)
    h = a + 2

    def body(_, carry):
        supp, out = carry
        flat = supp.reshape(b, h * d)
        ix = jnp.argmax(flat, axis=1)
        val = jnp.take_along_axis(pad.reshape(b, h * d), ix[:, None],
                                  axis=1)[:, 0]
        out = out.reshape(b, h * d).at[jnp.arange(b), ix].set(val).reshape(
            b, h, d)
        # torch true division: y_mu keeps the col/D remainder (float32 on
        # both sides — long/int division promotes to the default dtype)
        y_mu = (ix.astype(jnp.float32) / d)[:, None, None]
        x_mu = (ix % d).astype(jnp.float32)[:, None, None]
        yi = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xi = jnp.arange(d, dtype=jnp.float32)[None, None, :]
        x_diff = xi - x_mu
        xd = jnp.minimum(jnp.abs(x_diff), jnp.abs(x_diff + d))
        g = (xd <= sigma_dist) & (jnp.abs(yi - y_mu) <= sigma_ang)
        supp = supp * (1.0 - g.astype(supp.dtype))
        return supp, out

    supp, out = jax.lax.fori_loop(
        0, max_predictions, body, (pad, jnp.zeros_like(pad)))
    return jnp.maximum(out[:, 1:-1, :], 0.0)
