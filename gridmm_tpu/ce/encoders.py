"""RGB/depth encoders feeding the waypoint predictor.

The reference uses frozen external towers — a ddppo ResNet50 for depth and a
TorchVision ResNet for RGB (VLN_CE/.../models/encoders/*, loaded in
Policy_ViewSelection_GridMap.__init__). Those are feature extractors with
fixed output contracts ((2048,7,7) rgb / (128,4,4) depth). This module holds
compact strided-conv stand-ins for smoke-scale training; the faithful frozen
towers (TorchVision ResNet50 + ddppo GroupNorm ResNet50, with released-weight
importers) live in models/resnet.py and are wired by ce/factory.py at full
scale (tiny=False).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DepthTower(nn.Module):
    """(B, H, W, 1) depth -> (B, 128*4*4) features."""

    out_ch: int = 128

    @nn.compact
    def __call__(self, x):
        for ch in (32, 64, 64, self.out_ch):
            x = nn.Conv(ch, (4, 4), strides=(4, 4) if x.shape[1] > 16 else (2, 2),
                        padding="SAME")(x)
            x = jax.nn.relu(x)
        # adaptive pool to 4x4
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 4, 4, c), method="linear")
        return x.reshape(b, -1)


class RgbTower(nn.Module):
    """(B, H, W, 3) rgb -> (B, out_dim) features (stand-in for ResNet50's
    2048*7*7; out_dim configurable to keep the waypoint contract)."""

    out_ch: int = 2048
    grid: int = 7

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32) / 255.0
        g = self.grid
        for ch in (32, 64, 128, 256):
            stride = 2 if x.shape[1] // 2 >= g else 1
            x = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding="SAME")(x)
            x = jax.nn.relu(x)
        b, h, w, c = x.shape
        # adaptive pool to (g, g) regardless of the conv output size
        x = jax.image.resize(x, (b, g, g, c), method="linear")
        x = nn.Dense(self.out_ch)(x)
        return x.reshape(b, -1)
