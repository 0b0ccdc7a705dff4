"""Frozen visual towers for the continuous-env (VLN-CE) stack.

The reference feeds the waypoint predictor two frozen feature extractors
(VLN_CE/vlnce_baselines/models/encoders/resnet_encoders.py):

  * RGB: TorchVision ResNet50 (ImageNet), truncated before avgpool ->
    (B, 2048, 7, 7) at 224x224 input (TorchVisionResNet50, :120-210)
  * depth: habitat ddppo ResNetEncoder (GroupNorm ResNet50, baseplanes 32)
    with a 3x3 compression conv -> (B, 128, 4, 4) at 256x256 input
    (VlnResnetDepthEncoder, :13-105; weights from the gibson ddppo ckpt)

This module re-implements both towers in flax with weight importers from the
released torch state_dicts. BatchNorm is evaluated with frozen running stats
(both towers run in eval mode with requires_grad=False in the reference).
Feature maps are returned flattened in torch CHW order so the released
waypoint-predictor Linear weights consume them with matching element layout.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalization used by TorchVisionResNet50.rgb_transform
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv(features, kernel, stride=1, padding=0, name=None):
    pad = padding if isinstance(padding, (list, tuple)) else \
        [(padding, padding), (padding, padding)]
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=pad, use_bias=False, name=name)


class FrozenBatchNorm(nn.Module):
    """BatchNorm in eval mode: running stats are imported parameters."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class BottleneckBN(nn.Module):
    """TorchVision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + residual."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = _conv(self.planes, 1, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = jax.nn.relu(out)
        out = _conv(self.planes, 3, self.stride, 1, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = jax.nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            x = _conv(self.planes * 4, 1, self.stride,
                      name="downsample_conv")(x)
            x = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(x)
        return jax.nn.relu(out + x)


class ResNet50Backbone(nn.Module):
    """TorchVision resnet50 truncated before avgpool/fc.

    (B, H, W, 3) normalized float input -> (B, H/32, W/32, 2048)."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = _conv(64, 7, 2, 3, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                x = BottleneckBN(
                    planes, stride if bi == 0 else 1, downsample=bi == 0,
                    name=f"layer{li + 1}_{bi}")(x)
        return x


class RgbResNet50Tower(nn.Module):
    """TorchVisionResNet50 contract: uint8 RGB -> flattened (2048*7*7)
    features in torch CHW order."""

    @nn.compact
    def __call__(self, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        x = ResNet50Backbone(name="backbone")(x)
        b, h, w, c = x.shape
        return x.transpose(0, 3, 1, 2).reshape(b, c * h * w)


class BottleneckGN(nn.Module):
    """ddppo Bottleneck: GroupNorm variant (habitat resnet.py), conv stack
    keyed `convs.{0,3,6}` with norms at `convs.{1,4,7}`."""

    planes: int
    ngroups: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = _conv(self.planes, 1, name="conv1")(x)
        out = nn.GroupNorm(self.ngroups, epsilon=1e-5, name="gn1")(out)
        out = jax.nn.relu(out)
        out = _conv(self.planes, 3, self.stride, 1, name="conv2")(out)
        out = nn.GroupNorm(self.ngroups, epsilon=1e-5, name="gn2")(out)
        out = jax.nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3")(out)
        out = nn.GroupNorm(self.ngroups, epsilon=1e-5, name="gn3")(out)
        if self.downsample:
            x = _conv(self.planes * 4, 1, self.stride,
                      name="downsample_conv")(x)
            x = nn.GroupNorm(self.ngroups, epsilon=1e-5, name="downsample_gn")(x)
        return jax.nn.relu(out + x)


class DdppoDepthEncoder(nn.Module):
    """habitat ddppo ResNetEncoder (GroupNorm resnet50, baseplanes 32):
    (B, H, W, 1) depth in [0,1] -> flattened (128*4*4) features (CHW order)
    at 256x256 input. Forward: avg-pool /2, 7x7 stem, 4 bottleneck stages,
    3x3 compression conv to round(2048/final_spatial^2) channels."""

    baseplanes: int = 32
    ngroups: int = 16
    layers: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, depth):
        x = nn.avg_pool(depth, (2, 2), strides=(2, 2))
        x = _conv(self.baseplanes, 7, 2, 3, name="stem_conv")(x)
        x = nn.GroupNorm(self.ngroups, epsilon=1e-5, name="stem_gn")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        planes = self.baseplanes
        for li, blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                x = BottleneckGN(
                    planes, self.ngroups, stride if bi == 0 else 1,
                    downsample=bi == 0, name=f"layer{li + 1}_{bi}")(x)
            planes *= 2
        fs = x.shape[1]
        comp = int(round(2048 / (fs * fs)))
        x = _conv(comp, 3, 1, 1, name="compression_conv")(x)
        x = nn.GroupNorm(1, epsilon=1e-5, name="compression_gn")(x)
        x = jax.nn.relu(x)
        b, h, w, c = x.shape
        return x.transpose(0, 3, 1, 2).reshape(b, c * h * w)


# ----------------------------------------------------------------- importers
def _tv(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy()
                      if hasattr(x, "detach") else x).astype(np.float32)


def _set(inner: dict, path: str, val: np.ndarray) -> None:
    from gridmm_tpu.utils.checkpoint import get_from_tree, set_in_tree

    tgt = get_from_tree(inner, path)
    if tuple(val.shape) != tuple(np.shape(tgt)):
        raise ValueError(f"shape mismatch at {path}: "
                         f"{val.shape} vs {np.shape(tgt)}")
    set_in_tree(inner, path, jnp.asarray(val))


def _conv_k(w: np.ndarray) -> np.ndarray:
    """torch conv weight (out,in,kh,kw) -> flax kernel (kh,kw,in,out)."""
    return w.transpose(2, 3, 1, 0)


def import_torchvision_resnet50(state_dict: Dict[str, Any],
                                template_params: dict,
                                layers=(3, 4, 6, 3)) -> dict:
    """torchvision.models.resnet50 state_dict -> ResNet50Backbone params
    (fc/avgpool keys ignored — the reference truncates them too)."""
    sd = {k: v for k, v in state_dict.items()}
    params = jax.tree_util.tree_map(np.asarray, template_params)
    inner = params["params"] if "params" in params else params
    if "backbone" in inner:  # RgbResNet50Tower wrapping
        inner = inner["backbone"]

    def bn(src, dst):
        _set(inner, f"{dst}/scale", _tv(sd[f"{src}.weight"]))
        _set(inner, f"{dst}/bias", _tv(sd[f"{src}.bias"]))
        _set(inner, f"{dst}/mean", _tv(sd[f"{src}.running_mean"]))
        _set(inner, f"{dst}/var", _tv(sd[f"{src}.running_var"]))

    _set(inner, "conv1/kernel", _conv_k(_tv(sd["conv1.weight"])))
    bn("bn1", "bn1")
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            s = f"layer{li + 1}.{bi}"
            d = f"layer{li + 1}_{bi}"
            for ci in (1, 2, 3):
                _set(inner, f"{d}/conv{ci}/kernel",
                     _conv_k(_tv(sd[f"{s}.conv{ci}.weight"])))
                bn(f"{s}.bn{ci}", f"{d}/bn{ci}")
            if f"{s}.downsample.0.weight" in sd:
                _set(inner, f"{d}/downsample_conv/kernel",
                     _conv_k(_tv(sd[f"{s}.downsample.0.weight"])))
                bn(f"{s}.downsample.1", f"{d}/downsample_bn")
    return params


def import_ddppo_depth_encoder(state_dict: Dict[str, Any],
                               template_params: dict,
                               layers=(3, 4, 6, 3)) -> dict:
    """habitat ddppo visual_encoder state_dict -> DdppoDepthEncoder params.

    Expects keys already stripped to the visual_encoder scope the reference
    produces (VlnResnetDepthEncoder, resnet_encoders.py:38-48):
    `backbone.conv1.{0,1}.*`, `backbone.layer{L}.{i}.convs.{0,1,3,4,6,7}.*`,
    `backbone.layer{L}.{i}.downsample.{0,1}.*`, `compression.{0,1}.*`."""
    sd = {k: v for k, v in state_dict.items()}
    params = jax.tree_util.tree_map(np.asarray, template_params)
    inner = params["params"] if "params" in params else params

    def gn(src, dst):
        _set(inner, f"{dst}/scale", _tv(sd[f"{src}.weight"]))
        _set(inner, f"{dst}/bias", _tv(sd[f"{src}.bias"]))

    _set(inner, "stem_conv/kernel",
         _conv_k(_tv(sd["backbone.conv1.0.weight"])))
    gn("backbone.conv1.1", "stem_gn")
    # ddppo Bottleneck.convs: Sequential(conv,GN,ReLU,conv,GN,ReLU,conv,GN)
    conv_slots = {1: 0, 2: 3, 3: 6}
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            s = f"backbone.layer{li + 1}.{bi}"
            d = f"layer{li + 1}_{bi}"
            for ci, slot in conv_slots.items():
                _set(inner, f"{d}/conv{ci}/kernel",
                     _conv_k(_tv(sd[f"{s}.convs.{slot}.weight"])))
                gn(f"{s}.convs.{slot + 1}", f"{d}/gn{ci}")
            if f"{s}.downsample.0.weight" in sd:
                _set(inner, f"{d}/downsample_conv/kernel",
                     _conv_k(_tv(sd[f"{s}.downsample.0.weight"])))
                gn(f"{s}.downsample.1", f"{d}/downsample_gn")
    _set(inner, "compression_conv/kernel",
         _conv_k(_tv(sd["compression.0.weight"])))
    gn("compression.1", "compression_gn")
    return params
