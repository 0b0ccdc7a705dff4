"""Frozen CE visual towers vs torch replicas.

The reference freezes a TorchVision ResNet50 (RGB, 2048x7x7) and a habitat
ddppo GroupNorm ResNet50 (depth, 128x4x4) — resnet_encoders.py. These tests
build state-dict-compatible torch replicas (exact torchvision / ddppo key
spaces), import their weights, and compare feature maps numerically.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gridmm_tpu.models.resnet import (DdppoDepthEncoder,  # noqa: E402
                                      ResNet50Backbone,
                                      import_ddppo_depth_encoder,
                                      import_torchvision_resnet50)

LAYERS = (2, 2, 2, 2)  # trimmed block counts; per-block math is identical


class TBottleneckBN(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        # torchvision: downsample only where shape changes (first block)
        if stride != 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        res = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + res)


class TResNet50(tnn.Module):
    """torchvision.models.resnet50 key space (truncated at layer4)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512),
                                                  LAYERS)):
            stride = 1 if li == 0 else 2
            mods = []
            for bi in range(blocks):
                mods.append(TBottleneckBN(inplanes, planes,
                                          stride if bi == 0 else 1))
                inplanes = planes * 4
            setattr(self, f"layer{li + 1}", tnn.Sequential(*mods))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return x


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.standard_normal(m.num_features).astype(np.float32) * 0.3))
            m.running_var.copy_(torch.from_numpy(
                0.5 + rng.random(m.num_features).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(
                0.5 + rng.random(m.num_features).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(
                rng.standard_normal(m.num_features).astype(np.float32) * 0.2))


def test_resnet50_backbone_matches_torch():
    rng = np.random.default_rng(0)
    tm = TResNet50()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    tm.eval()

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    model = ResNet50Backbone(layers=LAYERS)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # every downsample slot exists in the replica; strict key coverage
    params = import_torchvision_resnet50(tm.state_dict(), params,
                                         layers=LAYERS)

    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs,
                               atol=2e-4, rtol=1e-3)


class TBottleneckGN(tnn.Module):
    """ddppo Bottleneck: convs Sequential keyed {0,1,3,4,6,7}."""

    def __init__(self, inplanes, planes, ngroups, stride=1):
        super().__init__()
        self.convs = tnn.Sequential(
            tnn.Conv2d(inplanes, planes, 1, bias=False),
            tnn.GroupNorm(ngroups, planes),
            tnn.ReLU(True),
            tnn.Conv2d(planes, planes, 3, stride, 1, bias=False),
            tnn.GroupNorm(ngroups, planes),
            tnn.ReLU(True),
            tnn.Conv2d(planes, planes * 4, 1, bias=False),
            tnn.GroupNorm(ngroups, planes * 4))
        if stride != 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                tnn.GroupNorm(ngroups, planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        return torch.relu(self.convs(x) + res)


class TDdppoEncoder(tnn.Module):
    """ddppo ResNetEncoder key space: backbone.* + compression.*."""

    def __init__(self, baseplanes=32, ngroups=16, spatial_in=128):
        super().__init__()
        self.backbone = tnn.Module()
        self.backbone.conv1 = tnn.Sequential(
            tnn.Conv2d(1, baseplanes, 7, 2, 3, bias=False),
            tnn.GroupNorm(ngroups, baseplanes),
            tnn.ReLU(True))
        inplanes = baseplanes
        planes = baseplanes
        for li, blocks in enumerate(LAYERS):
            stride = 1 if li == 0 else 2
            mods = []
            for bi in range(blocks):
                mods.append(TBottleneckGN(inplanes, planes, ngroups,
                                          stride if bi == 0 else 1))
                inplanes = planes * 4
            setattr(self.backbone, f"layer{li + 1}", tnn.Sequential(*mods))
            planes *= 2
        fs = spatial_in // 2 // 32
        comp = int(round(2048 / (fs * fs)))
        self.compression = tnn.Sequential(
            tnn.Conv2d(inplanes, comp, 3, 1, 1, bias=False),
            tnn.GroupNorm(1, comp),
            tnn.ReLU(True))

    def forward(self, depth_bchw):
        x = torch.nn.functional.avg_pool2d(depth_bchw, 2)
        x = self.backbone.conv1(x)
        x = torch.nn.functional.max_pool2d(x, 3, 2, 1)
        for li in range(4):
            x = getattr(self.backbone, f"layer{li + 1}")(x)
        return self.compression(x)


def test_ddppo_depth_encoder_matches_torch():
    rng = np.random.default_rng(1)
    tm = TDdppoEncoder()
    tm.eval()

    depth = rng.random((2, 128, 128, 1)).astype(np.float32)
    model = DdppoDepthEncoder(layers=LAYERS)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(depth))
    params = import_ddppo_depth_encoder(tm.state_dict(), params,
                                        layers=LAYERS)

    ours = np.asarray(model.apply(params, jnp.asarray(depth)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(depth.transpose(0, 3, 1, 2))).numpy()
    b, c, h, w = theirs.shape
    np.testing.assert_allclose(ours, theirs.reshape(b, c * h * w),
                               atol=2e-4, rtol=1e-3)
    # the flattened contract matches the waypoint predictor's expectation
    assert ours.shape[1] == c * h * w


def test_full_ce_factory_uses_real_towers():
    """tiny=False wires the ResNet towers with the (2048*7*7)/(128*4*4)
    waypoint contracts (keeps shapes only — full init is slow on CPU)."""
    from gridmm_tpu.ce.factory import build_ce_agent  # noqa: F401
    from gridmm_tpu.models.resnet import RgbResNet50Tower

    tower = RgbResNet50Tower()
    x = jnp.zeros((1, 224, 224, 3), jnp.uint8)
    shapes = jax.eval_shape(
        lambda: tower.init_with_output(jax.random.PRNGKey(0), x)[0])
    assert shapes.shape == (1, 2048 * 7 * 7)

    depth_enc = DdppoDepthEncoder()
    d = jnp.zeros((1, 256, 256, 1))
    dshapes = jax.eval_shape(
        lambda: depth_enc.init_with_output(jax.random.PRNGKey(0), d)[0])
    assert dshapes.shape == (1, 128 * 4 * 4)
