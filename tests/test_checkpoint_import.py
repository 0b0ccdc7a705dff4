"""Torch-checkpoint import parity: torch replicas built from torch primitives
are compared numerically against flax modules loaded via the importer."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gridmm_tpu.config import ModelConfig  # noqa: E402
from gridmm_tpu.models.layers import (BertLayer, GraphLXRTXLayer,  # noqa: E402
                                      PreNormEncoderLayer)
from gridmm_tpu.models.clip_vit import (ClipVisionConfig,  # noqa: E402
                                        ClipVisionTransformer)
from gridmm_tpu.utils import checkpoint as CK  # noqa: E402

CFG = ModelConfig(hidden_size=64, num_attention_heads=4, intermediate_size=128,
                  vocab_size=100, max_position_embeddings=32)


def torch_bert_layer(cfg):
    """Reference-style BertLayer from torch primitives."""
    import math

    class SelfAttn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.query = torch.nn.Linear(cfg.hidden_size, cfg.hidden_size)
            self.key = torch.nn.Linear(cfg.hidden_size, cfg.hidden_size)
            self.value = torch.nn.Linear(cfg.hidden_size, cfg.hidden_size)

        def forward(self, x, bias):
            h, hd = cfg.num_attention_heads, cfg.head_dim
            b, l, _ = x.shape
            def split(t):
                return t.view(b, l, h, hd).permute(0, 2, 1, 3)
            q, k, v = split(self.query(x)), split(self.key(x)), split(self.value(x))
            scores = q @ k.transpose(-1, -2) / math.sqrt(hd) + bias
            probs = torch.softmax(scores, -1)
            ctx = (probs @ v).permute(0, 2, 1, 3).reshape(b, l, -1)
            return ctx

    class Layer(torch.nn.Module):
        def __init__(self):
            super().__init__()
            class A(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.self = SelfAttn()
                    class Out(torch.nn.Module):
                        def __init__(self):
                            super().__init__()
                            self.dense = torch.nn.Linear(cfg.hidden_size, cfg.hidden_size)
                            self.LayerNorm = torch.nn.LayerNorm(cfg.hidden_size, eps=1e-12)
                    self.output = Out()
            self.attention = A()
            class Inter(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.dense = torch.nn.Linear(cfg.hidden_size, cfg.intermediate_size)
            self.intermediate = Inter()
            class Out2(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.dense = torch.nn.Linear(cfg.intermediate_size, cfg.hidden_size)
                    self.LayerNorm = torch.nn.LayerNorm(cfg.hidden_size, eps=1e-12)
            self.output = Out2()

        def forward(self, x, bias):
            ctx = self.attention.self(x, bias)
            x = self.attention.output.LayerNorm(self.attention.output.dense(ctx) + x)
            h = torch.nn.functional.gelu(self.intermediate.dense(x))
            return self.output.LayerNorm(self.output.dense(h) + x)

    return Layer()


def test_bert_layer_parity():
    torch.manual_seed(0)
    tl = torch_bert_layer(CFG).eval()
    x = torch.randn(2, 9, CFG.hidden_size)
    mask = torch.zeros(2, 1, 1, 9)
    mask[0, ..., 7:] = -10000.0
    with torch.no_grad():
        want = tl(x, mask).numpy()

    fl = BertLayer(CFG)
    params = fl.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()),
                     jnp.asarray(mask.numpy()))
    sd = {f"layer.{0}.{k}": v for k, v in tl.state_dict().items()}
    rules = CK._bert_layer_rules("layer.0", "")
    inner = jax.tree_util.tree_map(np.asarray, params)["params"]
    for src, dst, tf in rules:
        CK.set_in_tree(inner, dst.lstrip("/"),
                       jnp.asarray(CK._apply_transform(CK._t(sd[src]), tf)))
    got = fl.apply({"params": inner}, jnp.asarray(x.numpy()),
                   jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_prenorm_layer_parity():
    torch.manual_seed(1)
    tl = torch.nn.TransformerEncoderLayer(
        CFG.hidden_size, CFG.num_attention_heads,
        dim_feedforward=CFG.intermediate_size, dropout=0.0,
        activation="gelu", batch_first=True, norm_first=True).eval()
    x = torch.randn(2, 7, CFG.hidden_size)
    pad = torch.zeros(2, 7, dtype=torch.bool)
    pad[1, 5:] = True
    with torch.no_grad():
        want = tl(x, src_key_padding_mask=pad).numpy()

    fl = PreNormEncoderLayer(CFG)
    mask = jnp.asarray(~pad.numpy())
    from gridmm_tpu.ops.masking import attn_bias_from_mask
    bias = attn_bias_from_mask(mask, neg=-1e9)
    params = fl.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()), bias)
    sd = {f"layers.0.{k}": v for k, v in tl.state_dict().items()}
    rules = CK._prenorm_layer_rules("layers.0", "")
    inner = jax.tree_util.tree_map(np.asarray, params)["params"]
    for src, dst, tf in rules:
        CK.set_in_tree(inner, dst.lstrip("/"),
                       jnp.asarray(CK._apply_transform(CK._t(sd[src]), tf)))
    got = fl.apply({"params": inner}, jnp.asarray(x.numpy()), bias)
    # compare only non-padded positions (padded queries differ harmlessly)
    np.testing.assert_allclose(np.asarray(got)[0], want[0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[1, :5], want[1, :5], atol=2e-5)


class TorchQuickGELU(torch.nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


def torch_clip_visual(res, patch, width, layers, heads):
    """OpenAI-CLIP-shaped visual tower from torch primitives."""
    from collections import OrderedDict

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = torch.nn.MultiheadAttention(width, heads)
            self.ln_1 = torch.nn.LayerNorm(width)
            self.mlp = torch.nn.Sequential(OrderedDict([
                ("c_fc", torch.nn.Linear(width, width * 4)),
                ("gelu", TorchQuickGELU()),
                ("c_proj", torch.nn.Linear(width * 4, width))]))
            self.ln_2 = torch.nn.LayerNorm(width)

        def forward(self, x):
            y = self.ln_1(x)
            x = x + self.attn(y, y, y, need_weights=False)[0]
            x = x + self.mlp(self.ln_2(x))
            return x

    class Visual(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, width, patch, patch, bias=False)
            scale = width ** -0.5
            self.class_embedding = torch.nn.Parameter(scale * torch.randn(width))
            self.positional_embedding = torch.nn.Parameter(
                scale * torch.randn((res // patch) ** 2 + 1, width))
            self.ln_pre = torch.nn.LayerNorm(width)

            class T(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.resblocks = torch.nn.Sequential(
                        *[Block() for _ in range(layers)])

                def forward(self, x):
                    return self.resblocks(x)

            self.transformer = T()
            self.ln_post = torch.nn.LayerNorm(width)

        def forward(self, x):
            x = self.conv1(x)
            x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
            cls = self.class_embedding.to(x.dtype) + torch.zeros(
                x.shape[0], 1, x.shape[-1])
            x = torch.cat([cls, x], dim=1) + self.positional_embedding
            x = self.ln_pre(x)
            x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
            return self.ln_post(x)

    return Visual()


def test_clip_visual_parity():
    torch.manual_seed(2)
    res, patch, width, layers, heads = 64, 32, 48, 2, 4
    tm = torch_clip_visual(res, patch, width, layers, heads).eval()
    imgs = torch.randn(3, 3, res, res)
    with torch.no_grad():
        want = tm(imgs).numpy()

    ccfg = ClipVisionConfig(input_resolution=res, patch_size=patch,
                            width=width, layers=layers, heads=heads,
                            compute_dtype="float32")
    fm = ClipVisionTransformer(ccfg)
    imgs_nhwc = jnp.asarray(imgs.permute(0, 2, 3, 1).numpy())
    params = fm.init(jax.random.PRNGKey(0), imgs_nhwc)
    sd = {f"visual.{k}": v for k, v in tm.state_dict().items()}
    loaded = CK.import_torch_clip_visual(sd, params, layers=layers)
    got = fm.apply(loaded, imgs_nhwc)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


def torch_timm_vit(res, patch, width, layers, heads):
    """timm vit_base_patch16_224-shaped tower (state-dict key layout matches
    timm: patch_embed.proj / cls_token / pos_embed / blocks.N.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2} / norm)."""

    class Attention(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = torch.nn.Linear(width, 3 * width)
            self.proj = torch.nn.Linear(width, width)

        def forward(self, x):
            b, l, _ = x.shape
            hd = width // heads
            qkv = self.qkv(x).reshape(b, l, 3, heads, hd).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            scores = q @ k.transpose(-1, -2) * hd ** -0.5
            ctx = (torch.softmax(scores, -1) @ v).transpose(1, 2).reshape(
                b, l, width)
            return self.proj(ctx)

    class Mlp(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = torch.nn.Linear(width, 4 * width)
            self.fc2 = torch.nn.Linear(4 * width, width)

        def forward(self, x):
            return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(width)
            self.attn = Attention()
            self.norm2 = torch.nn.LayerNorm(width)
            self.mlp = Mlp()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Conv2d(3, width, patch, patch)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class ViT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = PatchEmbed()
            n = (res // patch) ** 2 + 1
            self.cls_token = torch.nn.Parameter(torch.randn(1, 1, width) * .02)
            self.pos_embed = torch.nn.Parameter(torch.randn(1, n, width) * .02)
            self.blocks = torch.nn.Sequential(
                *[Block() for _ in range(layers)])
            self.norm = torch.nn.LayerNorm(width)

        def forward_features(self, x):
            x = self.patch_embed(x)
            cls = self.cls_token.expand(x.shape[0], -1, -1)
            x = torch.cat([cls, x], dim=1) + self.pos_embed
            return self.norm(self.blocks(x))

    return ViT()


def test_timm_vit_parity():
    """The CE live view encoder: timm ViT forward_features matches ours after
    import_timm_vit (VLN_CE gridmap/vilmodel.py:631, Policy:338)."""
    torch.manual_seed(5)
    res, patch, width, layers, heads = 64, 16, 48, 2, 4
    tm = torch_timm_vit(res, patch, width, layers, heads).eval()
    imgs = torch.randn(3, 3, res, res)
    with torch.no_grad():
        want = tm.forward_features(imgs).numpy()

    ccfg = ClipVisionConfig(input_resolution=res, patch_size=patch,
                            width=width, layers=layers, heads=heads,
                            compute_dtype="float32", gelu="erf",
                            ln_pre=False, conv_bias=True)
    fm = ClipVisionTransformer(ccfg)
    imgs_nhwc = jnp.asarray(imgs.permute(0, 2, 3, 1).numpy())
    params = fm.init(jax.random.PRNGKey(0), imgs_nhwc)
    loaded = CK.import_timm_vit(tm.state_dict(), params, layers=layers)
    got = fm.apply(loaded, imgs_nhwc)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)
    # the view feature is the cls token (Policy:338)
    assert np.asarray(got)[:, 0, :].shape == (3, width)
