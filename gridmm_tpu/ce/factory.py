"""Construction helpers for the continuous-env stack."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gridmm_tpu.ce.agent import CEAgent
from gridmm_tpu.ce.encoders import DepthTower, RgbTower
from gridmm_tpu.config import (GridMMConfig, ModelConfig, NavigatorShapes,
                               TrainConfig, r2r_ce_config)
from gridmm_tpu.models.clip_vit import ClipVisionConfig, ClipVisionTransformer
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
from gridmm_tpu.models.waypoint import WaypointConfig, WaypointPredictor


def build_ce_agent(img: int = 56, depth_sz: int = 256, tiny: bool = True,
                   seed: int = 0, waypoint_rgb: bool = True,
                   view_tower: bool = False, preset: str = "r2r"):
    """Assemble a CEAgent with fresh parameters.

    tiny=True uses smoke-scale dims (tests/synthetic arena); tiny=False uses
    the full r2r_ce preset with ViT-B/32 grid features. waypoint_rgb=False
    builds the depth-only waypoint predictor (RxR-CE,
    DepthDistPredictor_TRM). view_tower=True adds the timm ViT-B/16 view
    encoder (gridmap/vilmodel.py:631; cls token per view) — without it view
    tokens fall back to CLIP cls features. preset='rxr' swaps in the RxR-CE
    normalizers + xlm-roberta text dims (Policy:280-286)."""
    from gridmm_tpu.config import rxr_ce_config

    base = rxr_ce_config() if preset == "rxr" else r2r_ce_config()
    if tiny:
        cfg = dataclasses.replace(
            base,
            model=ModelConfig(
                vocab_size=30522, hidden_size=64, num_attention_heads=4,
                intermediate_size=128, num_l_layers=1, num_x_layers=1,
                num_pano_layers=1, image_feat_size=64,
                max_position_embeddings=32),
            grid=dataclasses.replace(base.grid, feature_dim=64, max_steps=4),
            shapes=NavigatorShapes(max_txt_len=16, max_gmap_len=16,
                                   max_vp_len=20, max_points=4 * 588),
            train=TrainConfig(max_action_len=4, loss_norm="actions"),
        )
        wp_cfg = WaypointConfig(hidden_dim=64, num_heads=4, num_layers=1,
                                rgb_feat_dim=2048 * 7 * 7 // 49,
                                depth_feat_dim=128 * 16,
                                use_rgb=waypoint_rgb)
        # 7x7 patches + cls = 50 tokens feed the 49-points/view contract
        clip_cfg = ClipVisionConfig(input_resolution=56, patch_size=8,
                                    width=64, layers=1, heads=4,
                                    compute_dtype="float32")
    else:
        cfg = base
        wp_cfg = WaypointConfig(use_rgb=waypoint_rgb)
        clip_cfg = ClipVisionConfig(patch_size=32)
        img = 224

    key = jax.random.PRNGKey(seed)
    navigator = GridMMNavigator(cfg.model)
    nav_params = init_navigator(navigator, cfg.shapes, key)

    wp = WaypointPredictor(wp_cfg)
    if tiny:
        rgb_tower = RgbTower(out_ch=wp_cfg.rgb_feat_dim // 49, grid=7)
        depth_tower = DepthTower(out_ch=128)
    else:
        # the reference's frozen towers: TorchVision ResNet50 (2048*7*7) and
        # ddppo GroupNorm ResNet50 (128*4*4) — models/resnet.py
        from gridmm_tpu.models.resnet import (DdppoDepthEncoder,
                                              RgbResNet50Tower)

        rgb_tower = RgbResNet50Tower()
        depth_tower = DdppoDepthEncoder()
    rgb0 = jnp.zeros((12, img, img, 3), jnp.uint8)
    dep0 = jnp.zeros((12, depth_sz, depth_sz, 1))
    rgb_params = rgb_tower.init(jax.random.fold_in(key, 1), rgb0)
    depth_params = depth_tower.init(jax.random.fold_in(key, 2), dep0)
    rgb_f = rgb_tower.apply(rgb_params, rgb0)
    dep_f = depth_tower.apply(depth_params, dep0)
    wp_params = wp.init(jax.random.fold_in(key, 3), rgb_f, dep_f)

    clip = ClipVisionTransformer(clip_cfg)
    clip_params = clip.init(
        jax.random.fold_in(key, 4),
        jnp.zeros((1, clip_cfg.input_resolution, clip_cfg.input_resolution,
                   3)))

    view_encoder = view_params = None
    if view_tower:
        from gridmm_tpu.models.clip_vit import vit_b16_timm

        if tiny:
            view_cfg = dataclasses.replace(
                clip_cfg, gelu="erf", ln_pre=False, conv_bias=True)
        else:
            view_cfg = vit_b16_timm()
        view_encoder = ClipVisionTransformer(view_cfg)
        view_params = view_encoder.init(
            jax.random.fold_in(key, 5),
            jnp.zeros((1, view_cfg.input_resolution,
                       view_cfg.input_resolution, 3)))

    agent = CEAgent(cfg, navigator, nav_params, wp, wp_params,
                    clip_model=clip, clip_params=clip_params,
                    rgb_tower=rgb_tower, rgb_params=rgb_params,
                    depth_tower=depth_tower, depth_params=depth_params,
                    view_encoder=view_encoder, view_params=view_params)
    return cfg, agent


def load_ce_released_weights(agent, waypoint_ckpt=None, navigator_ckpt=None,
                             clip_ckpt=None, rgb_resnet_sd=None,
                             ddppo_sd=None, vit_ckpt=None):
    """Import the released-artifact set the reference trainer assembles
    (base_il_trainer.py:80-117 + gridmap/vlnbert_init.py:11-65):

      waypoint_ckpt   check_val_best_avg_wayscore (R2R) /
                      check_cwp_bestdist_hfov79 (RxR depth-only) — either the
                      loaded dict or a path; state_dict nested under
                      ['predictor']['state_dict']
      navigator_ckpt  grid_map.pt state_dict (fine-tuned GridMM navigator)
      clip_ckpt       ViT-B-32.pt visual tower state_dict
      rgb_resnet_sd   torchvision resnet50 state_dict
      ddppo_sd        gibson ddppo visual_encoder state_dict (already stripped
                      to the visual_encoder scope like resnet_encoders.py:38-48)
      vit_ckpt        vit_base_p16_224.pth timm state_dict (the live view
                      encoder; requires build_ce_agent(view_tower=True))

    Any argument left None keeps that component's current params. Mutates and
    returns the agent."""
    from gridmm_tpu.utils import checkpoint as CK

    def _load(obj):
        if isinstance(obj, (str,)):
            import torch

            return torch.load(obj, map_location="cpu")
        return obj

    if waypoint_ckpt is not None:
        ckpt = _load(waypoint_ckpt)
        sd = ckpt.get("predictor", {}).get("state_dict", ckpt) \
            if isinstance(ckpt, dict) else ckpt
        # the rgb/depth-only flavor follows the MODEL the agent was built
        # with (build_ce_agent waypoint_rgb); a depth-only model has no rgb
        # leaves, so the rgb-ckpt rules are simply absent
        agent.wp_params, report = CK.import_torch_waypoint(
            sd, agent.wp_params, num_layers=agent.waypoint.cfg.num_layers,
            use_rgb=agent.waypoint.cfg.use_rgb)
        if report["unfilled_flax_leaves"]:
            raise ValueError(
                f"waypoint import left leaves unfilled: "
                f"{report['unfilled_flax_leaves']}")
    if navigator_ckpt is not None:
        # released nesting: grid_map.pt = {'vln_bert': {'state_dict': ...}}
        # with 'vln_bert.'/'module.' key prefixes; CE ckpt.{epoch}.pth =
        # {'state_dict': ...} with 'net.module.vln_bert.' prefixes
        # (gridmap/vlnbert_init.py:17-33)
        sd = CK.remap_ce_released(_load(navigator_ckpt))
        agent.nav_params, report = CK.import_torch_navigator(
            sd, agent.nav_params,
            num_l_layers=agent.cfg.model.num_l_layers,
            num_x_layers=agent.cfg.model.num_x_layers,
            num_pano_layers=agent.cfg.model.num_pano_layers,
            has_obj=agent.cfg.model.obj_feat_size > 0)
        # a wrong key space matches zero rules and must raise, not no-op
        CK.require_navigator_coverage(report, what="grid_map navigator")
    if clip_ckpt is not None:
        agent.clip_params = CK.import_torch_clip_visual(
            _load(clip_ckpt), agent.clip_params)
    if rgb_resnet_sd is not None:
        from gridmm_tpu.models.resnet import import_torchvision_resnet50

        agent.rgb_params = import_torchvision_resnet50(
            _load(rgb_resnet_sd), agent.rgb_params)
    if ddppo_sd is not None:
        from gridmm_tpu.models.resnet import import_ddppo_depth_encoder

        agent.depth_params = import_ddppo_depth_encoder(
            _load(ddppo_sd), agent.depth_params)
    if vit_ckpt is not None:
        if agent.view_encoder is None:
            raise ValueError("vit_ckpt given but the agent was built without "
                             "view_tower=True")
        agent.view_params = CK.import_timm_vit(_load(vit_ckpt),
                                               agent.view_params)
    return agent
