"""Continuous-environment navigation agent (VLN-CE GridMap policy).

Host orchestration of the CE stack (reference: ss_trainer_GridMap.py:141-451 +
Policy_ViewSelection_GridMap.py modes): per step
  1. encode 12 RGB-D frames -> waypoint heatmap -> softmax -> circular NMS ->
     <=5 candidate waypoints (angle, distance) (Policy:345-391),
  2. live CLIP grid features -> project-at-insertion -> on-device grid build
     with the CE geometry convention,
  3. panorama + navigation forward through the SAME jitted nav_device_step as
     the discrete agent (waypoints enter the topo map as frontier nodes),
  4. move via env.step_to; teacher = candidate minimizing the oracle
     cand_dist_to_goal (ss_trainer:288-328).

Greedy (argmax) rollouts run the ENTIRE policy step as one jitted dispatch
(ce/device_step.py: perception towers + NMS + top_k candidate extraction +
step assembly + navigation forward); the host only keeps the trajectory
history and moves the env. Teacher rollouts and train-time sampling keep the
two-dispatch host-assembly path (the oracle RPC and the numpy RNG sit
between candidate extraction and the navigation forward). CLIP patch tokens
stay device-resident end to end.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gridmm_tpu.ce.encoders import DepthTower, RgbTower
from gridmm_tpu.ce.env import CEStepObs, ContinuousEnv, ce_episode_metrics
from gridmm_tpu.config import GridMMConfig
from gridmm_tpu.env.graph import angle_features
from gridmm_tpu.models.clip_vit import (ClipVisionTransformer, clip_b32,
                                        normalize_images,
                                        normalize_images_timm)
from gridmm_tpu.models.navigator import GridMMNavigator
from gridmm_tpu.models.waypoint import (WaypointConfig, WaypointPredictor,
                                        waypoint_nms)
from gridmm_tpu.ops import geometry as G
from gridmm_tpu.train.step import (NavCarry, StepInputs, init_carry,
                                   nav_device_step)

NUM_ANGLES, NUM_DISTS = 120, 12
DIST_BIN = 0.25  # metres per distance bin


def rel_pos_features(a, b, base_heading: float = 0.0,
                     base_elevation: float = 0.0):
    """(rel_heading, rel_elevation, dist) between two positions.

    Transcribes calculate_vp_rel_pos_fts (VLN_CE models/utils.py:125-144):
    positions are habitat (x, height, y) triples; heading measured from +y
    toward +x (the simulator's transposed x-y convention), flipped past pi/2
    when the target is behind (dy < 0)."""
    dx = float(b[0] - a[0])
    dz = float(b[1] - a[1])
    dy = float(b[2] - a[2])
    if dx == 0.0 and dz == 0.0 and dy == 0.0:
        return 0.0, 0.0, 0.0
    xy = max(math.sqrt(dx * dx + dy * dy), 1e-8)
    xyz = max(math.sqrt(dx * dx + dy * dy + dz * dz), 1e-8)
    heading = math.asin(max(-1.0, min(1.0, dx / xy)))
    if dy < 0:
        heading = math.pi - heading
    heading -= base_heading
    elevation = math.asin(max(-1.0, min(1.0, dz / xyz)))
    elevation -= base_elevation
    return heading, elevation, xyz


def traj_pos_features(traj_positions, traj_step_dists, cur_heading: float,
                      af: int, max_dist: float,
                      max_step: float) -> np.ndarray:
    """7-dim positional features for every visited trajectory node relative
    to the CURRENT pose (Policy_ViewSelection_GridMap.py:549-560): angle fts
    of (rel heading, rel elevation) w.r.t. current heading, then
    [line dist/max_dist, along-path dist to current/max_dist,
    steps-since-visit/max_step].

    traj_positions: chronological (x, height, y) triples, last = current node.
    traj_step_dists[j] = distance walked from node j-1 to node j (0 at j=0).
    Returns (T, af+3) rows in chronological order."""
    T = len(traj_positions)
    cur = traj_positions[-1]
    out = np.zeros((T, af + 3), np.float32)
    path_dist = np.zeros((T,), np.float64)
    for j in range(T - 2, -1, -1):
        path_dist[j] = path_dist[j + 1] + traj_step_dists[j + 1]
    for j in range(T):
        h, e, d = rel_pos_features(cur, traj_positions[j], cur_heading)
        out[j, :af] = angle_features(h, e, af)
        out[j, af] = d / max_dist
        out[j, af + 1] = path_dist[j] / max_dist
        out[j, af + 2] = (T - 1 - j) / max_step
    return out


def start_pos_features(traj_positions, traj_step_dists, cur_heading: float,
                       af: int, max_dist: float,
                       max_step: float) -> np.ndarray:
    """cur_start_pos_fts (Policy:590-601): rel pos of the START node from the
    current pose + [line dist/max_dist, total path dist/max_dist,
    action_step/max_step] where action_step == node count
    (ss_trainer_GridMap.py:254 sets action_step = stepk + 1)."""
    h, e, d = rel_pos_features(traj_positions[-1], traj_positions[0],
                               cur_heading)
    out = np.zeros((af + 3,), np.float32)
    out[:af] = angle_features(h, e, af)
    out[af] = d / max_dist
    out[af + 1] = float(np.sum(traj_step_dists)) / max_dist
    out[af + 2] = len(traj_positions) / max_step
    return out


class CEAgent:
    def __init__(self, cfg: GridMMConfig, navigator: GridMMNavigator,
                 nav_params, waypoint: WaypointPredictor, wp_params,
                 clip_model: Optional[ClipVisionTransformer] = None,
                 clip_params=None, rgb_tower=None, rgb_params=None,
                 depth_tower=None, depth_params=None,
                 view_encoder: Optional[ClipVisionTransformer] = None,
                 view_params=None,
                 max_candidates: int = 5):
        self.cfg = cfg
        self.navigator = navigator
        self.nav_params = nav_params
        self.max_candidates = max_candidates

        self.clip = clip_model
        self.clip_params = clip_params
        # per-view features: timm ViT-B/16 cls when a view tower is given
        # (Policy:338 forward_features[:,0,:]); CLIP cls fallback otherwise
        self.view_encoder = view_encoder
        self.view_params = view_params
        self.rgb_tower = rgb_tower
        self.rgb_params = rgb_params
        self.depth_tower = depth_tower
        self.depth_params = depth_params
        self.waypoint = waypoint
        self.wp_params = wp_params
        # per-env trajectory history, reset at step 0 of each episode batch
        self._traj_pos: List[List[np.ndarray]] = []
        self._traj_dist: List[List[float]] = []

        self._jit_language = jax.jit(
            lambda p, ids, mask: navigator.apply(
                p, "language", {"txt_ids": ids, "txt_mask": mask}))
        self._jit_nav = jax.jit(
            lambda p, txt, mask, carry, x: nav_device_step(
                navigator, cfg, p, txt, mask, carry, x))
        self._jit_perception = jax.jit(self._perception_impl)
        # greedy rollouts run perception + candidate extraction + step
        # assembly + navigation as ONE dispatch (ce/device_step.py); the
        # host path stays for teacher feedback (oracle RPC between
        # candidate extraction and action) and train-time sampling.
        # "auto" fuses single-env rollouts only: at B>1 through the tunneled
        # dev chip the fused step's one stacked observation upload is
        # bandwidth-bound and measured slower than the legacy path's
        # overlapped per-env uploads (PARITY.md round-4 p50s: 312 vs 362 ms
        # at B=1, 1707 vs 950 ms at B=4); GRIDMM_CE_FUSED=1/0 forces either
        # path (a locally attached chip wins fused at any B by dispatch
        # count). True/False assignments keep forcing too (tests, bench).
        self.fused_rollout = os.environ.get("GRIDMM_CE_FUSED", "auto")
        self._jit_full_step = jax.jit(self._full_step_impl)

    # ------------------------------------------------------------- device fns
    def _waypoint_impl(self, wp_params, rgb_params, depth_params, rgb, depth):
        """(B,12,H,W,3) u8 + (B,12,Hd,Wd) -> (NMS'd heatmap, probs), each
        (B,120,12)."""
        b = rgb.shape[0]
        rgb_flat = rgb.reshape((-1,) + rgb.shape[2:])
        depth_flat = depth.reshape((-1,) + depth.shape[2:])[..., None]
        rgb_f = self.rgb_tower.apply(rgb_params, rgb_flat)
        dep_f = self.depth_tower.apply(depth_params, depth_flat)
        logits = self.waypoint.apply(wp_params, rgb_f, dep_f)  # (B,120,12)
        probs = jax.nn.softmax(
            logits.reshape(b, -1), axis=-1).reshape(b, NUM_ANGLES, NUM_DISTS)
        return waypoint_nms(probs, max_predictions=self.max_candidates,
                            sigma=(7.0, 5.0)), probs

    def _perception_impl(self, wp_params, rgb_params, depth_params,
                         clip_params, view_params, rgb, depth):
        """All per-step perception in ONE dispatch: waypoint towers + NMS,
        CLIP grid tokens, optional timm view cls. One compiled graph means
        one host round trip per step instead of three and lets XLA overlap
        the independent towers."""
        nms_maps, probs = self._waypoint_impl(wp_params, rgb_params,
                                              depth_params, rgb, depth)
        patch, view_cls = self._grid_fts_impl(clip_params, rgb)
        view_feats = (self._view_fts_impl(view_params, rgb)
                      if self.view_encoder is not None else None)
        return nms_maps, probs, patch, view_cls, view_feats

    def _grid_fts_impl(self, clip_params, rgb):
        """(B,12,H,W,3) u8 -> (patch_fts (B, 12*(T-1), d) f32 device-resident,
        view_cls (B, 12, d) f32).

        The patch tokens feed the point buffer verbatim, so they are sliced,
        reshaped and cast on device and never pulled to the host (at B=4 the
        old host round trip moved ~14 MB/step through the transfer path);
        only the 12 cls rows (for panorama view features) come back."""
        d = self.cfg.model.image_feat_size
        b, v = rgb.shape[0], rgb.shape[1]
        flat = rgb.reshape((-1,) + rgb.shape[2:])
        toks = self.clip.apply(clip_params, normalize_images(flat))
        toks = toks.reshape(b, v, *toks.shape[1:])
        patch = toks[:, :, 1:, :d].astype(jnp.float32).reshape(b, -1, d)
        return patch, toks[:, :, 0, :d].astype(jnp.float32)

    def _full_step_impl(self, nav_params, wp_params, rgb_params, depth_params,
                        clip_params, view_params, txt_embeds, txt_mask, carry,
                        rgb, depth, pos_xy, heading, traj_pos, traj_dist,
                        traj_len, t, ended=None):
        """The ENTIRE greedy policy step as one XLA graph: perception towers,
        waypoint candidates from the NMS heatmap (lax.top_k), step assembly
        (ce/device_step.py twin of _build_step), navigation forward. One
        dispatch per action instead of two plus host assembly."""
        from gridmm_tpu.ce.device_step import (device_build_step,
                                               device_candidates)

        nms_maps, _probs, patch, view_cls, view_feats = self._perception_impl(
            wp_params, rgb_params, depth_params, clip_params, view_params,
            rgb, depth)
        cand = device_candidates(nms_maps, self.max_candidates)
        x = device_build_step(self.cfg, cand, view_cls, depth, pos_xy,
                              heading, traj_pos, traj_dist, traj_len, t,
                              view_feats=view_feats, ended=ended)
        x = x._replace(patch_fts=patch)
        carry, out = nav_device_step(self.navigator, self.cfg, nav_params,
                                     txt_embeds, txt_mask, carry, x)
        from gridmm_tpu.ce.device_step import ce_action_logits
        logits = ce_action_logits(out.global_logits, out.local_logits,
                                  x.cand_gmap_idx)
        return carry, logits, cand

    def _view_fts_impl(self, view_params, rgb):
        """(B,12,H,W,3) u8 -> (B, 12, width) timm-ViT cls features
        (Policy:335-343: visual_encoder.forward_features[:, 0, :])."""
        flat = rgb.reshape((-1,) + rgb.shape[2:])
        toks = self.view_encoder.apply(view_params,
                                       normalize_images_timm(flat))
        return toks[:, 0, :].reshape(rgb.shape[0], rgb.shape[1], -1)

    # ------------------------------------------------------------ host logic
    @staticmethod
    def candidates_from_nms(nms_map: np.ndarray, heading: float,
                            max_candidates: int,
                            probs: Optional[np.ndarray] = None,
                            rng: Optional[np.random.Generator] = None):
        """Nonzero peaks -> [(abs_heading, distance, score)] (Policy:360-391;
        heatmap angle 0 is the agent's heading).

        Train-time augmentation (Policy:393-425): when `probs` is given, each
        peak's (angle, distance) is re-sampled from the probability mass of
        its 30-degree image sector instead of taken at the argmax."""
        out = []
        ang, dst = np.nonzero(nms_map)
        per_img = NUM_ANGLES // 12  # 10 angle bins per image sector
        for a, d in zip(ang, dst):
            score = float(nms_map[a, d])
            if probs is not None and rng is not None:
                img = ((a + per_img // 2) // per_img) % 12
                # sector 0 wraps: original angle bins {-5..4} mod 120
                # (the reference rolls by HEATMAP_OFFSET before reshaping,
                # Policy:397-401). Sampling from the renormalized full-map
                # softmax over the sector == softmax of the sector logits
                # (Policy:412-413).
                start = (img * per_img - per_img // 2) % NUM_ANGLES
                rows = (start + np.arange(per_img)) % NUM_ANGLES
                region = probs[rows]  # (10, 12)
                p = region.reshape(-1).astype(np.float64)
                p = p / p.sum() if p.sum() > 0 else np.full(p.size, 1 / p.size)
                pick = rng.choice(p.size, p=p)
                k = pick // NUM_DISTS
                if img != 0:
                    a = (img - 1) * per_img + per_img // 2 + k  # true angle
                else:
                    # reference quirk (Policy:417-421): angle_pointer = 0 for
                    # sector 0, so its samples — drawn from the ROLLED rows
                    # {115..119, 0..4} — are labeled angles 0..9 verbatim.
                    # Released checkpoints trained through this off-by-5.
                    a = int(k)
                d = pick % NUM_DISTS
            abs_heading = heading + a * (2 * math.pi / NUM_ANGLES)
            out.append((abs_heading, (d + 1) * DIST_BIN, score))
        # reference order: np.nonzero row-major = angle-major ascending
        # (Policy:446-449 batch_output_map.nonzero()); NMS already bounds the
        # count at max_predictions == max_candidates
        return out[:max_candidates]

    def rollout(self, env: ContinuousEnv, max_steps: int = 8,
                feedback: str = "argmax",
                rng: Optional[np.random.Generator] = None,
                on_step=None, timer=None):
        """Run one batch of episodes; returns (metrics list, losses info).

        on_step(t, obs) is invoked with the observation list at every step
        (t=0 is the reset state) — the eval video/trace hook
        (base_il_trainer.py:631-644 rgb_frames collection).

        timer: optional utils.logging.SectionTimer accumulating per-phase
        wall time (transfer/perception/candidates/build_step/teacher/nav/
        env_step) for latency attribution."""
        import contextlib

        cfg = self.cfg
        # the point buffer caps episode length: appends past capacity would
        # silently overwrite the tail window (dynamic_update_slice clamps its
        # start index). Clamp LOUDLY instead — full-scale CE presets carry a
        # 20-step buffer matching IL.max_traj_len (run_GridMap.yaml:23)
        cap = cfg.shapes.max_points // cfg.grid.points_per_step
        if max_steps > cap:
            print(f"[ce] max_steps {max_steps} exceeds the {cap}-step point "
                  f"buffer; clamping (raise NavigatorShapes.max_points for "
                  f"longer episodes)", flush=True)
            max_steps = cap
        rng = rng or np.random.default_rng(0)
        sec = (timer.section if timer is not None
               else (lambda name: contextlib.nullcontext()))
        obs = env.reset()
        b = env.num_envs
        sh = cfg.shapes
        v, g = sh.max_vp_len, sh.max_gmap_len
        af = cfg.model.angle_feat_size
        d_img = cfg.model.image_feat_size
        gc = cfg.grid

        txt_ids = np.zeros((b, sh.max_txt_len), np.int32)
        txt_mask = np.zeros((b, sh.max_txt_len), bool)
        for i, ob in enumerate(obs):
            enc = ob.instruction_ids[: sh.max_txt_len]
            txt_ids[i, : len(enc)] = enc
            txt_mask[i, : len(enc)] = True
        txt_embeds = self._jit_language(self.nav_params, jnp.asarray(txt_ids),
                                        jnp.asarray(txt_mask))

        carry = init_carry(cfg, b)
        ended = np.zeros((b,), bool)
        # ended on the agent's own STOP (success requires it, base_il_trainer
        # :598) + per-macro-step distance-to-goal series (Position measure)
        stopped = np.zeros((b,), bool)
        dist_hist = [[env.dist_to_goal(i)] for i in range(b)]
        next_slot = np.full((b,), 1, np.int32)  # stable slots; 0 = [stop]
        ce_losses = []

        # depth patch centers (Policy:728-730): 19 + 36*i over 256px maps
        centers = np.asarray([19 + 36 * i for i in range(7)])

        fuse = self.fused_rollout
        # "auto" may route B=1 and B>1 through different paths; that is safe
        # only because the fused step is action-trace-equivalent to this host
        # path — tests/test_ce_device_step.py::
        # test_fused_rollout_matches_legacy_actions asserts identical paths
        # AND metrics, so eval results cannot vary with --num_envs.
        if feedback == "argmax" and (
                fuse in (True, "1") or (fuse == "auto" and b == 1)):
            return self._rollout_fused(env, obs, txt_embeds, txt_mask, carry,
                                       max_steps, on_step, sec)

        for t in range(max_steps):
            if on_step is not None:
                on_step(t, obs)
            with sec("transfer"):
                rgb = jnp.asarray(np.stack([ob.rgb for ob in obs]))
                depth = jnp.asarray(np.stack([ob.depth for ob in obs]))
            with sec("perception"):
                nms_maps, _probs, patch_dev, view_cls, view_feats = \
                    self._jit_perception(self.wp_params, self.rgb_params,
                                         self.depth_params, self.clip_params,
                                         self.view_params, rgb, depth)
                # one batched device_get (async copies overlap — one round
                # trip, not three); patch tokens stay device-resident
                nms_maps, view_cls, view_feats = jax.device_get(
                    (nms_maps, view_cls, view_feats))

            with sec("candidates"):
                cand_lists = [
                    self.candidates_from_nms(nms_maps[i], obs[i].heading,
                                             self.max_candidates)
                    for i in range(b)
                ]

            with sec("build_step"):
                x, cur_slots = self._build_step(
                    obs, cand_lists, view_cls, centers, next_slot, t,
                    view_feats=view_feats, ended=ended)
            if feedback == "teacher":
                # the oracle (geodesic RPC per candidate) is a training-only
                # signal; greedy eval/inference skip it like the reference's
                # _eval_checkpoint does (cand_dist_to_goal only in train_ml,
                # ss_trainer:288-328)
                with sec("teacher"):
                    targets = self._teacher(env, obs, cand_lists, ended)
                x = x._replace(target=targets.astype(np.int32))
            x = x._replace(patch_fts=patch_dev)

            with sec("nav"):
                carry, out = self._jit_nav(
                    self.nav_params, txt_embeds, jnp.asarray(txt_mask), carry,
                    jax.tree_util.tree_map(jnp.asarray, x))
                # CE acts on fused = global+local over [stop]+candidates
                # (gridmap/vilmodel.py:788-800; the trainer consumes that
                # same output for actions AND loss, ss_trainer:269-330)
                from gridmm_tpu.ce.device_step import ce_action_logits
                logits = np.asarray(ce_action_logits(
                    out.global_logits, out.local_logits,
                    jnp.asarray(x.cand_gmap_idx)), np.float64)

            if feedback == "teacher":
                a_t = targets.copy()
                a_t[a_t == self.cfg.train.ignoreid] = 0
            else:
                a_t = logits.argmax(-1)

            with sec("env_step"):
                for i in range(b):
                    if ended[i]:
                        continue
                    if a_t[i] == 0 or t == max_steps - 1:
                        stopped[i] = a_t[i] == 0
                        ended[i] = True
                        continue
                    heading_i, dist_i, _ = cand_lists[i][a_t[i] - 1]
                    env.step_to(i, heading_i, dist_i)
                    dist_hist[i].append(env.dist_to_goal(i))
                obs = env.observations()
            if ended.all():
                break

        metrics = [ce_episode_metrics(
            env.paths[i], obs[i].gt_path, stopped=bool(stopped[i]),
            dists=dist_hist[i],
            collisions=getattr(env, "collisions", [None] * b)[i])
            for i in range(b)]
        return metrics

    def _rollout_fused(self, env: ContinuousEnv, obs, txt_embeds, txt_mask,
                       carry, max_steps: int, on_step, sec):
        """Greedy rollout driving the single-dispatch step: the host only
        maintains the trajectory history, fetches (logits, candidate bins)
        once per step, and moves the env. Action-trace-equivalent to the
        legacy two-dispatch path (tests/test_ce_device_step.py)."""
        b = env.num_envs
        cap = self.cfg.model.max_action_steps
        traj_pos = np.zeros((b, cap, 3), np.float32)
        traj_dist = np.zeros((b, cap), np.float32)
        ended = np.zeros((b,), bool)
        stopped = np.zeros((b,), bool)
        dist_hist = [[env.dist_to_goal(i)] for i in range(b)]
        txt_mask_dev = jnp.asarray(txt_mask)

        for t in range(max_steps):
            if on_step is not None:
                on_step(t, obs)
            r = min(t, cap - 1)
            for i, ob in enumerate(obs):
                p3 = np.array([ob.position[0], getattr(ob, "height", 0.0),
                               ob.position[1]],
                              np.float32)
                traj_dist[i, r] = (0.0 if t == 0 else float(
                    np.linalg.norm(p3 - traj_pos[i, max(r - 1, 0)])))
                traj_pos[i, r] = p3
            with sec("transfer"):
                rgb = jnp.asarray(np.stack([ob.rgb for ob in obs]))
                depth = jnp.asarray(np.stack([ob.depth for ob in obs]))
                pos = jnp.asarray(np.stack(
                    [ob.position for ob in obs]).astype(np.float32))
                hd = jnp.asarray(
                    np.asarray([ob.heading for ob in obs], np.float32))
            with sec("fused_step"):
                carry, logits, cand = self._jit_full_step(
                    self.nav_params, self.wp_params, self.rgb_params,
                    self.depth_params, self.clip_params, self.view_params,
                    txt_embeds, txt_mask_dev, carry, rgb, depth, pos, hd,
                    jnp.asarray(traj_pos), jnp.asarray(traj_dist),
                    jnp.full((b,), min(t + 1, cap), jnp.int32), np.int32(t),
                    jnp.asarray(ended))
                logits = np.asarray(logits, np.float64)
                ang = np.asarray(cand.ang_bins)
                dbin = np.asarray(cand.dist_bins)
                n_cands = np.asarray(cand.mask).sum(-1)
            a_t = logits.argmax(-1)
            with sec("env_step"):
                for i in range(b):
                    if ended[i]:
                        continue
                    if a_t[i] == 0 or t == max_steps - 1 or \
                            a_t[i] > n_cands[i]:
                        stopped[i] = a_t[i] == 0
                        ended[i] = True
                        continue
                    j = int(a_t[i]) - 1
                    heading_i = obs[i].heading + \
                        ang[i, j] * (2 * math.pi / NUM_ANGLES)
                    env.step_to(i, heading_i, (dbin[i, j] + 1) * DIST_BIN)
                    dist_hist[i].append(env.dist_to_goal(i))
                obs = env.observations()
            if ended.all():
                break
        return [ce_episode_metrics(
            env.paths[i], obs[i].gt_path, stopped=bool(stopped[i]),
            dists=dist_hist[i],
            collisions=getattr(env, "collisions", [None] * b)[i])
            for i in range(b)]

    def _build_step(self, obs: List[CEStepObs], cand_lists, view_cls,
                    centers, next_slot, t,
                    view_feats=None, ended=None
                    ) -> Tuple[StepInputs, np.ndarray]:
        """Assemble host-side StepInputs. view_cls is (B, 12, d) per-view cls
        features; the returned patch_fts field is a zero placeholder — the
        caller replaces it with the device-resident patch tokens from
        _grid_fts_impl."""
        cfg = self.cfg
        sh, gc = cfg.shapes, cfg.grid
        b = len(obs)
        v, g = sh.max_vp_len, sh.max_gmap_len
        vm1 = v - 1
        af = cfg.model.angle_feat_size
        d = cfg.model.image_feat_size

        view_img_fts = np.zeros((b, vm1, d), np.float32)
        loc_fts = np.zeros((b, vm1, af + 3), np.float32)
        nav_types = np.zeros((b, vm1), np.int32)
        view_mask = np.zeros((b, vm1), bool)
        depth_p = np.zeros((b, gc.num_views, gc.patches_per_view), np.float32)
        patch_fts = np.zeros((b, gc.points_per_step, d), np.float32)
        pos_xy = np.zeros((b, 2), np.float32)
        heading = np.zeros((b,), np.float32)
        gmap_step_ids = np.zeros((b, g), np.int32)
        gmap_pos_fts = np.zeros((b, g, af + 3), np.float32)
        gmap_mask = np.zeros((b, g), bool)
        gmap_visited = np.zeros((b, g), bool)
        cur_node = np.zeros((b,), np.int32)
        cand_gmap_idx = np.full((b, vm1), -1, np.int32)
        vp_pos_fts = np.zeros((b, v, 2 * af + 6), np.float32)
        vp_nav_mask = np.zeros((b, v), bool)
        fused_add_idx = np.full((b, g), -2, np.int32)

        # per-env trajectory history (reference traj_map, Policy:509-518):
        # current position appended each step with the walked distance
        if t == 0:
            self._traj_pos = [[] for _ in range(b)]
            self._traj_dist = [[] for _ in range(b)]
        for i, ob in enumerate(obs):
            p3 = np.asarray([ob.position[0], getattr(ob, "height", 0.0),
                             ob.position[1]], np.float64)
            step_d = (0.0 if not self._traj_pos[i] else
                      float(np.linalg.norm(p3 - self._traj_pos[i][-1])))
            self._traj_pos[i].append(p3)
            self._traj_dist[i].append(step_d)

        # the reference initializes the 12-view angle table ONCE before its
        # per-env loop and OVERWRITES the same variable with each env's
        # assembled [cand|non-cand] angle rows (Policy:461,470-480): for
        # batch index >= 1 the non-candidate angle features are read from
        # the PREVIOUS env's assembled sequence — batch-position-dependent
        # aliasing the released checkpoints trained through, reproduced
        # deliberately (executed-oracle: test_ref_oracle_ce_full_step)
        ang_table = np.stack([
            angle_features(ix * 2 * math.pi / 12, 0.0, af)
            for ix in range(12)]).astype(np.float32)

        for i, ob in enumerate(obs):
            cands = cand_lists[i]
            # panorama tokens: one feature per view, candidates first — timm
            # ViT cls when a view tower is configured, CLIP cls otherwise
            view_cls_i = (view_feats[i][:, :d] if view_feats is not None
                          else view_cls[i])  # (12, d)
            k = 0
            used_views = set()
            cand_angs = []
            for heading_c, dist_c, _score in cands:
                rel = heading_c - ob.heading
                # nearest 30-degree sector via the INTEGER angle bin (the
                # float64 cancellation in rel is << half a 3-degree bin, so
                # the bin recovery is exact); half-up ties match the device
                # twin (device_step.py) and the sector-sampling augmentation
                a_bin = int(round((rel % (2 * math.pi)) /
                                  (2 * math.pi / NUM_ANGLES))) % NUM_ANGLES
                per_img = NUM_ANGLES // 12
                # COUNTER-clockwise image index over the clockwise-ordered
                # frames (Policy:456-459: 12 - (a+5)//10, 12 -> 0)
                img_idx = (12 - (a_bin + per_img // 2) // per_img) % 12
                used_views.add(img_idx)
                # the reference's candidate angle is the CCW conversion of
                # the bin (Policy:451-452 angle_rad_cc = 2pi - a*3deg, NO
                # modulo: bin 0 keeps the literal 2pi)
                ang_cc = 2 * math.pi - a_bin * (2 * math.pi / NUM_ANGLES)
                cand_angs.append(ang_cc)
                view_img_fts[i, k] = view_cls_i[img_idx]
                loc_fts[i, k, :af] = angle_features(ang_cc, 0.0, af)
                loc_fts[i, k, af:] = 1.0
                nav_types[i, k] = 1
                k += 1
            # non-candidate views EXCLUDE the sectors claimed by candidates
            # (Policy:466-476); angle rows come from the (aliased, see
            # above) running table rather than the raw view azimuths
            for ix in range(12):
                if ix in used_views or k >= vm1:
                    continue
                view_img_fts[i, k] = view_cls_i[ix]
                loc_fts[i, k, :af] = ang_table[ix]
                loc_fts[i, k, af:] = 1.0
                k += 1
            view_mask[i, :k] = True
            # the overwrite that feeds the NEXT env's non-cand rows — only
            # ACTIVE envs participate: the reference PAUSES ended envs
            # (removes them and pops the policy state lists,
            # ss_trainer_GridMap.py:436-450), so an ended env contributes
            # nothing to the chain the remaining envs read
            if ended is None or not ended[i]:
                ang_table = loc_fts[i, :12, :af].copy()

            frame = ob.depth
            if gc.depth_normalized:
                # habitat [0,1] depth -> metres for the grid build with the
                # reference's column-max zero substitution + x100//100 scale
                # dance (GridMap.preprocess_depth, Policy:225-247)
                colmax = frame.max(axis=1, keepdims=True)
                frame = np.where(frame == 0,
                                 np.broadcast_to(colmax, frame.shape), frame)
                frame = (gc.min_depth * 100.0 +
                         frame * (gc.max_depth - gc.min_depth) * 100.0) / 100.0
            dm = frame[:, centers][:, :, centers]
            depth_p[i] = dm.reshape(gc.num_views, gc.patches_per_view)
            pos_xy[i] = ob.position
            heading[i] = ob.heading

            # current position becomes visited node slot t+1
            cur = min(t + 1, g - 1)
            cur_node[i] = cur
            next_slot[i] = cur + 1
            gmap_mask[i, 0] = True
            for s in range(1, cur + 1):
                gmap_mask[i, s] = True
                gmap_visited[i, s] = s < cur  # past positions
                gmap_step_ids[i, s] = min(s, cfg.model.max_action_steps - 1)
            gmap_visited[i, cur] = True
            gmap_step_ids[i, cur] = min(t + 1, cfg.model.max_action_steps - 1)

            # visited-chain positional features: each past node's 7-dim rel
            # pose w.r.t. the CURRENT pose, recomputed every step
            # (Policy:549-560; slot s holds chronological node s-1, slot cur
            # always the current node)
            gmap_pos_fts[i, 0, :af] = angle_features(0.0, 0.0, af)  # [stop]
            tf = traj_pos_features(self._traj_pos[i], self._traj_dist[i],
                                   ob.heading, af, gc.max_dist,
                                   gc.pos_step_norm)
            for s in range(1, cur):
                gmap_pos_fts[i, s] = tf[s - 1]
            gmap_pos_fts[i, cur] = tf[-1]

            # waypoints as ephemeral frontier slots after the visited chain
            # (Policy:537-547). The trainer calls the navigation forward with
            # batch_distances=batch_ANGLES (ss_trainer_GridMap.py:275), so
            # the "distance" entries of the candidate pos features are the
            # CCW angle values — a reference bug the released checkpoints
            # trained through; env stepping still uses the true distance
            # (ss_trainer:293-296 reads the waypoint-branch distances).
            for j, ang_cc in enumerate(cand_angs):
                s = cur + 1 + j
                if s >= g:
                    break
                gmap_mask[i, s] = True
                gmap_pos_fts[i, s, :af] = angle_features(ang_cc, 0.0, af)
                gmap_pos_fts[i, s, af] = ang_cc / gc.max_dist
                gmap_pos_fts[i, s, af + 1] = ang_cc / gc.max_dist
                gmap_pos_fts[i, s, af + 2] = 1.0 / gc.pos_step_norm
                gmap_step_ids[i, s] = min(cur + 1,
                                          cfg.model.max_action_steps - 1)
                cand_gmap_idx[i, j] = s
                fused_add_idx[i, s] = j + 1

            # vp tokens: every row leads with the current-pose-to-start
            # features (Policy:604-606 vp_pos_fts[:, :7] = cur_start_pos_fts)
            vp_pos_fts[i, :, : af + 3] = start_pos_features(
                self._traj_pos[i], self._traj_dist[i], ob.heading, af,
                gc.max_dist, gc.pos_step_norm)
            vp_nav_mask[i, 0] = True
            vp_nav_mask[i, 1: 1 + len(cands)] = True
            for j, ang_cc in enumerate(cand_angs):
                vp_pos_fts[i, j + 1, af + 3: 2 * af + 3] = angle_features(
                    ang_cc, 0.0, af)
                # cur_cand_pos_fts triple (Policy:576-584) with the same
                # batch_distances=batch_angles substitution as the gmap rows
                vp_pos_fts[i, j + 1, 2 * af + 3] = ang_cc / gc.max_dist
                vp_pos_fts[i, j + 1, 2 * af + 4] = ang_cc / gc.max_dist
                vp_pos_fts[i, j + 1, 2 * af + 5] = 1.0 / gc.pos_step_norm

        ig = np.full((b,), self.cfg.train.ignoreid, np.int32)
        return StepInputs(
            view_img_fts=view_img_fts, loc_fts=loc_fts, nav_types=nav_types,
            view_mask=view_mask, depth=depth_p, patch_fts=patch_fts,
            pos_xy=pos_xy, heading=heading, gmap_step_ids=gmap_step_ids,
            gmap_pos_fts=gmap_pos_fts, gmap_mask=gmap_mask,
            gmap_visited_mask=gmap_visited, cur_node_idx=cur_node,
            cand_gmap_idx=cand_gmap_idx, vp_pos_fts=vp_pos_fts,
            vp_nav_mask=vp_nav_mask, fused_add_idx=fused_add_idx,
            cand_backtrack_mask=np.zeros((b, v), bool),
            target=ig, grid_target=ig.copy(),
            vp_obj_mask=np.zeros((b, v), bool), obj_target=ig.copy(),
        ), cur_node

    def _teacher(self, env: ContinuousEnv, obs, cand_lists,
                 ended) -> np.ndarray:
        """Oracle teacher over [stop]+candidates (ss_trainer:288-328)."""
        b = len(obs)
        a = np.full((b,), self.cfg.train.ignoreid, np.int64)
        for i in range(b):
            if ended[i]:
                continue
            cur_d = env.dist_to_goal(i)
            # the reference stops inside 1.5 m — its comment says "def as
            # 3.0" but the code tests < 1.5 (ss_trainer_GridMap.py:305-308)
            if cur_d < 1.5:
                a[i] = 0
                continue
            # otherwise argmin over candidate end-distances UNCONDITIONALLY
            # (ss_trainer_GridMap.py:310): the oracle moves to the least-bad
            # candidate even when none improves on the current distance
            dists = [env.cand_dist_to_goal(i, heading_c, dist_c)
                     for heading_c, dist_c, _s in cand_lists[i]]
            a[i] = 1 + int(np.argmin(dists)) if dists else 0
        return a
