"""Executed-reference oracle for the FULL VLN-CE policy step.

The reference's actual ``GridMap`` net (Policy_ViewSelection_GridMap.py)
drives three consecutive steps END TO END — real ``preprocess_depth``
(:225-247), real ``getGlobalMap`` online grid build (:689-807), the real
waypoint-branch candidate extraction + panorama token assembly (:360-500),
the real navigation-branch traj/vp positional features and trajectory
bookkeeping (:502-630), and the real ``GlocalTextPathNavCMT`` forward with
seeded weights — against our ``CEAgent`` host path (``candidates_from_nms``
+ ``_build_step`` + ``nav_device_step``) with the same weights imported.

Only the perception towers are stubbed, IDENTICALLY on both sides: the
waypoint heatmap logits, the CLIP grid tokens, and the timm view cls
features are shared synthetic tensors (their internal tower math is oracled
separately: test_ref_oracle_waypoint_predictor / _clip_visual /
_waypoint_nms). Everything downstream — NMS, candidate geometry, the
sector/angle/"distance" contracts (including the trainer's
``batch_distances=batch_angles`` substitution, ss_trainer_GridMap.py:275),
non-candidate view exclusion, depth preprocessing, grid build, positional
features, model forward, stop-column reorder — is reference execution.

Scripted positions/headings stand in for the habitat env on both sides, so
the oracle needs no simulator.
"""

import math
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_oracle import (load_ce_policy, load_ref_package_dir,  # noqa: E402
                        nav_bert_config, require_reference)

pytestmark = pytest.mark.slow

HID, HEADS, INTER = 768, 4, 512
NL, NX, NP = 1, 2, 1
ANGLE, VOCAB = 4, 128
B, T_TXT = 2, 10
STEPS = 3
K = 5
DEPTH_HW = 256


class _CmpList(list):
    """list whose ``== []`` stays a plain bool under the Policy's step-0
    test (Policy:745 ``self.global_fts[i] == []``)."""


def _our_cfg():
    import dataclasses

    from gridmm_tpu.config import r2r_ce_config

    base = r2r_ce_config()
    model = dataclasses.replace(
        base.model, vocab_size=VOCAB, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP, num_attention_heads=HEADS,
        intermediate_size=INTER, image_feat_size=HID,
        angle_feat_size=ANGLE, obj_feat_size=0,
        max_position_embeddings=32)
    shapes = dataclasses.replace(
        base.shapes, max_txt_len=T_TXT, max_gmap_len=12, max_vp_len=20,
        max_points=4 * 588, max_obj_len=0)
    grid = dataclasses.replace(base.grid, max_steps=4)
    return dataclasses.replace(base, model=model, shapes=shapes, grid=grid)


def _make_ref_net(ref_bert, vm):
    net = vm.GridMap.__new__(vm.GridMap)
    net.device = torch.device("cpu")
    # bypass nn.Module.__setattr__ (Module.__init__ never ran on __new__)
    object.__setattr__(net, "vln_bert", ref_bert)
    # episode state exactly as ss_trainer resets it (:239-253)
    net.global_fts = [_CmpList() for _ in range(B)]
    net.global_position_x = [[] for _ in range(B)]
    net.global_position_y = [[] for _ in range(B)]
    net.global_mask = [[] for _ in range(B)]
    net.max_x, net.min_x = [-10000] * B, [10000] * B
    net.max_y, net.min_y = [-10000] * B, [10000] * B
    net.global_map_index = [[] for _ in range(B)]
    net.traj_embeds = [[] for _ in range(B)]
    net.traj_map = [[] for _ in range(B)]
    # tower stubs: transforms produce placeholder pixel tensors; the CLIP /
    # timm forwards are replaced per-step with the shared synthetic tokens
    net.grid_transforms = net.view_transforms = \
        net.grid_transforms_train = net.view_transforms_train = \
        lambda img: torch.zeros(3, 2, 2)
    net.depth_encoder = lambda obs: None
    net.rgb_encoder = lambda obs: None
    return net


def _ref_observations(depth_cw, rgb_cw):
    """Scatter clockwise view frames into habitat sensor keys so the
    Policy's clockwise reversal (:301-308) reconstructs them: clockwise
    view j = sensor (12-j)%12 (sensors ascend CCW)."""
    obs = {}
    obs["instruction"] = torch.zeros(B, 4)
    for a_count in range(12):
        kd = "depth" if a_count == 0 else f"depth_{30.0 * a_count}"
        j = (12 - a_count) % 12
        obs[kd] = torch.from_numpy(depth_cw[:, j][..., None].copy())
    for a_count in range(12):
        kr = "rgb" if a_count == 0 else f"rgb_{30.0 * a_count}"
        j = (12 - a_count) % 12
        obs[kr] = torch.from_numpy(rgb_cw[:, j].copy())
    return obs


def test_ref_oracle_ce_full_step(monkeypatch):
    require_reference()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    vm = load_ce_policy()
    import types as _types

    cevm = load_ref_package_dir("VLN_CE/vlnce_baselines/models/gridmap",
                                "ce_gridmap", "vilmodel")
    cevm.timm = _types.SimpleNamespace(
        create_model=lambda *a, **k: torch.nn.Identity())
    cevm.CLIP = lambda **kw: torch.nn.Identity()
    torch.manual_seed(71)
    ref_bert = cevm.GlocalTextPathNavCMT(nav_bert_config(
        num_l_layers=NL, num_x_layers=NX, num_pano_layers=NP, heads=HEADS,
        intermediate=INTER, image_feat_size=HID, angle_feat_size=ANGLE,
        vocab=VOCAB)).eval()
    net = _make_ref_net(ref_bert, vm)
    assert vm.DATASET == "R2R" and vm.MAX_DIST == 25 and vm.MAX_STEP == 20

    # ---- ours: same weights through the importer --------------------------
    from gridmm_tpu.ce.agent import CEAgent
    from gridmm_tpu.ce.device_step import ce_action_logits
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.models.waypoint import waypoint_nms
    from gridmm_tpu.train.step import init_carry
    from gridmm_tpu.utils import checkpoint as CK

    cfg = _our_cfg()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    loaded, report = CK.import_torch_navigator(
        ref_bert.state_dict(), params, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP)
    assert report["unused_torch_keys"] == []
    assert report["unfilled_flax_leaves"] == []
    agent = CEAgent(cfg, model, loaded, waypoint=None, wp_params=None,
                    max_candidates=K)

    rng = np.random.default_rng(73)
    txt = rng.standard_normal((B, T_TXT, HID)).astype(np.float32) * 0.3
    txt_mask = np.zeros((B, T_TXT), bool)
    txt_mask[0, :7] = True
    txt_mask[1, :10] = True

    # scripted poses: habitat (x, height=0, z) triples per step
    pos3 = rng.uniform(-3, 3, size=(STEPS, B, 3)).astype(np.float64)
    pos3[..., 1] = 0.0
    headings = rng.uniform(-np.pi, np.pi, size=(STEPS, B)).astype(np.float64)

    centers = np.asarray([19 + 36 * i for i in range(7)])
    carry = init_carry(cfg, B)
    next_slot = np.full((B,), 1, np.int32)

    for t in range(STEPS):
        # shared synthetic perception for this step
        heat = (rng.standard_normal((B, 120, 12)) * 3).astype(np.float32)
        grid_tokens = (rng.standard_normal((B, 12, 50, HID)) * 0.3
                       ).astype(np.float32)
        view_tokens = (rng.standard_normal((B, 12, 3, HID)) * 0.3
                       ).astype(np.float32)  # [:, :, 0] = cls
        depth_cw = rng.uniform(0.0, 1.0, (B, 12, DEPTH_HW, DEPTH_HW)
                               ).astype(np.float32)
        depth_cw[rng.random(depth_cw.shape) < 0.05] = 0.0
        rgb_cw = rng.integers(0, 255, (B, 12, 8, 8, 3)).astype(np.uint8)

        plist = [pos3[t, i] for i in range(B)]
        hlist_raw = [float(headings[t, i]) for i in range(B)]
        hlist = [(h + 2 * math.pi) % (2 * math.pi) for h in hlist_raw]

        # ------------------------- reference side --------------------------
        net.action_step = t + 1
        net.positions = plist
        net.headings = hlist
        if t == 0:
            net.start_positions = plist
            net.start_headings = hlist

        def _clip_stub(x, g=grid_tokens):
            return torch.from_numpy(g.reshape(-1, 50, HID))

        object.__setattr__(net.vln_bert, "clip", _clip_stub)
        object.__setattr__(
            net.vln_bert, "visual_encoder",
            SimpleNamespace(forward_features=lambda x, v=view_tokens:
                            torch.from_numpy(v.reshape(-1, 3, HID))))
        wp_stub = (lambda rgb_e, depth_e, h=heat: torch.from_numpy(h))

        obs_t = _ref_observations(depth_cw, rgb_cw)
        with torch.no_grad():
            (cand_mask, cand_lens, b_angles, b_dists, bvif, blf, bnt, bvl,
             bgf, bmi, bgpf) = net.forward(
                 mode="waypoint", waypoint_predictor=wp_stub,
                 observations=obs_t, in_train=False, headings=hlist,
                 positions=plist)
            ref_logits = net.forward(
                mode="navigation", observations=obs_t,
                lang_masks=torch.from_numpy(txt_mask),
                lang_feats=torch.from_numpy(txt), in_train=False,
                candidate_lengths=cand_lens, batch_angles=b_angles,
                # the trainer's bug, reproduced verbatim
                # (ss_trainer_GridMap.py:275): distances <- angles
                batch_distances=b_angles,
                batch_view_img_fts=bvif, positions=plist,
                batch_loc_fts=blf, batch_nav_types=bnt, batch_view_lens=bvl,
                batch_grid_fts=bgf, batch_map_index=bmi,
                batch_gridmap_pos_fts=bgpf)
            ref_logits = ref_logits.masked_fill(cand_mask, -float("inf"))
        for i in range(B):
            net.global_fts[i] = np.asarray(net.global_fts[i]).view(
                _CmpArrRef)

        # ---------------------------- our side -----------------------------
        probs = jax.nn.softmax(
            jnp.asarray(heat).reshape(B, -1), -1).reshape(B, 120, 12)
        nms_np = np.asarray(waypoint_nms(probs, max_predictions=K,
                                         sigma=(7.0, 5.0)))
        obs_list = [
            SimpleNamespace(position=np.array([pos3[t, i, 0], pos3[t, i, 2]],
                                              np.float32),
                            heading=hlist_raw[i], depth=depth_cw[i])
            for i in range(B)]
        cand_lists = [agent.candidates_from_nms(nms_np[i], hlist_raw[i], K)
                      for i in range(B)]
        x, _ = agent._build_step(obs_list, cand_lists, None, centers,
                                 next_slot, t,
                                 view_feats=view_tokens[:, :, 0, :])
        x = x._replace(patch_fts=grid_tokens[:, :, 1:, :].reshape(
            B, 588, HID))
        carry, out = agent._jit_nav(
            agent.nav_params, jnp.asarray(txt), jnp.asarray(txt_mask), carry,
            jax.tree_util.tree_map(jnp.asarray, x))
        our_logits = np.asarray(ce_action_logits(
            out.global_logits, out.local_logits,
            jnp.asarray(x.cand_gmap_idx)), np.float64)

        # --------------------------- comparisons ---------------------------
        want_vif = bvif.numpy()
        want_lf = blf.numpy()
        want_nt = bnt.numpy()
        got_vif = np.asarray(x.view_img_fts)
        got_lf = np.asarray(x.loc_fts)
        got_nt = np.asarray(x.nav_types)
        for i in range(B):
            vl = int(bvl[i])
            assert vl == int(np.asarray(x.view_mask)[i].sum()), (t, i)
            assert cand_lens[i] == len(cand_lists[i]) + 1, (t, i)
            np.testing.assert_allclose(got_vif[i, :vl], want_vif[i, :vl],
                                       atol=1e-6, err_msg=f"view t{t} i{i}")
            np.testing.assert_allclose(got_lf[i, :vl], want_lf[i, :vl],
                                       atol=1e-6, err_msg=f"loc t{t} i{i}")
            np.testing.assert_array_equal(got_nt[i, :vl], want_nt[i, :vl])
        # (the grid build itself — cells/half_len/pos fts — is oracled
        # separately in test_reference_oracle.py::test_ref_oracle_grid_build
        # _ce; here its effect reaches the logits through the grid branch)

        # logits: reference rolls [stop] to the END of the candidate block
        # (Policy:626-629); ours keeps [stop] at column 0
        want = ref_logits.numpy().astype(np.float64)
        for i in range(B):
            L = cand_lens[i]
            np.testing.assert_allclose(our_logits[i, 0], want[i, L - 1],
                                       atol=3e-3, err_msg=f"stop t{t} i{i}")
            np.testing.assert_allclose(our_logits[i, 1:L], want[i, :L - 1],
                                       atol=3e-3, err_msg=f"cands t{t} i{i}")


class _CmpArrRef(np.ndarray):
    """ndarray view whose ``== []`` is plain False (Policy:745 under
    numpy 2)."""

    def __eq__(self, other):
        if isinstance(other, list) and not other:
            return False
        return np.ndarray.__eq__(self, other)

    __hash__ = None


def test_ref_oracle_ce_full_step_train_sampling(monkeypatch):
    """One in_train=True step: the reference re-samples each candidate's
    (angle, dist) from its rolled heatmap sector (Policy:393-425) and builds
    ALL candidate tokens/features from the SAMPLED bins — including the
    sector-0 angle_pointer=0 off-by-5. Categorical is patched to argmax on
    both sides (argmax of the sector softmax == argmax of our renormalized
    full-softmax region), making the stochastic path deterministic and
    executable end to end."""
    require_reference()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    vm = load_ce_policy()
    import types as _types

    cevm = load_ref_package_dir("VLN_CE/vlnce_baselines/models/gridmap",
                                "ce_gridmap", "vilmodel")
    cevm.timm = _types.SimpleNamespace(
        create_model=lambda *a, **k: torch.nn.Identity())
    cevm.CLIP = lambda **kw: torch.nn.Identity()
    torch.manual_seed(77)
    ref_bert = cevm.GlocalTextPathNavCMT(nav_bert_config(
        num_l_layers=NL, num_x_layers=NX, num_pano_layers=NP, heads=HEADS,
        intermediate=INTER, image_feat_size=HID, angle_feat_size=ANGLE,
        vocab=VOCAB)).eval()
    net = _make_ref_net(ref_bert, vm)

    class _ArgmaxCat:
        def __init__(self, probs):
            self.probs = probs

        def sample(self):
            return self.probs.argmax(1)

    monkeypatch.setattr(torch.distributions, "Categorical", _ArgmaxCat)

    from gridmm_tpu.ce.agent import CEAgent
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.models.waypoint import waypoint_nms
    from gridmm_tpu.utils import checkpoint as CK

    cfg = _our_cfg()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    loaded, _ = CK.import_torch_navigator(
        ref_bert.state_dict(), params, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP)
    agent = CEAgent(cfg, model, loaded, waypoint=None, wp_params=None,
                    max_candidates=K)

    class _ArgmaxRng:
        def choice(self, n, p=None):
            return int(np.argmax(p))

    rng = np.random.default_rng(79)
    heat = (rng.standard_normal((B, 120, 12)) * 3).astype(np.float32)
    grid_tokens = (rng.standard_normal((B, 12, 50, HID)) * 0.3
                   ).astype(np.float32)
    view_tokens = (rng.standard_normal((B, 12, 3, HID)) * 0.3
                   ).astype(np.float32)
    depth_cw = rng.uniform(0.0, 1.0, (B, 12, DEPTH_HW, DEPTH_HW)
                           ).astype(np.float32)
    rgb_cw = rng.integers(0, 255, (B, 12, 8, 8, 3)).astype(np.uint8)
    pos3 = rng.uniform(-3, 3, size=(B, 3)).astype(np.float64)
    pos3[:, 1] = 0.0
    headings = rng.uniform(-np.pi, np.pi, size=(B,)).astype(np.float64)
    plist = [pos3[i] for i in range(B)]
    hlist_raw = [float(headings[i]) for i in range(B)]
    hlist = [(h + 2 * math.pi) % (2 * math.pi) for h in hlist_raw]

    net.action_step = 1
    net.positions = plist
    net.headings = hlist
    net.start_positions = plist
    net.start_headings = hlist
    object.__setattr__(net.vln_bert, "clip",
                       lambda x: torch.from_numpy(
                           grid_tokens.reshape(-1, 50, HID)))
    object.__setattr__(
        net.vln_bert, "visual_encoder",
        SimpleNamespace(forward_features=lambda x: torch.from_numpy(
            view_tokens.reshape(-1, 3, HID))))

    obs_t = _ref_observations(depth_cw, rgb_cw)
    with torch.no_grad():
        (cand_mask, cand_lens, b_angles, b_dists, bvif, blf, bnt, bvl,
         *_rest) = net.forward(
             mode="waypoint",
             waypoint_predictor=lambda r, d: torch.from_numpy(heat),
             observations=obs_t, in_train=True, headings=hlist,
             positions=plist)

    probs = jax.nn.softmax(
        jnp.asarray(heat).reshape(B, -1), -1).reshape(B, 120, 12)
    probs_np = np.asarray(probs)
    nms_np = np.asarray(waypoint_nms(probs, max_predictions=K,
                                     sigma=(7.0, 5.0)))
    from types import SimpleNamespace as NS
    obs_list = [NS(position=np.array([pos3[i, 0], pos3[i, 2]], np.float32),
                   heading=hlist_raw[i], depth=depth_cw[i], height=0.0)
                for i in range(B)]
    cand_lists = [
        agent.candidates_from_nms(nms_np[i], hlist_raw[i], K,
                                  probs=probs_np[i], rng=_ArgmaxRng())
        for i in range(B)]
    centers = np.asarray([19 + 36 * i for i in range(7)])
    x, _ = agent._build_step(obs_list, cand_lists, None, centers,
                             np.ones((B,), np.int32), 0,
                             view_feats=view_tokens[:, :, 0, :])

    got_vif = np.asarray(x.view_img_fts)
    got_lf = np.asarray(x.loc_fts)
    for i in range(B):
        vl = int(bvl[i])
        assert cand_lens[i] == len(cand_lists[i]) + 1
        # sampled candidate angles flow into the features on both sides
        np.testing.assert_allclose(
            [a for a in b_angles[i]],
            [2 * math.pi - (int(round(((h - hlist_raw[i]) % (2 * math.pi)) /
                                      (2 * math.pi / 120))) % 120) *
             (2 * math.pi / 120) for h, _, _ in cand_lists[i]], atol=1e-5)
        np.testing.assert_allclose(got_vif[i, :vl], bvif[i, :vl].numpy(),
                                   atol=1e-6, err_msg=f"view i{i}")
        np.testing.assert_allclose(got_lf[i, :vl], blf[i, :vl].numpy(),
                                   atol=1e-6, err_msg=f"loc i{i}")
