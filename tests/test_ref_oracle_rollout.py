"""Executed-reference oracle for the FULL fine-tune rollout.

The reference's actual ``GMapNavAgent.rollout`` (map_nav_src/r2r/agent.py
:268-452) runs end-to-end — real ``GlocalTextPathNavCMT`` weights, real
``GraphMap`` bookkeeping, real ``EnvBatch.getGlobalMap`` online grid build
(r2r/env.py:267-374), real ``_teacher_action`` (:207-237) and summed IL loss
(agent_base.py:141, agent.py:370,447) — against our ``NavAgent.rollout`` +
``trajectory_loss`` on the same synthetic scan with the reference's weights
imported.  One test covers the remaining hand-transcribed surface of
``train/agent.py`` in a single shot: ``build_step_inputs``,
``teacher_actions``, stop-probability bookkeeping, ``make_equiv_action``
path building, the ended/just_ended protocol, the post-stop best-node jump,
and replay-loss scaling.

Env-contract note: the obs dicts fed to the reference agent are generated
from OUR ``DiscreteNavEnv``'s candidate/feature tables (the reference's
``make_candidate`` needs a live MatterSim binary; candidate geometry parity
is separately golden-tested) — but the grid tensors come from the REFERENCE's
own ``EnvBatch.getGlobalMap`` running over the same synthetic depth/semantic
stores, and everything downstream of obs is reference code.  Both sides use
exact 30-degree-multiple headings, so MatterSim's discretization snapping is
the identity and the fake simulator only has to store what ``newEpisode``
passed (agent.py:249-254 always passes quantized angles).
"""

import math
import sys
from collections import defaultdict
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from ref_oracle import load_ref_module, nav_bert_config, require_reference  # noqa: E402
from test_ref_oracle_pretrain_data import (  # noqa: E402
    _build_scene, _plain_tables, _FakeDB, _FakeWorld, SCAN, D)

pytestmark = pytest.mark.slow

HID, HEADS, INTER = 768, 4, 512
NL, NX, NP = 1, 2, 1
ANGLE, VOCAB = 4, 128
BATCH = 2
MAX_STEPS = 6
ML_WEIGHT = 0.2


class _CmpArr(np.ndarray):
    """ndarray view whose ``== []`` is plain False: r2r/env.py:297 tests the
    per-env accumulator with ``self.global_semantic[i] == []``, relying on
    numpy<2's elementwise-False scalar; numpy 2 raises on the broadcast."""

    def __eq__(self, other):
        if isinstance(other, list) and not other:
            return False
        return np.ndarray.__eq__(self, other)

    __hash__ = None


class _FakeSim:
    """MatterSim.Simulator twin for the two calls made at oracle-test time:
    ``newEpisode`` + ``getState`` (env.py:272-274, agent.py:249-254)."""

    def __init__(self, vpinfo):
        self.vpinfo = vpinfo
        self.state = None

    def newEpisode(self, scans, vps, headings, elevations):
        h, e = float(headings[0]), float(elevations[0])
        p = self.vpinfo[f"{scans[0]}_{vps[0]}"]
        vi = ((int(round(e / (math.pi / 6))) + 1) * 12
              + int(round(h / (math.pi / 6))) % 12)
        self.state = SimpleNamespace(
            scanId=scans[0],
            location=SimpleNamespace(
                viewpointId=vps[0], x=np.float32(p["x"]),
                y=np.float32(p["y"]), z=np.float32(p["z"])),
            heading=h, elevation=e, viewIndex=vi, navigableLocations=[])

    def getState(self):
        return [self.state]


def _make_envbatch(env_mod, vpinfo, view_tbl, depth_tbl, sem_tbl, b):
    """The real EnvBatch (r2r/env.py:125-170 field layout) over fake sims +
    fake feature DBs; its getGlobalMap/getStates run unmodified."""
    eb = object.__new__(env_mod.EnvBatch)
    eb.image_w, eb.image_h, eb.vfov = 640, 480, 60
    eb.batch_size = b
    eb.sims = [_FakeSim(vpinfo) for _ in range(b)]
    eb.feat_db = _FakeDB(view_tbl)
    eb.DepthDB = _FakeDB(depth_tbl)
    eb.SemanticDB = _FakeDB(sem_tbl)
    eb.viewpoint_info = vpinfo
    eb.global_semantic = [[] for _ in range(b)]
    eb.global_position_x = [[] for _ in range(b)]
    eb.global_position_y = [[] for _ in range(b)]
    eb.global_mask = [[] for _ in range(b)]
    eb.max_x = [-10000 for _ in range(b)]
    eb.min_x = [10000 for _ in range(b)]
    eb.max_y = [-10000 for _ in range(b)]
    eb.min_y = [10000 for _ in range(b)]
    eb.heading = [0 for _ in range(b)]
    eb.global_map = [[] for _ in range(b)]
    eb.feature_states = [None for _ in range(b)]
    return eb


class _FakeNavBatch:
    """R2RNavBatch twin for exactly the fields GMapNavAgent.rollout reads
    (_get_obs, r2r/env.py:583-623; reverie/env.py:609-646 adds the object
    fields): obs from the same synthetic tables our DiscreteNavEnv serves,
    grid tensors from the REFERENCE EnvBatch."""

    def __init__(self, envbatch, items, our_env, obj_tbl=None):
        self.env = envbatch
        self.batch = items
        self.our_env = our_env
        self.obj_tbl = obj_tbl
        # all_point_angle_features is parity-pinned against the reference's
        # common.get_angle_fts by test_ref_oracle_pretrain_data
        self.angle_feature = our_env.angle_table
        self.shortest_distances = our_env.shortest_distances
        if obj_tbl is not None:
            # the reference side builds its own object features with ITS
            # functions: utils/data.angle_feature (reverie/data_utils.py
            # :44-47's relative recompute) + soon/data_utils convert_*
            self._ref_angle = load_ref_module(
                "map_nav_src", "utils.data").angle_feature
            self._sdu = load_ref_module("map_nav_src", "soon.data_utils")

    def reset(self):
        self.env.newEpisodes(
            [it["scan"] for it in self.batch],
            [it["path"][0] for it in self.batch],
            [float(it.get("heading", 0.0)) for it in self.batch])
        return self._get_obs()

    def _get_obs(self):
        states = self.env.getStates()
        obs = []
        for i, (feature, state, grid_fts, grid_map, gridmap_pos) in \
                enumerate(states):
            # numpy-2 shim (see _CmpArr): getStates just overwrote the
            # accumulator with a plain ndarray
            if isinstance(self.env.global_semantic[i], np.ndarray):
                self.env.global_semantic[i] = \
                    self.env.global_semantic[i].view(_CmpArr)
            item = self.batch[i]
            vp = state.location.viewpointId
            cand = self.our_env.candidates(
                state.scanId, vp, state.viewIndex, feature)
            full = np.concatenate(
                [feature, self.angle_feature[state.viewIndex]], -1)
            extra = {}
            if self.obj_tbl is not None:
                recs = self.obj_tbl[f"{state.scanId}_{vp}"]
                extra = {
                    "obj_img_fts": np.stack(
                        [r["feature"] for r in recs]).astype(np.float32),
                    # object angle fts are RELATIVE to the agent's current
                    # orientation in the fine-tune env
                    # (reverie/data_utils.py:44-47)
                    "obj_ang_fts": np.stack([
                        self._ref_angle(r["heading"] - state.heading,
                                        r["elevation"] - state.elevation,
                                        ANGLE)
                        for r in recs]).astype(np.float32),
                    "obj_box_fts": np.stack(
                        [r["box"] for r in recs]).astype(np.float32),
                    "obj_ids": [r["obj_id"] for r in recs],
                    # SOON directions in the reference's own converted
                    # units (soon/data_utils.py:117, env.py:279)
                    "obj_directions": [
                        [self._sdu.convert_heading(r["heading"]),
                         self._sdu.convert_elevation(r["elevation"])]
                        for r in recs],
                    "gt_end_vps": item.get("gt_end_vps", []),
                    "gt_obj_id": item.get("gt_obj_id"),
                }
            obs.append({
                **extra,
                "instr_id": item["instr_id"],
                "scan": state.scanId,
                "viewpoint": vp,
                "viewIndex": state.viewIndex,
                "position": (state.location.x, state.location.y,
                             state.location.z),
                "heading": np.float32(state.heading),
                "elevation": np.float32(state.elevation),
                "feature": full.astype(np.float32),
                "candidate": cand,
                "navigableLocations": state.navigableLocations,
                "instruction": item.get("instruction", ""),
                "instr_encoding": [np.int32(t)
                                   for t in item["instr_encoding"]],
                "gt_path": item["path"],
                "path_id": item.get("path_id", item["instr_id"]),
                "grid_fts": torch.tensor(grid_fts),
                "grid_map": torch.tensor(grid_map),
                "gridmap_pos_fts": torch.tensor(gridmap_pos),
            })
        return obs


def _ref_args():
    from ref_oracle import EasyDict

    return EasyDict(
        image_feat_size=D, angle_feat_size=ANGLE, fusion="dynamic",
        ignoreid=-100, act_visited_nodes=False, enc_full_graph=True,
        max_action_len=MAX_STEPS, feat_dropout=0.0, expl_max_ratio=0.75,
        detailed_output=True, dataset="r2r", loss_nav_3=False)


def _make_ref_agent(items, our_env, vpinfo, view_tbl, depth_tbl, sem_tbl,
                    ref_model, feedback, obj_tbl=None, flavor="r2r"):
    if obj_tbl is not None and flavor == "soon":
        am = load_ref_module("map_nav_src", "soon.agent_obj")
        env_mod = load_ref_module("map_nav_src", "soon.env")
        agent_cls = am.SoonGMapObjectNavAgent
    elif obj_tbl is not None:
        am = load_ref_module("map_nav_src", "reverie.agent_obj")
        env_mod = load_ref_module("map_nav_src", "reverie.env")
        agent_cls = am.GMapObjectNavAgent
    else:
        am = load_ref_module("map_nav_src", f"{flavor}.agent")
        env_mod = load_ref_module("map_nav_src", f"{flavor}.env")
        agent_cls = am.GMapNavAgent
    mm = load_ref_module("map_nav_src", "models.model")

    args = _ref_args()
    vb = mm.VLNBert.__new__(mm.VLNBert)
    torch.nn.Module.__init__(vb)
    vb.args = args
    vb.vln_bert = ref_model
    vb.drop_env = torch.nn.Dropout(0.0)

    agent = agent_cls.__new__(agent_cls)
    agent.args = args
    agent.env = _FakeNavBatch(
        _make_envbatch(env_mod, vpinfo, view_tbl, depth_tbl, sem_tbl,
                       len(items)),
        items, our_env, obj_tbl=obj_tbl)
    agent.vln_bert = vb
    agent.criterion = torch.nn.CrossEntropyLoss(
        ignore_index=args.ignoreid, reduction="sum")
    agent.logs = defaultdict(list)
    agent.loss = 0.0
    agent.feedback = feedback
    agent.scanvp_cands = {}
    return agent


def _our_cfg(obj_feat_size=0):
    import dataclasses

    from gridmm_tpu.config import GridMMConfig, ModelConfig

    base = GridMMConfig()
    model = ModelConfig(
        vocab_size=VOCAB, hidden_size=HID, num_attention_heads=HEADS,
        intermediate_size=INTER, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, feat_dropout=0.0,
        max_position_embeddings=32, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP, image_feat_size=D, angle_feat_size=ANGLE,
        obj_feat_size=obj_feat_size, graph_sprels=False)
    return dataclasses.replace(
        base, model=model,
        shapes=dataclasses.replace(
            base.shapes, max_txt_len=16, max_gmap_len=16,
            max_vp_len=44 if obj_feat_size else 40, max_obj_len=4,
            max_points=MAX_STEPS * 588),
        train=dataclasses.replace(
            base.train, batch_size=BATCH, max_action_len=MAX_STEPS,
            ml_weight=ML_WEIGHT, loss_head="fused", loss_norm="batch"),
    )


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl = _build_scene(rng, n=8)
    dists, paths = _plain_tables(g, names)
    # two fixed episodes with 3-4 node GT paths, headings at exact 30-degree
    # multiples (see module docstring)
    items = []
    want = 0
    for a in names:
        for b in names:
            p = paths[a].get(b)
            if p and len(p) in (3, 4):
                items.append({
                    "instr_id": f"ep{want}", "path_id": f"ep{want}",
                    "scan": SCAN, "path": list(p), "heading": 0.0,
                    "instruction": "",
                    "instr_encoding": list(
                        np.random.default_rng(40 + want).integers(
                            1, VOCAB, size=9 + want)),
                })
                want += 1
                if want == BATCH:
                    break
        if want == BATCH:
            break
    assert len(items) == BATCH
    return names, g, vpinfo, view_tbl, depth_tbl, sem_tbl, items


@pytest.fixture(scope="module")
def ref_model():
    require_reference()
    vm = load_ref_module("map_nav_src", "models.vilmodel")
    torch.manual_seed(0)
    return vm.GlocalTextPathNavCMT(nav_bert_config(
        num_l_layers=NL, num_x_layers=NX, num_pano_layers=NP, heads=HEADS,
        intermediate=INTER, image_feat_size=D, angle_feat_size=ANGLE,
        vocab=VOCAB)).eval()


@pytest.fixture(scope="module")
def ours(scene, ref_model):
    """Our navigator + env + agent with the reference weights imported."""
    from gridmm_tpu.env.discrete import DiscreteNavEnv
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.train.agent import NavAgent
    from gridmm_tpu.utils import checkpoint as CK

    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl, items = scene
    cfg = _our_cfg()
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    loaded, report = CK.import_torch_navigator(
        ref_model.state_dict(), params, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP)
    assert report["unused_torch_keys"] == []
    assert report["unfilled_flax_leaves"] == []

    world = _FakeWorld(vpinfo, view_tbl, depth_tbl, sem_tbl)
    env = DiscreteNavEnv(world, {SCAN: g}, items, batch_size=BATCH, seed=0)
    env.data = list(items)   # undo the constructor shuffle: fixed order
    env.ix = 0
    return cfg, model, loaded, env, NavAgent(model, cfg, env, loaded)


def _flat(segs):
    return [vp for seg in segs for vp in seg]


@pytest.mark.parametrize("feedback,flavor", [
    ("teacher", "r2r"), ("argmax", "r2r"),
    # the rxr agent differs from r2r only in 500-token truncation (moot at
    # oracle dims) and a doubled CE over stop-target rows (rxr/agent.py
    # :367-372) — pin the loss formulation with the real rxr agent executing
    ("teacher", "rxr"),
])
def test_ref_oracle_rollout(scene, ref_model, ours, feedback, flavor,
                            monkeypatch):
    # the reference code `.cuda()`s every tensor; run it on CPU unchanged
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl, items = scene
    cfg, model, loaded, env, agent = ours
    if flavor == "rxr":
        import dataclasses

        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, stop_extra_ce=True))

    ref_agent = _make_ref_agent(items, env, vpinfo, view_tbl, depth_tbl,
                                sem_tbl, ref_model, feedback, flavor=flavor)
    train_ml = ML_WEIGHT if feedback == "teacher" else None
    with torch.no_grad():
        ref_traj = ref_agent.rollout(train_ml=train_ml, train_rl=False,
                                     reset=True)

    env.ix = 0  # same episodes again for our side
    our_traj, batch, _ = agent.rollout(
        feedback=feedback, rng=np.random.default_rng(0),
        record=(feedback == "teacher"))

    ref_by_id = {t["instr_id"]: t for t in ref_traj}
    for t in our_traj:
        r = ref_by_id[t["instr_id"]]
        assert _flat(t["trajectory"]) == _flat(r["path"]), t["instr_id"]
        assert len(t["trajectory"]) == len(r["path"]), t["instr_id"]
        # per-node stop probabilities (the post-stop jump's ranking signal):
        # reference exports node_stop_scores via details when detailed_output
        # (agent.py:429-434)
        ref_stops = {k: v["stop_prob"] for k, v in r["details"].items()}
        assert set(t["stop_scores"]) == set(ref_stops), t["instr_id"]
        for k, v in t["stop_scores"].items():
            # 6e-3 on probabilities: torch-vs-XLA f32 drift compounds over
            # multi-step gmap-embed accumulation at unit-scale features
            # (measured 2.6e-3 max on the argmax path); the sharp asserts
            # are the exact trajectories above and the teacher-mode IL loss
            assert abs(v - ref_stops[k]) < 6e-3, (t["instr_id"], k)

    if feedback == "teacher":
        from gridmm_tpu.train.step import trajectory_loss

        our_loss = float(trajectory_loss(model, cfg, loaded, batch,
                                         ml_weight=ML_WEIGHT))
        ref_loss = float(ref_agent.loss)
        assert ref_loss > 0.0
        assert abs(our_loss - ref_loss) < 5e-3 * max(1.0, abs(ref_loss)), (
            our_loss, ref_loss)


# ===================== REVERIE object-grounding variant =====================
# Same harness against reverie/agent_obj.py's GMapObjectNavAgent: object
# tokens ride the panorama, the OG teacher is gated on gt_end_vps (:245-262),
# the summed loss adds og_loss (:410,489-493), and the final pred_objid is
# the og recorded at the node that wins the stop-score ranking (:458-469).
# Object features are image_feat_size-wide like the released REVERIE stores
# (our agent packs them into the single panorama token stream).

def _add_objects(names):
    rng = np.random.default_rng(23)
    obj_tbl = {}
    for i, v in enumerate(names):
        recs = []
        for j in range(1 + int(rng.integers(0, 3))):
            # deliberate cross-viewpoint id sharing: the gt object is visible
            # at non-end nodes too, exercising the gt_end_vps teacher gate
            oid = f"o{(i * 2 + j * 5) % 9}"
            recs.append({
                "obj_id": oid,
                "feature": (rng.standard_normal(D) * 0.4).astype(np.float32),
                "ang": (rng.standard_normal(ANGLE) * 0.3).astype(np.float32),
                "box": rng.random(3).astype(np.float32),
                "heading": float(rng.uniform(-math.pi, math.pi)),
                "elevation": float(rng.uniform(-0.5, 0.5)),
            })
        obj_tbl[f"{SCAN}_{v}"] = recs
    return obj_tbl


class _ObjWorld(_FakeWorld):
    def __init__(self, vpinfo, view_tbl, depth_tbl, sem_tbl, obj_tbl):
        super().__init__(vpinfo, view_tbl, depth_tbl, sem_tbl)
        self.obj_tbl = obj_tbl

    def objects(self, scan, vp):
        return [{"obj_id": r["obj_id"], "feature": r["feature"],
                 "loc_fts": np.concatenate([r["ang"], r["box"]]),
                 "heading": r["heading"], "elevation": r["elevation"]}
                for r in self.obj_tbl[f"{scan}_{vp}"]]


@pytest.fixture(scope="module")
def scene_obj(scene):
    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl, items = scene
    obj_tbl = _add_objects(names)
    items = []
    for k, base in enumerate(scene[6]):
        it = dict(base)
        goal = it["path"][-1]
        it["gt_obj_id"] = obj_tbl[f"{SCAN}_{goal}"][0]["obj_id"]
        it["gt_end_vps"] = [goal]
        items.append(it)
    return names, g, vpinfo, view_tbl, depth_tbl, sem_tbl, items, obj_tbl


@pytest.fixture(scope="module")
def ref_model_obj():
    require_reference()
    vm = load_ref_module("map_nav_src", "models.vilmodel")
    torch.manual_seed(5)
    return vm.GlocalTextPathNavCMT(nav_bert_config(
        num_l_layers=NL, num_x_layers=NX, num_pano_layers=NP, heads=HEADS,
        intermediate=INTER, image_feat_size=D, angle_feat_size=ANGLE,
        vocab=VOCAB, obj_feat_size=D)).eval()


@pytest.fixture(scope="module")
def ours_obj(scene_obj, ref_model_obj):
    from gridmm_tpu.env.discrete import DiscreteNavEnv
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.train.agent import NavAgent
    from gridmm_tpu.utils import checkpoint as CK

    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl, items, obj_tbl = scene_obj
    cfg = _our_cfg(obj_feat_size=D)
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    loaded, report = CK.import_torch_navigator(
        ref_model_obj.state_dict(), params, num_l_layers=NL, num_x_layers=NX,
        num_pano_layers=NP, has_obj=True)
    assert report["unused_torch_keys"] == []
    assert report["unfilled_flax_leaves"] == []

    world = _ObjWorld(vpinfo, view_tbl, depth_tbl, sem_tbl, obj_tbl)
    env = DiscreteNavEnv(world, {SCAN: g}, items, batch_size=BATCH, seed=0)
    env.data = list(items)
    env.ix = 0
    return cfg, model, loaded, env, NavAgent(model, cfg, env, loaded)


@pytest.mark.parametrize("feedback", ["teacher", "argmax"])
def test_ref_oracle_rollout_reverie(scene_obj, ref_model_obj, ours_obj,
                                    feedback, monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl, items, obj_tbl = scene_obj
    cfg, model, loaded, env, agent = ours_obj

    ref_agent = _make_ref_agent(items, env, vpinfo, view_tbl, depth_tbl,
                                sem_tbl, ref_model_obj, feedback,
                                obj_tbl=obj_tbl)
    train_ml = ML_WEIGHT if feedback == "teacher" else None
    with torch.no_grad():
        ref_traj = ref_agent.rollout(train_ml=train_ml, train_rl=False,
                                     reset=True)

    env.ix = 0
    our_traj, batch, _ = agent.rollout(
        feedback=feedback, rng=np.random.default_rng(0),
        record=(feedback == "teacher"))

    ref_by_id = {t["instr_id"]: t for t in ref_traj}
    for t in our_traj:
        r = ref_by_id[t["instr_id"]]
        assert _flat(t["trajectory"]) == _flat(r["path"]), t["instr_id"]
        # the final object prediction comes from the best stop-scored node
        assert str(t.get("pred_obj_id")) == str(r.get("pred_objid")), \
            t["instr_id"]
        ref_stops = {k: v["stop_prob"] for k, v in r["details"].items()}
        assert set(t["stop_scores"]) == set(ref_stops), t["instr_id"]
        for k, v in t["stop_scores"].items():
            assert abs(v - ref_stops[k]) < 6e-3, (t["instr_id"], k)

    if feedback == "teacher":
        from gridmm_tpu.train.step import trajectory_loss

        # ml_loss + og_loss, both scaled train_ml/batch (agent_obj.py:489-493)
        our_loss = float(trajectory_loss(model, cfg, loaded, batch,
                                         ml_weight=ML_WEIGHT))
        ref_loss = float(ref_agent.loss)
        assert ref_loss > 0.0
        assert abs(our_loss - ref_loss) < 5e-3 * max(1.0, abs(ref_loss)), (
            our_loss, ref_loss)


# ========================== SOON direction variant ==========================
# soon/agent_obj.py's SoonGMapObjectNavAgent subclasses the REVERIE agent and
# differs only in the recorded prediction: pred_obj_direction =
# obs['obj_directions'][argmax] at the best stop-scored node (:126-131,
# :200-209), exported as obj_heading/obj_elevation in converted [0,1) units
# (soon/data_utils.py:21-25, env.py:279).  Same model, same weights, same
# losses — so reuse the REVERIE fixtures and pin the direction contract.

@pytest.mark.parametrize("feedback", ["teacher", "argmax"])
def test_ref_oracle_rollout_soon(scene_obj, ref_model_obj, ours_obj,
                                 feedback, monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl, items, obj_tbl = scene_obj
    cfg, model, loaded, env, agent = ours_obj

    ref_agent = _make_ref_agent(items, env, vpinfo, view_tbl, depth_tbl,
                                sem_tbl, ref_model_obj, feedback,
                                obj_tbl=obj_tbl, flavor="soon")
    train_ml = ML_WEIGHT if feedback == "teacher" else None
    with torch.no_grad():
        ref_traj = ref_agent.rollout(train_ml=train_ml, train_rl=False,
                                     reset=True)

    env.ix = 0
    our_traj, batch, _ = agent.rollout(
        feedback=feedback, rng=np.random.default_rng(0),
        record=(feedback == "teacher"))

    ref_by_id = {t["instr_id"]: t for t in ref_traj}
    for t in our_traj:
        r = ref_by_id[t["instr_id"]]
        assert _flat(t["trajectory"]) == _flat(r["path"]), t["instr_id"]
        # the SOON det metric scores this direction against the GT bbox
        # polygon — units must be the reference's converted [0,1)
        d = r["pred_obj_direction"]
        assert d is not None, t["instr_id"]
        assert abs(t["pred_obj_heading"] - float(d[0])) < 1e-6, t["instr_id"]
        assert abs(t["pred_obj_elevation"] - float(d[1])) < 1e-6, \
            t["instr_id"]
        for v in (t["pred_obj_heading"], t["pred_obj_elevation"]):
            assert 0.0 <= v < 1.0

    if feedback == "teacher":
        from gridmm_tpu.train.step import trajectory_loss

        our_loss = float(trajectory_loss(model, cfg, loaded, batch,
                                         ml_weight=ML_WEIGHT))
        ref_loss = float(ref_agent.loss)
        assert ref_loss > 0.0
        assert abs(our_loss - ref_loss) < 5e-3 * max(1.0, abs(ref_loss)), (
            our_loss, ref_loss)
