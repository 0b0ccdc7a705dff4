"""Executed-reference oracle for the PRETRAIN DATA layer (get_input).

The real R2RTextPathData / ReverieTextPathData (pretrain_src/data/dataset.py)
run end-to-end over a synthetic scan (depth store, CLIP-p32 semantics, view
features, connectivity) and our data/pretrain_data.TextPathDataset must
reproduce, for every end-viewpoint choice:

  * panorama tokens: features, ABSOLUTE angle fts (all_point_rel_angles[12],
    dataset.py:519-524/810-815), nav types, candidate ordering
  * the quantized 30-degree heading chain feeding the grid build (:496-499)
  * gmap arrays: step ids, visited masks, FULL-graph positional features at
    the quantized (heading, elevation) of the final edge (:313-323, :598-620)
  * vp positional features (:622-632)
  * SAP act labels, both flavors (:664-681 r2r, :195-219 reverie)
  * the grid point cloud, cell assignment, and grid SAP target (:351-473)

Layout conventions that differ by design (documented in PARITY.md): our gmap
uses STABLE discovery slots vs the reference's [stop]+visited+unvisited
repacking — compared through the vp->slot map; our candidate lists are sorted
by viewpoint id, so the synthetic scanvp_cands dicts are built in sorted
order (the reference preserves its json insertion order).
"""

import random
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

torch = pytest.importorskip("torch")

from ref_oracle import load_ref_module, require_reference  # noqa: E402

pytestmark = pytest.mark.slow

SCAN = "scanX"
D = 768  # the reference hardcodes 768-wide grid buffers (dataset.py:388,559)


class _FakeDB:
    def __init__(self, table):
        self.table = table

    def get_image_feature(self, scan, vp):
        return self.table[f"{scan}_{vp}"]


class _FakeWorld:
    """Our world-provider twin of the fake reference DBs."""

    def __init__(self, vpinfo, view_tbl, depth_tbl, sem_tbl):
        self.vpinfo = vpinfo
        self.view_tbl = view_tbl
        self.depth_tbl = depth_tbl
        self.sem_tbl = sem_tbl

    def position(self, scan, vp):
        p = self.vpinfo[f"{scan}_{vp}"]
        return (p["x"], p["y"], p["z"])

    def view_features(self, scan, vp):
        return self.view_tbl[f"{scan}_{vp}"]

    def depth_patches(self, scan, vp):
        from gridmm_tpu.env.world import _depth_to_patches

        return _depth_to_patches(self.depth_tbl[f"{scan}_{vp}"])

    def grid_features(self, scan, vp):
        return self.sem_tbl[f"{scan}_{vp}"][:, 1:].reshape(-1, D)


class _FixedRng:
    """random.Random stand-in that returns preset draws (forces the sampled
    end viewpoint so the reference can be replayed with an explicit
    end_vp)."""

    def __init__(self, randrange=0, choice_value=None):
        self._randrange = randrange
        self._choice = choice_value

    def randrange(self, *a):
        return self._randrange

    def choice(self, seq):
        return self._choice if self._choice is not None else seq[0]

    def random(self):
        return 0.99


def _build_scene(rng, n=8):
    """Synthetic connected scan: 3D positions, edges, per-vp stores."""
    from gridmm_tpu.env.nav_graph import NavGraph

    names = [f"vp{i:02d}" for i in range(n)]
    pos = rng.random((n, 3)) * np.asarray([18.0, 18.0, 2.0])
    g = NavGraph()
    for i, v in enumerate(names):
        g.add_node(v, pos[i])
    # chain + random chords for branching frontiers
    for i in range(n - 1):
        g.add_edge(names[i], names[i + 1])
    for _ in range(n):
        i, j = rng.integers(0, n, 2)
        if i != j:
            g.add_edge(names[i], names[j])

    vpinfo, view_tbl, depth_tbl, sem_tbl = {}, {}, {}, {}
    for i, v in enumerate(names):
        key = f"{SCAN}_{v}"
        vpinfo[key] = {"x": float(pos[i, 0]), "y": float(pos[i, 1]),
                       "z": float(pos[i, 2])}
        view_tbl[key] = rng.standard_normal((36, D)).astype(np.float32)
        dep = rng.integers(0, 16000, size=(36, 128, 128)).astype(np.uint16)
        dep[rng.random((36, 128, 128)) < 0.1] = 0
        depth_tbl[key] = dep
        sem_tbl[key] = rng.standard_normal((12, 50, D)).astype(np.float32)
    return names, g, vpinfo, view_tbl, depth_tbl, sem_tbl


def _scanvp_cands(g, names):
    """scanvp_candview_relangles.json twin: sorted insertion order to match
    our sorted-candidate convention; angles reconstruct to the exact
    absolute (heading, elevation) like the released file."""
    from gridmm_tpu.env.discrete import (nearest_view_index,
                                         view_index_heading,
                                         view_index_elevation)
    from gridmm_tpu.env.graph import rel_pos_features

    out = {}
    for v in names:
        entry = {}
        for c in sorted(g.neighbors(v)):
            h, e, dist = rel_pos_features(g.positions[v], g.positions[c])
            vi = nearest_view_index(h, e)
            entry[c] = [int(vi), float(dist),
                        float(h - view_index_heading(vi)),
                        float(e - view_index_elevation(vi))]
        out[f"{SCAN}_{v}"] = entry
    return out


def _plain_tables(g, names):
    """Full-graph all-pairs tables as plain dict-of-dicts for the reference."""
    dtab, ptab = g.all_pairs_tables()
    dists = {a: {b: dtab[a][b] for b in names if b in dtab[a]} for a in names}
    paths = {a: {b: list(ptab[a][b]) for b in names if b in ptab[a]}
             for a in names}
    return dists, paths


def _make_ref(ds_mod, cls_name, item, g, names, vpinfo, view_tbl, depth_tbl,
              sem_tbl, obj=False):
    cls = getattr(ds_mod, cls_name)
    ref = cls.__new__(cls)
    common = load_ref_module("pretrain_src", "data.common")
    ref.image_feat_size = D
    ref.image_prob_size = 0
    ref.angle_feat_size = 4
    ref.obj_feat_size = 8 if obj else 0
    ref.obj_prob_size = 0
    ref.obj_image_h, ref.obj_image_w = 480, 640
    ref.obj_image_size = 480 * 640
    ref.max_txt_len = 60
    ref.max_objects = 20
    ref.act_visited_node = False
    ref.in_memory = False
    ref.is_train = False
    ref.data = [item]
    ref.scanvp_cands = _scanvp_cands(g, names)
    ref.graphs = {SCAN: SimpleNamespace(
        nodes={v: {"position": np.asarray(g.positions[v])} for v in names})}
    dists, paths = _plain_tables(g, names)
    ref.shortest_distances = {SCAN: dists}
    ref.shortest_paths = {SCAN: paths}
    ref.all_point_rel_angles = [
        common.get_view_rel_angles(baseViewId=i) for i in range(36)]
    ref.all_point_angle_fts = [
        common.get_angle_fts(x[:, 0], x[:, 1], 4)
        for x in ref.all_point_rel_angles]
    ref.DepthDB = _FakeDB(depth_tbl)
    ref.SemanticDB = _FakeDB(sem_tbl)
    ref.viewpoint_info = vpinfo
    ref.global_semantic = []
    ref.global_position_x, ref.global_position_y = [], []
    ref.global_mask = []
    ref.max_x = ref.max_y = -10000
    ref.min_x = ref.min_y = 10000
    ref.heading = 0
    ref.global_map = None
    ref.cur_vp = None
    ref.gt_path = None
    if obj:
        ref.get_scanvp_feature = lambda scan, vp: (
            view_tbl[f"{scan}_{vp}"],
            np.zeros((0, ref.obj_feat_size), np.float32), {})
    else:
        ref.get_scanvp_feature = lambda scan, vp: view_tbl[f"{scan}_{vp}"]

    # numpy 2.x raises on `ndarray == []` (dataset.py:388 relies on the old
    # elementwise-False behavior); reset the accumulator to a False-comparing
    # sentinel before every non-first step
    class _NotEmpty:
        def __eq__(self, other):
            return False

    orig = ref.getGlobalMap

    def wrapped(scan, vp):
        if not isinstance(ref.global_semantic, (list, _NotEmpty)):
            ref.global_semantic = _NotEmpty()
        return orig(scan, vp)

    ref.getGlobalMap = wrapped
    return ref


def _our_dataset(item, g, world, flavor):
    import dataclasses

    from gridmm_tpu.config import GridMMConfig
    from gridmm_tpu.data.pretrain_data import TextPathDataset

    base = GridMMConfig()
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model, image_feat_size=D,
                                  angle_feat_size=4),
        shapes=dataclasses.replace(base.shapes, max_txt_len=60,
                                   max_gmap_len=32, max_vp_len=40,
                                   max_points=588 * 10),
    )
    return TextPathDataset([item], world, {SCAN: g}, cfg, flavor=flavor)


def _slot_map(ds, walked):
    """Reproduce get_input's stable-slot discovery order: candidates of each
    step (sorted) are discovered before the step's own node."""
    g = ds.graphs[SCAN]
    slot_of = {}

    def slot(vp):
        if vp not in slot_of:
            slot_of[vp] = 1 + len(slot_of)
        return slot_of[vp]

    for vp in walked:
        for cvp in sorted(g.neighbors(vp)):
            slot(cvp)
        slot(vp)
    return slot_of


def _compare(outs, inp, ds, walked, ref):
    """Assert our get_input dict reproduces the reference outs."""
    af = 4
    s_real = int(inp["traj_step_mask"].sum())
    assert s_real == len(outs["traj_view_img_fts"]) == len(walked)

    # --- per-step panorama tokens ---
    for t in range(s_real):
        rv = np.asarray(outs["traj_view_img_fts"][t])
        rl = np.asarray(outs["traj_loc_fts"][t])
        rn = np.asarray(outs["traj_nav_types"][t])
        ntok = rv.shape[0]
        assert int(inp["traj_token_mask"][t].sum()) == ntok, t
        np.testing.assert_array_equal(
            inp["traj_view_fts"][t, :ntok], rv, err_msg=f"view fts t={t}")
        np.testing.assert_allclose(
            inp["traj_loc_fts"][t, :ntok], rl, atol=2e-6,
            err_msg=f"loc fts t={t}")
        np.testing.assert_array_equal(
            inp["traj_nav_types"][t, :ntok], rn, err_msg=f"nav types t={t}")

    # --- gmap through the vp->slot map ---
    slot_of = _slot_map(ds, walked)
    gmap_vpids = outs["gmap_vpids"]
    assert int(inp["gmap_mask"].sum()) == len(gmap_vpids)
    for j, vp in enumerate(gmap_vpids):
        if vp is None:
            row = 0
        else:
            row = slot_of[vp]
            assert inp["gmap_mask"][row], vp
            assert int(inp["gmap_step_ids"][row]) == int(
                outs["gmap_step_ids"][j]), vp
            assert bool(inp["gmap_visited_mask"][row]) == bool(
                outs["gmap_visited_masks"][j]), vp
        np.testing.assert_allclose(
            inp["gmap_pos_fts"][row], np.asarray(outs["gmap_pos_fts"][j]),
            atol=2e-6, err_msg=f"gmap pos fts {vp}")

    # --- vp positional features ---
    r_vp = np.asarray(outs["vp_pos_fts"])
    n_rows = min(r_vp.shape[0], inp["vp_pos_fts"].shape[0])
    np.testing.assert_allclose(inp["vp_pos_fts"][:n_rows], r_vp[:n_rows],
                               atol=2e-6, err_msg="vp_pos_fts")

    # --- SAP act labels ---
    r_g = int(outs["global_act_labels"])
    r_l = int(outs["local_act_labels"])
    want_g = r_g if r_g <= 0 else slot_of[gmap_vpids[r_g]]
    assert int(inp["global_act"]) == want_g, (r_g, gmap_vpids)
    assert int(inp["local_act"]) == r_l

    # --- grid build + grid SAP target ---
    r_grid_fts = np.asarray(outs["grid_fts"])
    r_grid_map = np.asarray(outs["grid_map"]).astype(np.int32)
    npts = r_grid_map.shape[0]
    np.testing.assert_array_equal(inp["grid_fts"][:npts], r_grid_fts)
    np.testing.assert_array_equal(inp["grid_cells"][:npts], r_grid_map)
    assert (inp["grid_cells"][npts:] == -1).all()
    np.testing.assert_allclose(inp["gridmap_pos_fts"],
                               np.asarray(outs["gridmap_pos_fts"]),
                               atol=2e-5, err_msg="gridmap_pos_fts")
    assert int(inp["grid_target"]) == int(outs["target_patch_id"])


def test_ref_oracle_pretrain_data_r2r():
    require_reference()
    ds_mod = load_ref_module("pretrain_src", "data.dataset")
    rng = np.random.default_rng(31)
    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl = _build_scene(rng)
    # a GT path with branching frontiers along the chain
    path = [names[0], names[1], names[2], names[3], names[4]]
    item = dict(instr_id="r2r_0", scan=SCAN, path=path, heading=0.7,
                instr_encoding=list(range(1, 12)))

    ref = _make_ref(ds_mod, "R2RTextPathData", item, g, names, vpinfo,
                    view_tbl, depth_tbl, sem_tbl)
    world = _FakeWorld(vpinfo, view_tbl, depth_tbl, sem_tbl)
    ds = _our_dataset(item, g, world, "r2r")

    for end_idx in range(len(path)):
        end_vp = path[end_idx]
        outs = ref.get_input(0, "pos" if end_idx == len(path) - 1
                             else "neg_in_gt_path",
                             return_act_label=True, end_vp=end_vp)
        ds.rng = _FixedRng(randrange=end_idx)
        inp = ds.get_input(0, "pos" if end_idx == len(path) - 1
                           else "neg_in_gt_path")
        walked = path[: end_idx + 1]
        _compare(outs, inp, ds, walked, ref)


def test_ref_oracle_pretrain_data_reverie():
    require_reference()
    ds_mod = load_ref_module("pretrain_src", "data.dataset")
    rng = np.random.default_rng(47)
    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl = _build_scene(rng)
    path = [names[0], names[2], names[4], names[5]]
    # multiple positive endpoints, one off the GT path
    pos_vps = [names[5], names[6]]
    item = dict(instr_id=f"{SCAN}_objX_3", scan=SCAN, path=path, heading=0.3,
                pos_vps=pos_vps, instr_encoding=list(range(1, 10)))

    ref = _make_ref(ds_mod, "ReverieTextPathData", item, g, names, vpinfo,
                    view_tbl, depth_tbl, sem_tbl, obj=True)
    world = _FakeWorld(vpinfo, view_tbl, depth_tbl, sem_tbl)
    ds = _our_dataset(item, g, world, "reverie")
    dists, paths = _plain_tables(g, names)

    # end choices covering: a positive non-goal end, a mid-path neg, and an
    # off-path neg (walked = shortest path to it, dataset.py:247)
    cases = [("pos", names[6]), ("neg_in_gt_path", names[2]),
             ("neg_others", names[7]), ("pos", names[5])]
    for end_type, end_vp in cases:
        outs = ref.get_input(0, end_type, return_act_label=True,
                             end_vp=end_vp)
        ds.rng = _FixedRng(choice_value=end_vp)
        inp = ds.get_input(0, end_type)
        walked = paths[path[0]][end_vp]
        _compare(outs, inp, ds, walked, ref)


def test_ref_oracle_pretrain_data_truncation():
    """Long trajectories: the reference walks path[:20] + [end_vp]
    (dataset.py:251-253) — a teleport whose pano is still encoded and whose
    grid target indexes the UNTRUNCATED path."""
    require_reference()
    ds_mod = load_ref_module("pretrain_src", "data.dataset")
    rng = np.random.default_rng(53)
    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl = _build_scene(rng, n=26)
    # force a 26-node chain walk: use only chain edges for the path
    path = names[:26]
    item = dict(instr_id="r2r_1", scan=SCAN, path=path, heading=0.0,
                instr_encoding=list(range(1, 8)))

    ref = _make_ref(ds_mod, "R2RTextPathData", item, g, names, vpinfo,
                    view_tbl, depth_tbl, sem_tbl)
    world = _FakeWorld(vpinfo, view_tbl, depth_tbl, sem_tbl)
    import dataclasses

    ds = _our_dataset(item, g, world, "r2r")
    ds.cfg = dataclasses.replace(
        ds.cfg, shapes=dataclasses.replace(ds.cfg.shapes,
                                           max_points=588 * 21,
                                           max_gmap_len=64))

    end_idx = 23  # walked = path[:20] + [path[23]]
    outs = ref.get_input(0, "neg_in_gt_path", return_act_label=True,
                         end_vp=path[end_idx])
    ds.rng = _FixedRng(randrange=end_idx)
    inp = ds.get_input(0, "neg_in_gt_path")
    assert int(inp["traj_step_mask"].sum()) == 21
    walked = path[:20] + [path[end_idx]]
    _compare(outs, inp, ds, walked, ref)


def test_ref_oracle_pretrain_data_soon():
    """SOON flavor (SoonTextPathData, dataset.py:833-905): 'pos' pins
    end_vp to path[-1] even when pos_vps offers alternatives (:892-905);
    everything else shares the REVERIE machinery. Also pins get_obj_label's
    trust-the-annotation contract (:886-892): the precomputed index passes
    through verbatim below max_objects (no availability check — our
    pipeline adds a defensive bound, identical on clean data), -100 at or
    above."""
    require_reference()
    ds_mod = load_ref_module("pretrain_src", "data.dataset")
    rng = np.random.default_rng(59)
    names, g, vpinfo, view_tbl, depth_tbl, sem_tbl = _build_scene(rng)
    path = [names[0], names[2], names[4], names[5]]
    pos_vps = [names[5], names[6]]  # 'pos' must STILL walk to path[-1]
    item = dict(instr_id=f"{SCAN}_soon_0", scan=SCAN, path=path, heading=0.3,
                pos_vps=pos_vps, instr_encoding=list(range(1, 10)),
                obj_pseudo_label={"idx": 1})

    ref = _make_ref(ds_mod, "SoonTextPathData", item, g, names, vpinfo,
                    view_tbl, depth_tbl, sem_tbl, obj=True)
    ref.obj_image_h = ref.obj_image_w = 600   # SOON ctor overrides (:849-850)
    ref.obj_image_size = 600 * 600
    world = _FakeWorld(vpinfo, view_tbl, depth_tbl, sem_tbl)
    ds = _our_dataset(item, g, world, "soon")
    dists, paths = _plain_tables(g, names)

    # 'pos' with NO explicit end_vp: the SOON override must choose path[-1]
    outs = ref.get_input(0, "pos", return_act_label=True)
    ds.rng = _FixedRng(choice_value=names[6])  # would pick the wrong pos_vp
    inp = ds.get_input(0, "pos")
    # reverie/soon walk the SHORTEST path to end_vp (:247), which may cut
    # the annotated route; the SOON pin is about the ENDPOINT: path[-1],
    # never a pos_vps sample
    walked = paths[path[0]][path[-1]]
    assert walked[-1] == path[-1] != names[6]
    _compare(outs, inp, ds, walked, ref)

    for end_type, end_vp in (("neg_in_gt_path", names[2]),
                             ("neg_others", names[7])):
        outs = ref.get_input(0, end_type, return_act_label=True,
                             end_vp=end_vp)
        ds.rng = _FixedRng(choice_value=end_vp)
        inp = ds.get_input(0, end_type)
        _compare(outs, inp, ds, paths[path[0]][end_vp], ref)

    # get_obj_label trust contract (executed directly)
    assert ref.get_obj_label({"obj_pseudo_label": {"idx": 3}}, []) == 3
    assert ref.get_obj_label(
        {"obj_pseudo_label": {"idx": ref.max_objects}}, []) == -100


def test_ref_oracle_soon_scanvp_feature_aug_mix(tmp_path, monkeypatch):
    """SoonTextPathData.get_scanvp_feature executed against REAL hdf5 files
    (dataset.py:852-885): eval reads the base bank; train mixes per-view
    with the EnvEdit aug bank where random() > 0.5 — the exact contract our
    AugmentedViewWorld reproduces (env/world.py)."""
    require_reference()
    h5py = pytest.importorskip("h5py")
    ds_mod = load_ref_module("pretrain_src", "data.dataset")

    rng = np.random.default_rng(61)
    base = rng.standard_normal((36, D)).astype(np.float32)
    aug = rng.standard_normal((36, D)).astype(np.float32)
    key = f"{SCAN}_vp00"
    with h5py.File(tmp_path / "pth_vit_base_patch16_224_imagenet.hdf5",
                   "w") as f:
        f[key] = base
    with h5py.File(tmp_path / "aug_views.hdf5", "w") as f:
        f[key] = aug

    ref = ds_mod.SoonTextPathData.__new__(ds_mod.SoonTextPathData)
    ref.img_ft_file = str(tmp_path)
    ref.obj_ft_file = None
    ref.obj_feat_size = 0
    ref.obj_prob_size = 0
    ref.max_objects = 20
    ref.in_memory = False

    ref.is_train = False
    view, obj_fts, obj_attrs = ref.get_scanvp_feature(SCAN, "vp00")
    np.testing.assert_array_equal(view, base)
    assert obj_fts.shape == (0, 0) and obj_attrs == {}

    # train: monkeypatch random.random to a fixed pattern; views with
    # draw > 0.5 take the aug bank
    pattern = (np.arange(36) % 3 == 0).astype(np.float64) * 0.9 + 0.05
    draws = iter(pattern.tolist())
    monkeypatch.setattr(ds_mod.random, "random", lambda: next(draws))
    ref.is_train = True
    view_tr, _, _ = ref.get_scanvp_feature(SCAN, "vp00")
    want = base.copy()
    want[pattern > 0.5] = aug[pattern > 0.5]
    np.testing.assert_array_equal(view_tr, want)

    # our AugmentedViewWorld under the same draw pattern
    from gridmm_tpu.env.world import AugmentedViewWorld

    class _W:
        def view_features(self, scan, vp):
            return base

    class _Rng:
        def random(self, n):
            return pattern

    aw = AugmentedViewWorld(_W(), lambda scan, vp: aug, seed=0)
    aw._rng = _Rng()
    np.testing.assert_array_equal(aw.view_features(SCAN, "vp00"), want)
