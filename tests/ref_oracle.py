"""Load modules from /root/reference as *executable* parity oracles.

STUDY-ONLY discipline: the reference code is imported and executed at test
time, never vendored or copied. Tests built on this helper retire the
transcription-drift risk of replica-based parity tests (both sides of a
replica test were written by us; a mistaken reading of the reference would
be made twice and pass — the round-4 relevance-masking audit proved that
failure mode is real).

The three reference sub-codebases (`map_nav_src`, `pretrain_src`, `VLN_CE`)
each expect their own root on sys.path and use colliding top-level package
names (`utils`, `data`, `models`/`model`). `load_ref_module` therefore
isolates roots: when switching to a different root it stashes the previous
root's modules out of sys.modules and restores them on the next switch back.

Missing third-party deps are satisfied with pure-Python stubs (they are
unused at the call sites under test): easydict (6-line real implementation),
jsonlines / lmdb / boto3 / timm (empty attribute-absorbing stubs).
"""

from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

import pytest

REF = Path("/root/reference")


def require_reference():
    if not REF.exists():
        pytest.skip("/root/reference not available")


# --------------------------------------------------------------------- stubs
class EasyDict(dict):
    """Minimal easydict: attribute access over a dict (recursive)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in {**(d or {}), **kw}.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            v = EasyDict(v)
        super().__setitem__(k, v)
        super().__setattr__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _stub_module(name: str) -> types.ModuleType:
    stub = types.ModuleType(name)
    # a real spec so importlib.util.find_spec (e.g. transformers' dependency
    # probing) doesn't choke on the stub
    stub.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    def _getattr(attr, _n=name):
        if attr.startswith("__") and attr.endswith("__"):
            raise AttributeError(attr)  # keep inspect/hasattr probing happy
        raise RuntimeError(f"stubbed module {_n!r} was actually used ({attr})")

    stub.__getattr__ = _getattr
    return stub


def _install_stubs():
    # transformers probes importlib.util.find_spec("timm") at import; load it
    # before any stub shadows the name
    importlib.import_module("transformers")
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.__spec__ = importlib.machinery.ModuleSpec("easydict", loader=None)
        m.EasyDict = EasyDict
        sys.modules["easydict"] = m
    for name in ("jsonlines", "lmdb", "boto3", "MatterSim", "imutils",
                 "line_profiler"):
        if name not in sys.modules:
            try:
                importlib.import_module(name)
            except ImportError:
                sys.modules[name] = _stub_module(name)
    # timm: the CE vilmodel from-imports timm.data helpers at module scope
    # and calls timm.create_model in __init__ (tests monkeypatch that); the
    # data helpers bind as raise-on-call sentinels
    if "timm" not in sys.modules:
        try:
            importlib.import_module("timm")
        except ImportError:
            def _timm_sentinel(*a, **k):
                raise RuntimeError("stubbed timm was actually used")

            timm = _stub_module("timm")
            tdata = _stub_module("timm.data")
            tfactory = _stub_module("timm.data.transforms_factory")
            for mod in (tdata, tfactory):
                mod.__getattr__ = lambda attr: (
                    (_ for _ in ()).throw(AttributeError(attr))
                    if attr.startswith("__") else _timm_sentinel)
            timm.data = tdata
            timm.create_model = _timm_sentinel
            sys.modules["timm"] = timm
            sys.modules["timm.data"] = tdata
            sys.modules["timm.data.transforms_factory"] = tfactory
    # botocore.exceptions.ClientError is from-imported by the vendored
    # pytorch_transformer file_utils (only raised on S3 downloads)
    if "botocore" not in sys.modules:
        try:
            importlib.import_module("botocore")
        except ImportError:
            bc = _stub_module("botocore")
            be = _stub_module("botocore.exceptions")
            be.ClientError = type("ClientError", (Exception,), {})
            bc.exceptions = be
            sys.modules["botocore"] = bc
            sys.modules["botocore.exceptions"] = be
    # the pip pytorch_transformers package: TRM_net.py imports only
    # BertConfig from it (the model itself uses the VENDORED
    # .pytorch_transformer copy); transformers' BertConfig is
    # attribute-compatible
    if "pytorch_transformers" not in sys.modules:
        try:
            importlib.import_module("pytorch_transformers")
        except ImportError:
            from transformers import BertConfig

            pt = _stub_module("pytorch_transformers")
            pt.BertConfig = BertConfig
            sys.modules["pytorch_transformers"] = pt
    # shapely: soon/env.py uses only Point(x, y) and a quadrilateral
    # Polygon(...).contains(point) for the det-success test (:359-368); an
    # even-odd ray-cast over the ring is semantically equivalent for interior
    # points (shapely's contains excludes the boundary — tests stay off it)
    if "shapely" not in sys.modules:
        try:
            importlib.import_module("shapely")
        except ImportError:
            class _Point:
                def __init__(self, x, y):
                    self.x, self.y = float(x), float(y)

            class _Polygon:
                def __init__(self, ring):
                    self.ring = [(float(x), float(y)) for x, y in ring]

                def contains(self, p):
                    inside = False
                    n = len(self.ring)
                    for i in range(n):
                        x1, y1 = self.ring[i]
                        x2, y2 = self.ring[(i + 1) % n]
                        if (y1 > p.y) != (y2 > p.y):
                            xin = x1 + (p.y - y1) * (x2 - x1) / (y2 - y1)
                            if p.x < xin:
                                inside = not inside
                    return inside

            sh = _stub_module("shapely")
            sg = _stub_module("shapely.geometry")
            sp = _stub_module("shapely.geometry.polygon")
            sg.Point = _Point
            sg.Polygon = _Polygon
            sp.Polygon = _Polygon
            sh.geometry = sg
            sg.polygon = sp
            sys.modules["shapely"] = sh
            sys.modules["shapely.geometry"] = sg
            sys.modules["shapely.geometry.polygon"] = sp
    # torchvision is from-imported at dataset.py module scope but unused at
    # the call sites under test; names bind to a sentinel that raises on use
    if "torchvision" not in sys.modules:
        try:
            importlib.import_module("torchvision")
        except ImportError:
            def _sentinel(*a, **k):
                raise RuntimeError("stubbed torchvision was actually used")

            tv = _stub_module("torchvision")
            tf = _stub_module("torchvision.transforms")
            tf.__getattr__ = lambda attr: (
                (_ for _ in ()).throw(AttributeError(attr))
                if attr.startswith("__") else _sentinel)
            tv.transforms = tf
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tf


# ------------------------------------------------------- root-scoped imports
_active_root: str | None = None
_stash: dict = {}  # root -> {module_name: module}


def _ref_top_levels(root: Path):
    names = set()
    for p in root.iterdir():
        if p.is_dir() and (p / "__init__.py").exists():
            names.add(p.name)
        elif p.is_dir() and any(p.glob("*.py")):
            names.add(p.name)  # namespace-style package (reference has these)
        elif p.suffix == ".py":
            names.add(p.stem)
    return names


def load_ref_module(root_subdir: str, module_name: str):
    """Import `module_name` with `/root/reference/<root_subdir>` as the
    import root, isolating it from previously-loaded reference roots."""
    require_reference()
    _install_stubs()
    global _active_root
    root = REF / root_subdir
    key = str(root)
    if _active_root != key:
        # stash every module owned by the active root, restore this root's
        if _active_root is not None:
            prev_names = _ref_top_levels(Path(_active_root))
            stash = _stash.setdefault(_active_root, {})
            for name in list(sys.modules):
                top = name.split(".")[0]
                if top in prev_names:
                    mod = sys.modules.pop(name)
                    mf = getattr(mod, "__file__", "") or ""
                    if mf.startswith(_active_root):
                        stash[name] = mod
        sys.modules.update(_stash.pop(key, {}))
        if _active_root and _active_root in sys.path:
            sys.path.remove(_active_root)
        if key not in sys.path:
            sys.path.insert(0, key)
        _active_root = key
    return importlib.import_module(module_name)


def load_ref_package_dir(pkg_dir: str, pkg_name: str, module: str):
    """Load `<REF>/<pkg_dir>/<module>.py` as `<pkg_name>.<module>` WITHOUT
    executing parent package __init__ files (e.g. vlnce_baselines/__init__.py
    imports habitat trainers). Relative imports inside the package resolve
    against the directory."""
    require_reference()
    _install_stubs()
    full = f"{pkg_name}.{module}"
    if full in sys.modules:
        return sys.modules[full]
    pkg_path = REF / pkg_dir
    if pkg_name not in sys.modules:
        spec = importlib.machinery.ModuleSpec(pkg_name, loader=None,
                                              is_package=True)
        spec.submodule_search_locations = [str(pkg_path)]
        pkg = importlib.util.module_from_spec(spec)
        sys.modules[pkg_name] = pkg
    mspec = importlib.util.spec_from_file_location(
        full, pkg_path / f"{module}.py")
    mod = importlib.util.module_from_spec(mspec)
    sys.modules[full] = mod
    mspec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------------ shared configs
def nav_bert_config(num_l_layers=1, num_x_layers=2, num_pano_layers=1,
                    heads=4, intermediate=512, obj_feat_size=0,
                    image_feat_size=64, angle_feat_size=4, vocab=128,
                    graph_sprels=False, glocal_fuse=True):
    """PretrainedConfig for GlocalTextPathNavCMT at oracle-test scale:
    hidden stays 768 (the reference hardcodes 768-wide grid buffers and
    text_proj/grid_proj, vilmodel.py:789,702-703), depth/width cut
    elsewhere. Mirrors vlnbert_init.py:33-57."""
    from transformers import BertConfig

    cfg = BertConfig(
        vocab_size=vocab, hidden_size=768, num_hidden_layers=num_l_layers,
        num_attention_heads=heads, intermediate_size=intermediate,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, max_position_embeddings=32,
        type_vocab_size=2, layer_norm_eps=1e-12)
    cfg.max_action_steps = 100
    cfg.image_feat_size = image_feat_size
    cfg.angle_feat_size = angle_feat_size
    cfg.obj_feat_size = obj_feat_size
    cfg.obj_loc_size = 3
    cfg.num_l_layers = num_l_layers
    cfg.num_pano_layers = num_pano_layers
    cfg.num_x_layers = num_x_layers
    cfg.graph_sprels = graph_sprels
    cfg.glocal_fuse = glocal_fuse
    cfg.fix_lang_embedding = False
    cfg.fix_pano_embedding = False
    cfg.fix_local_branch = False
    cfg.update_lang_bert = True
    cfg.output_attentions = True
    cfg.pred_head_dropout_prob = 0.0
    cfg.use_lang2visn_attn = False
    return cfg


# ----------------------------------------------------- CE policy (GridMap)
def load_ce_policy():
    """Load Policy_ViewSelection_GridMap.py standalone (the CE GridMap net
    with the online getGlobalMap grid builder, :689-807). Its habitat/gym
    import surface is stubbed — none of it is touched by the geometry
    methods under test; the two real helper modules it uses
    (vlnce_baselines/models/utils.py, waypoint_prediction/utils.py) are
    loaded from the reference tree under their import names."""
    require_reference()
    _install_stubs()
    name = "ce_policy_gridmap"
    if name in sys.modules:
        return sys.modules[name]

    import torch

    def _sentinel(*a, **k):
        raise RuntimeError("stubbed habitat-stack symbol was actually used")

    def _cls_stub(names, base=object):
        mod_names = {}
        for n in names:
            mod_names[n] = type(n, (base,), {})
        return mod_names

    if "gym" not in sys.modules:
        gym = _stub_module("gym")
        gym.Space = type("Space", (), {})
        sys.modules["gym"] = gym
    if "cv2" not in sys.modules:
        try:
            importlib.import_module("cv2")
        except ImportError:
            sys.modules["cv2"] = _stub_module("cv2")
    if "habitat" not in sys.modules:
        hab = _stub_module("habitat")
        hab.Config = type("Config", (dict,), {})
        hab.logger = types.SimpleNamespace(info=lambda *a, **k: None,
                                           warning=lambda *a, **k: None)
        sys.modules["habitat"] = hab
    for mn, attrs in (
        ("habitat_baselines", {}),
        ("habitat_baselines.common", {}),
        ("habitat_baselines.common.baseline_registry",
         {"baseline_registry": types.SimpleNamespace(
             register_policy=lambda cls=None, **k: (
                 cls if cls is not None else (lambda c: c)),
             register_trainer=lambda cls=None, **k: (
                 cls if cls is not None else (lambda c: c)))}),
        ("habitat_baselines.rl", {}),
        ("habitat_baselines.rl.models", {}),
        ("habitat_baselines.rl.models.rnn_state_encoder",
         {"build_rnn_state_encoder": _sentinel}),
        ("habitat_baselines.rl.ppo", {}),
        ("habitat_baselines.rl.ppo.policy", {"Net": torch.nn.Module}),
        ("vlnce_baselines", {}),
        ("vlnce_baselines.models", {}),
        ("vlnce_baselines.models.gridmap", {}),
        ("vlnce_baselines.models.gridmap.vlnbert_init",
         {"get_vlnbert_models": _sentinel}),
        ("vlnce_baselines.common", {}),
        ("vlnce_baselines.common.aux_losses",
         {"AuxLosses": type("AuxLosses", (), {})}),
        ("vlnce_baselines.models.encoders", {}),
        ("vlnce_baselines.models.encoders.instruction_encoder",
         {"InstructionEncoder": type("InstructionEncoder",
                                     (torch.nn.Module,), {})}),
        ("vlnce_baselines.models.encoders.resnet_encoders",
         _cls_stub(["TorchVisionResNet50", "VlnResnetDepthEncoder"],
                   torch.nn.Module)),
        ("vlnce_baselines.models.policy",
         {"ILPolicy": type("ILPolicy", (torch.nn.Module,), {})}),
    ):
        if mn not in sys.modules:
            m = _stub_module(mn)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[mn] = m
    # the two REAL helper modules the geometry path uses. waypoint_prediction
    # gets a REAL package path (not a stub) so a later
    # load_ref_module("VLN_CE", "waypoint_prediction.TRM_net") still resolves
    if "waypoint_prediction" not in sys.modules:
        wspec = importlib.machinery.ModuleSpec(
            "waypoint_prediction", loader=None, is_package=True)
        wspec.submodule_search_locations = [
            str(REF / "VLN_CE/waypoint_prediction")]
        sys.modules["waypoint_prediction"] = importlib.util.module_from_spec(
            wspec)
    for full, rel in (
        ("vlnce_baselines.models.utils",
         "VLN_CE/vlnce_baselines/models/utils.py"),
        ("waypoint_prediction.utils", "VLN_CE/waypoint_prediction/utils.py"),
    ):
        if full in sys.modules:
            continue
        mspec = importlib.util.spec_from_file_location(full, REF / rel)
        mod = importlib.util.module_from_spec(mspec)
        sys.modules[full] = mod
        mspec.loader.exec_module(mod)

    mspec = importlib.util.spec_from_file_location(
        name,
        REF / "VLN_CE/vlnce_baselines/models/Policy_ViewSelection_GridMap.py")
    mod = importlib.util.module_from_spec(mspec)
    sys.modules[name] = mod
    mspec.loader.exec_module(mod)
    return mod
