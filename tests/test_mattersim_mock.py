"""mattersim_renderer driven against a mock MatterSim module.

The real simulator (C++/OpenGL) is absent from this image, so — like
tests/test_habitat_env_mock.py for the habitat binding — these tests
validate the renderer's side of the contract with a recording fake:
the sweep's episode/action sequencing, the horizon slice (views 12..24
of 36), the BGR->RGB flip, and the depth channel extraction
(get_map_feature.py:94-127, get_depth.py:42-88 semantics).
"""

import math
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class _FakeSim:
    """Records config + actions; frames encode (view index, channel)."""

    def __init__(self):
        self.config = {}
        self.actions = []
        self.episodes = []
        self.ix = -1

    # configuration surface used by mattersim_renderer
    def setDatasetPath(self, p):
        self.config["dataset"] = p

    def setNavGraphPath(self, p):
        self.config["navgraph"] = p

    def setRenderingEnabled(self, v):
        self.config["render"] = v

    def setDepthEnabled(self, v):
        self.config["depth"] = v

    def setDiscretizedViewingAngles(self, v):
        self.config["discrete"] = v

    def setCameraResolution(self, w, h):
        self.config["resolution"] = (w, h)

    def setCameraVFOV(self, v):
        self.config["vfov"] = v

    def setBatchSize(self, b):
        self.config["batch"] = b

    def initialize(self):
        self.config["initialized"] = True

    def newEpisode(self, scans, vps, headings, elevations):
        self.ix = 0
        self.episodes.append((scans[0], vps[0], headings[0], elevations[0]))

    def makeAction(self, idx, heading, elevation):
        self.ix += 1
        self.actions.append((idx[0], heading[0], elevation[0]))

    def getState(self):
        ix = self.ix
        state = types.SimpleNamespace()
        # rgb[..., c] = 3*ix + c: the BGR->RGB flip is then observable
        state.rgb = np.stack(
            [np.full((4, 4), 3 * ix + c, np.uint8) for c in range(3)],
            axis=-1)
        state.depth = np.full((4, 4, 1), 100 * ix, np.float32)
        return [state]


def _with_fake_mattersim(fn):
    fake_module = types.SimpleNamespace(Simulator=_FakeSim)
    prior = sys.modules.get("MatterSim")
    sys.modules["MatterSim"] = fake_module
    try:
        return fn()
    finally:
        if prior is None:
            del sys.modules["MatterSim"]
        else:
            sys.modules["MatterSim"] = prior


def test_mattersim_renderer_sweep_contract():
    from gridmm_tpu.data.preprocess import mattersim_renderer

    def run():
        recs = list(mattersim_renderer(
            [("scanA", "vp1"), ("scanA", "vp2")], "/conn", "/scans",
            resolution=4))
        return recs

    records = _with_fake_mattersim(run)
    assert [(r[0], r[1]) for r in records] == [("scanA", "vp1"),
                                               ("scanA", "vp2")]
    rgb, depth = records[0][2], records[0][3]
    # horizon slice: 12 views, kept from sweep indices 12..23
    assert rgb.shape == (12, 4, 4, 3) and rgb.dtype == np.uint8
    assert depth.shape == (12, 4, 4) and depth.dtype == np.uint16
    for j in range(12):
        ix = 12 + j
        # BGR frame channels (b,g,r)=(3ix, 3ix+1, 3ix+2) -> RGB reversed
        np.testing.assert_array_equal(rgb[j, ..., 0], 3 * ix + 2)
        np.testing.assert_array_equal(rgb[j, ..., 2], 3 * ix)
        np.testing.assert_array_equal(depth[j], 100 * ix)


def test_mattersim_renderer_action_sequence_and_config():
    from gridmm_tpu.data.preprocess import mattersim_renderer

    sims = []
    orig_init = _FakeSim.__init__

    def capture_init(self):
        orig_init(self)
        sims.append(self)

    _FakeSim.__init__ = capture_init
    try:
        def run():
            return list(mattersim_renderer(
                [("s", "v")], "/conn", scan_data_dir="/scans", resolution=4))

        _with_fake_mattersim(run)
    finally:
        _FakeSim.__init__ = orig_init

    (sim,) = sims
    # configured like the reference's sweep (get_map_feature.py:94-110)
    assert sim.config["navgraph"] == "/conn"
    assert sim.config["dataset"] == "/scans"
    assert sim.config["render"] and sim.config["depth"]
    assert sim.config["discrete"] and sim.config["initialized"]
    assert sim.config["resolution"] == (4, 4)
    assert abs(sim.config["vfov"] - math.radians(60)) < 1e-9
    # episode starts at heading 0, elevation -30 deg
    assert sim.episodes == [("s", "v", 0, math.radians(-30))]
    # 35 actions for the 36-view sweep: elevation +1 at ix 12 and 24,
    # heading-only steps elsewhere
    assert len(sim.actions) == 35
    for step, (idx, h, e) in enumerate(sim.actions, start=1):
        assert idx == 0 and h == 1.0
        assert e == (1.0 if step % 12 == 0 else 0)
