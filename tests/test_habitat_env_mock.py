"""HabitatContinuousEnv exercised against a mock habitat + quaternion.

habitat-sim is absent from this image; this fake reproduces the API surface
the adapter touches (habitat.get_config/Env, sim.get_agent_state/
set_agent_state/step_without_obs/geodesic_distance, quaternion rotation) so
the adapter's semantics are verified:
  * rotate-then-k-forward-steps movement with intermediate frames skipped
    (nav.py:27-172 / habitat_simulator.py:49-100)
  * angular (not lexicographic) sensor ordering (ss_trainer:521-535)
  * heading readback via forward-vector rotation
  * geodesic oracle helpers (environments.py:54-72)
"""

import importlib
import math
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STEP = 0.25
ANGLES = [0.0] + [30.0 * k for k in range(1, 12)]


def _fake_quaternion_module():
    m = types.ModuleType("quaternion")

    def from_rotation_vector(v):
        v = np.asarray(v, np.float64)
        return ("rotvec", v)

    def rotate_vectors(rot, vec):
        _, v = rot
        theta = np.linalg.norm(v)
        vec = np.asarray(vec, np.float64)
        if theta < 1e-12:
            return vec
        axis = v / theta
        # Rodrigues
        return (vec * math.cos(theta)
                + np.cross(axis, vec) * math.sin(theta)
                + axis * np.dot(axis, vec) * (1 - math.cos(theta)))

    m.from_rotation_vector = from_rotation_vector
    m.rotate_vectors = rotate_vectors
    return m


class _AgentState:
    def __init__(self, position, rotation):
        self.position = np.asarray(position, np.float64)
        self.rotation = rotation


class _FakeSim:
    def __init__(self, quaternion):
        self._q = quaternion
        self.state = _AgentState([0.0, 0.0, 0.0],
                                 quaternion.from_rotation_vector([0, 0, 0]))
        self.without_obs_calls = 0

    def get_agent_state(self):
        return self.state

    def set_agent_state(self, position, rotation):
        self.state = _AgentState(position, rotation)

    def _forward(self):
        d = self._q.rotate_vectors(self.state.rotation, [0.0, 0.0, -STEP])
        self.state = _AgentState(self.state.position + d,
                                 self.state.rotation)

    def step_without_obs(self, action):
        assert action == 1
        self.without_obs_calls += 1
        self._forward()

    def geodesic_distance(self, a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.linalg.norm(a - b))


class _Instruction:
    instruction_tokens = [101, 7, 8, 102]


class _Goal:
    position = [3.0, 0.0, -4.0]


class _Episode:
    episode_id = 42
    instruction = _Instruction()
    goals = [_Goal()]
    reference_path = [[0.0, 0.0, 0.0], [3.0, 0.0, -4.0]]


class _FakeEnv:
    def __init__(self, cfg, quaternion):
        self.sim = _FakeSim(quaternion)
        self.current_episode = _Episode()

    def _raw_obs(self):
        # distinct constant per angle; include a decoy key that would break
        # lexicographic ordering ('rgb_120.0' < 'rgb_30.0' lexically)
        raw = {}
        for a in ANGLES:
            key_r = "rgb" if a == 0 else f"rgb_{a}"
            key_d = "depth" if a == 0 else f"depth_{a}"
            raw[key_r] = np.full((4, 4, 3), int(a // 30), np.uint8)
            raw[key_d] = np.full((4, 4, 1), a / 330.0, np.float32)
        return raw

    def reset(self):
        return self._raw_obs()

    def step(self, action):
        assert action == 1
        self.sim._forward()
        return self._raw_obs()


import pytest


@pytest.fixture(autouse=True)
def _restore_module():
    """Re-reload habitat_env after each test so the mock doesn't leak a
    HABITAT_AVAILABLE=True module state into the rest of the suite."""
    yield
    sys.modules.pop("habitat", None)
    sys.modules.pop("quaternion", None)
    import gridmm_tpu.ce.habitat_env as he

    importlib.reload(he)


def _build_env(monkeypatch, num_envs=1, eval_mode=False, **kwargs):
    q = _fake_quaternion_module()
    habitat = types.ModuleType("habitat")
    habitat.get_config = lambda path: {"path": path}
    habitat.Env = lambda cfg: _FakeEnv(cfg, q)
    monkeypatch.setitem(sys.modules, "habitat", habitat)
    monkeypatch.setitem(sys.modules, "quaternion", q)
    import gridmm_tpu.ce.habitat_env as he

    importlib.reload(he)
    assert he.HABITAT_AVAILABLE
    env = he.HabitatContinuousEnv("dummy.yaml", num_envs=num_envs,
                                   eval_mode=eval_mode, **kwargs)
    return he, env


def test_episodes_allowed_reaches_config(monkeypatch):
    """episodes_allowed lands in the env config as a stringified
    EPISODES_ALLOWED whitelist before Env construction (construct_envs,
    env_utils.py:59-61) — the hook the scene-balanced per-rank train
    allocation plugs into."""
    captured = {}
    q = _fake_quaternion_module()
    habitat = types.ModuleType("habitat")
    habitat.get_config = lambda path: {"path": path}

    def fake_env(cfg):
        captured.setdefault("cfg", cfg)
        return _FakeEnv(cfg, q)

    habitat.Env = fake_env
    monkeypatch.setitem(sys.modules, "habitat", habitat)
    monkeypatch.setitem(sys.modules, "quaternion", q)
    import gridmm_tpu.ce.habitat_env as he

    importlib.reload(he)
    env = he.HabitatContinuousEnv("dummy.yaml", episodes_allowed=[3, "7"])
    assert captured["cfg"]["EPISODES_ALLOWED"] == ["3", "7"]
    assert env.episodes_allowed == [3, "7"]


def test_reset_and_sensor_order(monkeypatch):
    he, env = _build_env(monkeypatch)
    obs = env.reset()[0]
    assert obs.rgb.shape == (12, 4, 4, 3)
    # clockwise frame order (Policy:301-308): view j = sensor (12-j)%12,
    # sensors themselves ascending 0,30,...,330 CCW — NOT lexicographic
    cw = np.array([(12 - j) % 12 for j in range(12)])
    np.testing.assert_array_equal(obs.rgb[:, 0, 0, 0], cw)
    np.testing.assert_allclose(obs.depth[:, 0, 0], cw * 30.0 / 330.0,
                               atol=1e-6)
    assert obs.episode_id == "42"
    np.testing.assert_array_equal(obs.instruction_ids, [101, 7, 8, 102])
    # gt path projected to (x, z)
    np.testing.assert_allclose(obs.gt_path[-1], [3.0, -4.0])


def test_step_to_semantics(monkeypatch):
    he, env = _build_env(monkeypatch)
    env.reset()
    sim = env._envs[0].sim
    env.step_to(0, heading=math.pi / 2, distance=1.0)
    # 4 forward steps of 0.25m: 3 without rendering + 1 full env.step
    assert sim.without_obs_calls == 3
    obs = env.observations()[0]
    # heading +pi/2 moves along +x in the (x, z) plane
    np.testing.assert_allclose(obs.position, [1.0, 0.0], atol=1e-6)
    assert abs(obs.heading - math.pi / 2) < 1e-6
    # trajectory recorded for metrics/inference writers
    assert len(env.paths[0]) == 2
    np.testing.assert_allclose(env.paths[0][1], [1.0, 0.0], atol=1e-6)


def test_oracle_helpers(monkeypatch):
    he, env = _build_env(monkeypatch)
    env.reset()
    # goal at (3, 0, -4): distance from origin = 5
    assert abs(env.dist_to_goal(0) - 5.0) < 1e-6
    # candidate 1m along heading 0 (-z): position (0,0,-1) -> dist 3-4 plane
    d = env.cand_dist_to_goal(0, heading=0.0, distance=1.0)
    assert abs(d - math.hypot(3.0, 3.0)) < 1e-6


def test_eval_mode_records_substeps(monkeypatch):
    """eval_mode records every 0.25 m sub-step position + collision flag
    (MoveHighToLowEval/Infer, habitat_extensions/nav.py:112-172); train mode
    keeps one point per macro step (MoveHighToLow)."""
    he, env = _build_env(monkeypatch, eval_mode=True)
    env.reset()
    sim = env._envs[0].sim
    sim.previous_step_collided = False
    env.step_to(0, heading=math.pi / 2, distance=1.0)
    # start + 3 sub-steps + final = 5 recorded positions
    assert len(env.paths[0]) == 5
    xs = [p[0] for p in env.paths[0]]
    np.testing.assert_allclose(xs, [0.0, 0.25, 0.5, 0.75, 1.0], atol=1e-6)
    assert env.collisions[0] == [False, False, False, False]
    # collision flag propagates
    sim.previous_step_collided = True
    env.step_to(0, heading=math.pi / 2, distance=0.5)
    assert env.collisions[0][-1] is True
    # reset clears the recordings
    env.reset()
    assert len(env.paths[0]) == 1 and env.collisions[0] == []


def test_panoramic_camera_injection():
    """inject_panoramic_cameras mirrors ss_trainer_GridMap.py:518-538: the
    base RGB/DEPTH sensors are cloned at 11 extra yaw orientations (keys
    str(30.0*k), ORIENTATION [0, pi/6*k, 0], UUID lowercased), registered
    as SIMULATOR nodes + AGENT_0.SENSORS entries, resizer sizes mirrored.
    Idempotent on a config that already carries them."""
    import gridmm_tpu.ce.habitat_env as he

    def node(**kw):
        return types.SimpleNamespace(**kw)

    def make_cfg():
        sim = node(
            RGB_SENSOR=node(WIDTH=224, ORIENTATION=[0.0, 0.0, 0.0],
                            UUID="rgb"),
            DEPTH_SENSOR=node(WIDTH=256, ORIENTATION=[0.0, 0.0, 0.0],
                              UUID="depth"),
            AGENT_0=node(SENSORS=["RGB_SENSOR", "DEPTH_SENSOR"]))
        sizes = [("rgb", (224, 224)), ("depth", (256, 256))]
        rl = node(POLICY=node(OBS_TRANSFORMS=node(
            RESIZER_PER_SENSOR=node(SIZES=sizes))))
        return node(TASK_CONFIG=node(SIMULATOR=sim, DATASET=node()), RL=rl)

    cfg = make_cfg()
    he.inject_panoramic_cameras(cfg)
    sim = cfg.TASK_CONFIG.SIMULATOR
    orients = he.get_camera_orientations(12)
    assert list(orients) == [str(30.0 * k) for k in range(1, 12)]
    for k in range(1, 12):
        key = str(30.0 * k)
        for st, base in (("RGB", sim.RGB_SENSOR), ("DEPTH",
                                                   sim.DEPTH_SENSOR)):
            cam = getattr(sim, f"{st}_{key}")
            assert cam is not base
            np.testing.assert_allclose(cam.ORIENTATION,
                                       [0.0, math.pi / 6 * k, 0.0])
            assert cam.UUID == f"{st.lower()}_{key}"
            assert cam.WIDTH == base.WIDTH
            assert f"{st}_{key}" in sim.AGENT_0.SENSORS
    assert len(sim.AGENT_0.SENSORS) == 2 + 22
    sizes = cfg.RL.POLICY.OBS_TRANSFORMS.RESIZER_PER_SENSOR.SIZES
    assert ("rgb_30.0", (224, 224)) in sizes
    assert ("depth_330.0", (256, 256)) in sizes
    assert len(sizes) == 2 + 22

    # idempotent: a second call (or a config file that already defines the
    # panorama) must not double-register
    he.inject_panoramic_cameras(cfg)
    assert len(sim.AGENT_0.SENSORS) == 2 + 22
