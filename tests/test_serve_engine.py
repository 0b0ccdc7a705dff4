"""Continuous-batching serving engine: slot isolation and reset correctness.

Episodes admitted at different times into a shared fixed-slot batch must
produce EXACTLY the results of running each episode alone (the step graph is
row-independent and an admission fully resets the slot's carry). Also covers
serving from an AOT bundle (no model code on the step path).
"""

import math
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.config import tiny_config  # noqa: E402
from gridmm_tpu.env.discrete import DiscreteNavEnv, synthetic_episodes  # noqa: E402
from gridmm_tpu.env.world import SyntheticWorld  # noqa: E402
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator  # noqa: E402
from gridmm_tpu.serve.engine import NavServingEngine  # noqa: E402
from gridmm_tpu.train.agent import EpisodeBook, NavAgent  # noqa: E402
from gridmm_tpu.train.step import init_carry, nav_device_step  # noqa: E402


class EpisodeDriver:
    """Host-side adapter for one episode: obs -> StepInputs rows, greedy
    action -> env move (the minimal argmax slice of NavAgent.rollout)."""

    def __init__(self, world, episode, cfg, model, params):
        self.cfg = cfg
        self.env = DiscreteNavEnv(world, world.graphs, [episode],
                                  batch_size=1, seed=0)
        self.agent = NavAgent(model, cfg, self.env, params)
        self.obs = self.env.reset()
        self.agent._update_caches(self.obs)
        ob = self.obs[0]
        self.book = EpisodeBook(ob["viewpoint"], cfg.shapes.max_gmap_len)
        self.book.topo.update(
            ob["viewpoint"], ob["position"],
            [(c["viewpointId"], c["position"]) for c in ob["candidate"]])
        self.t = 0
        self.trajectory = [[ob["viewpoint"]]]
        self.done = False

    def txt(self):
        ids, mask = self.agent.language_batch(self.obs)
        return ids[0], mask[0]

    def inputs(self):
        ob = self.obs[0]
        self.book.topo.node_step_ids[ob["viewpoint"]] = self.t + 1
        x, slot_vpids, _ = self.agent.build_step_inputs(self.obs, [self.book])
        self._slot_vpids = slot_vpids[0]
        return x

    def apply(self, logits_row: np.ndarray) -> bool:
        """Greedy action from this slot's fused logits; returns done."""
        a = int(np.argmax(logits_row))
        no_vp_left = all(vp is None or self.book.topo.graph.visited(vp)
                         for vp in self._slot_vpids[1:])
        if a == 0 or no_vp_left or \
                self.t == self.cfg.train.max_action_len - 1:
            self.done = True
            return True
        vp = self._slot_vpids[a]
        ob = self.obs[0]
        path = self.book.topo.graph.path(ob["viewpoint"], vp)
        self.trajectory.append(path)
        prev = (self.trajectory[-2][-1] if len(path) == 1 else path[-2])
        viewidx = self.agent.scanvp_cands[f"{ob['scan']}_{prev}"][vp]
        self.env.teleport(0, vp, (viewidx % 12) * math.radians(30),
                          (viewidx // 12 - 1) * math.radians(30))
        self.obs = self.env._get_obs()
        self.agent._update_caches(self.obs)
        ob = self.obs[0]
        self.book.topo.update(
            ob["viewpoint"], ob["position"],
            [(c["viewpointId"], c["position"]) for c in ob["candidate"]])
        self.t += 1
        return False


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    world = SyntheticWorld(num_scans=2, nodes_per_scan=10, feat_dim=768,
                           seed=1)
    episodes = synthetic_episodes(world, num=5, seed=1, max_len=4)
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(1))
    return cfg, world, episodes, model, params


def _run_standalone(cfg, world, episode, model, params):
    """The same episode alone through a b=1 jit of the step graph."""
    step1 = jax.jit(lambda p, t, m, c, x: nav_device_step(
        model, cfg, p, t, m, c, x))
    lang1 = jax.jit(lambda p, i, m: model.apply(
        p, "language", {"txt_ids": i, "txt_mask": m}))
    drv = EpisodeDriver(world, episode, cfg, model, params)
    ids, mask = drv.txt()
    txt = lang1(params, ids[None], mask[None])
    carry = init_carry(cfg, 1)
    logits_per_step = []
    while not drv.done:
        x = drv.inputs()
        carry, out = step1(params, txt, mask[None], carry,
                           jax.tree_util.tree_map(np.asarray, x))
        row = np.asarray(out.fused_logits)[0]
        logits_per_step.append(row)
        drv.apply(row)
    return logits_per_step, drv.trajectory


def test_staggered_episodes_match_standalone(setup):
    cfg, world, episodes, model, params = setup
    refs = [_run_standalone(cfg, world, ep, model, params)
            for ep in episodes]

    engine = NavServingEngine.create(model, cfg, params, batch=3)
    drivers = {i: EpisodeDriver(world, ep, cfg, model, params)
               for i, ep in enumerate(episodes)}
    got_logits = {i: [] for i in drivers}

    next_submit = 0
    # prime: submit two, keep one slot empty to exercise zero rows
    for _ in range(2):
        d = drivers[next_submit]
        ids, mask = d.txt()
        engine.submit(next_submit, ids, mask)
        next_submit += 1
    engine.admit()

    for _ in range(64):
        active = engine.active()
        if not active and next_submit >= len(episodes):
            break
        rows = {slot: drivers[rid].inputs()
                for rid, slot in active.items()}
        out = engine.step(rows)
        logits = np.asarray(out.fused_logits)
        finished = []
        for rid, slot in active.items():
            got_logits[rid].append(logits[slot])
            if drivers[rid].apply(logits[slot]):
                finished.append(rid)
        for rid in finished:
            engine.finish(rid)
            # refill mid-flight: later episodes join while others are
            # mid-episode — the admission must not disturb resident slots
            if next_submit < len(episodes):
                d = drivers[next_submit]
                ids, mask = d.txt()
                engine.submit(next_submit, ids, mask)
                next_submit += 1
        if finished:
            engine.admit()
    else:
        pytest.fail("serving loop did not drain")

    for i, (ref_logits, ref_traj) in enumerate(refs):
        assert drivers[i].trajectory == ref_traj, f"episode {i}"
        assert len(got_logits[i]) == len(ref_logits), f"episode {i}"
        for t, (a, b) in enumerate(zip(got_logits[i], ref_logits)):
            fin = np.isfinite(b)
            assert (np.isfinite(a) == fin).all(), (i, t)
            np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5,
                                       atol=1e-5, err_msg=f"ep{i} t{t}")
            assert int(np.argmax(a)) == int(np.argmax(b)), (i, t)


def test_engine_from_bundle_matches_live(setup, tmp_path):
    from gridmm_tpu.utils.export import (export_navigator_serving,
                                         save_serving_bundle)

    cfg, world, episodes, model, params = setup
    exports = export_navigator_serving(model, cfg, params, batch=2)
    save_serving_bundle(exports, str(tmp_path), cfg=cfg)

    live = NavServingEngine.create(model, cfg, params, batch=2)
    aot = NavServingEngine.from_bundle(str(tmp_path), cfg, params, batch=2)

    d_live = EpisodeDriver(world, episodes[0], cfg, model, params)
    d_aot = EpisodeDriver(world, episodes[0], cfg, model, params)
    for eng, drv in ((live, d_live), (aot, d_aot)):
        ids, mask = drv.txt()
        eng.submit("r", ids, mask)
        eng.admit()
    out_live = live.step({live.active()["r"]: d_live.inputs()})
    out_aot = aot.step({aot.active()["r"]: d_aot.inputs()})
    np.testing.assert_array_equal(np.asarray(out_live.fused_logits),
                                  np.asarray(out_aot.fused_logits))
