"""End-to-end: synthetic world -> discrete env -> interactive agent -> metrics,
and rollout-then-replay training."""

import dataclasses
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
from gridmm_tpu.train.agent import NavAgent  # noqa: E402
from gridmm_tpu.train.step import create_train_state, make_train_step  # noqa: E402


def tiny_cfg():
    return tiny_config()


def build_all(seed=0):
    cfg = tiny_cfg()
    world = SyntheticWorld(num_scans=2, nodes_per_scan=10, feat_dim=768,
                           seed=seed)
    episodes = synthetic_episodes(world, num=9, seed=seed, max_len=4)
    env = DiscreteNavEnv(world, world.graphs, episodes,
                         batch_size=cfg.train.batch_size, seed=seed)
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(seed))
    agent = NavAgent(model, cfg, env, params)
    return cfg, env, model, params, agent


@pytest.mark.slow
def test_rollout_and_eval():
    cfg, env, model, params, agent = build_all()
    traj, _, stats = agent.rollout(feedback="argmax")
    assert len(traj) == cfg.train.batch_size
    for item in traj:
        flat = [vp for seg in item["trajectory"] for vp in seg]
        assert len(flat) >= 1
    avg, preds = agent.evaluate(num_batches=3)
    # random-weight agent: metrics exist and are sane ranges
    for key in ("sr", "spl", "nDTW", "SDTW", "CLS", "oracle_sr"):
        assert 0.0 <= avg[key] <= 100.0
    assert avg["nav_error"] >= 0.0
    assert len(preds) <= 9


def test_teacher_rollout_reaches_goal():
    """With teacher forcing the agent must walk the GT path -> SR 100."""
    cfg, env, model, params, agent = build_all()
    env.reset_epoch(shuffle=False)
    preds = {}
    for _ in range(3):
        traj, _, _ = agent.rollout(feedback="teacher")
        for item in traj:
            preds.setdefault(item["instr_id"], {
                "instr_id": item["instr_id"],
                "trajectory": item["trajectory"]})
    avg, _ = env.eval_metrics(list(preds.values()))
    # The teacher walks through the goal, so oracle SR must be perfect. Plain
    # SR can be lower: after stopping, the agent jumps to its best
    # stop-probability node (reference behavior, agent.py:418-431), which is
    # arbitrary under random weights.
    assert avg["oracle_sr"] == 100.0, avg
    assert avg["sr"] >= 50.0, avg


@pytest.mark.slow
def test_rollout_record_replay_training():
    cfg, env, model, params, agent = build_all()
    traj, batch, _ = agent.rollout(feedback="teacher", record=True)
    assert batch is not None
    s, b = batch.steps.target.shape
    assert b == cfg.train.batch_size and 1 <= s <= cfg.train.max_action_len

    state = create_train_state(cfg, params)
    step = jax.jit(make_train_step(model, cfg))
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_full_split_eval_covers_split():
    """evaluate(None) iterates the whole split with wraparound + dedup
    (reference agent_base.py:43-65 test() loop)."""
    cfg, env, model, params, agent = build_all()
    avg, preds = agent.evaluate(None)
    assert len(preds) == env.size()
    ids = [p["instr_id"] for p in preds]
    assert len(set(ids)) == len(ids)


@pytest.mark.slow
def test_train_loop_dagger_sum():
    import dataclasses

    from gridmm_tpu.train.loop import train_navigator

    cfg, env, model, params, agent = build_all()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, dagger_sum=True))
    agent.cfg = cfg
    result = train_navigator(cfg, model, agent, val_agent=None, iters=2,
                             log_every=2, seed=0)
    assert result.best_iter == -1  # no val agent


@pytest.mark.slow
def test_train_loop_aug_interleave():
    """With an aug agent, iterations alternate GT/aug envs 1:1
    (main_nav.py:142-154) and both see teacher AND sample passes."""
    from gridmm_tpu.train.loop import train_navigator

    cfg, env, model, params, agent = build_all()
    aug_eps = synthetic_episodes(env.world, num=6, seed=7, max_len=4)
    aug_env = DiscreteNavEnv(env.world, env.world.graphs, aug_eps,
                             batch_size=cfg.train.batch_size, seed=7,
                             name="aug")
    aug_agent = NavAgent(model, cfg, aug_env, params)

    calls = []
    orig_rollout = NavAgent.rollout

    def spy(self, feedback="teacher", **kw):
        calls.append((self.env.name, feedback))
        return orig_rollout(self, feedback=feedback, **kw)

    NavAgent.rollout = spy
    try:
        train_navigator(cfg, model, agent, val_agent=None,
                        aug_agent=aug_agent, iters=4, log_every=4, seed=0)
    finally:
        NavAgent.rollout = orig_rollout
    assert calls == [("train", "teacher"), ("aug", "teacher"),
                     ("train", "sample"), ("aug", "sample")]


def test_expl_sample_feedback():
    """expl_sample = argmax with epsilon-uniform exploration over valid
    actions (reference agent.py:386-398; dagger --expl_sample mode)."""
    cfg, env, model, params, agent = build_all()
    rng = np.random.default_rng(0)
    traj, _, stats = agent.rollout(feedback="expl_sample", rng=rng)
    assert len(traj) == cfg.train.batch_size
    for item in traj:
        flat = [vp for seg in item["trajectory"] for vp in seg]
        assert len(flat) >= 1


@pytest.mark.slow
def test_train_loop_scan_buckets():
    """scan_buckets pads episodes to the smallest covering bucket instead of
    max_action_len (one compiled graph per bucket); training runs across
    bucket switches and both dagger modes."""
    from gridmm_tpu.train.loop import train_navigator
    from gridmm_tpu.train.recollection import pad_to_steps

    cfg, env, model, params, agent = build_all()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, scan_buckets=(2, 3, 4)))
    agent.cfg = cfg
    result = train_navigator(cfg, model, agent, val_agent=None, iters=3,
                             log_every=3, seed=0)
    assert result.best_iter == -1

    # bucket choice itself: a 2-step batch pads to 2, a 3-step to 3
    _, batch, _ = agent.rollout(feedback="teacher", record=True,
                                rng=np.random.default_rng(0))
    s = batch.steps.target.shape[0]
    fits = [b for b in (2, 3, 4) if b >= s]
    want = min(fits) if fits else cfg.train.max_action_len
    padded = pad_to_steps(batch, want, cfg.train.ignoreid)
    assert padded.steps.target.shape[0] == want

    # dagger_sum shares one bucket across the teacher/sample pair
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, scan_buckets=(2, 4),
                                       dagger_sum=True))
    agent.cfg = cfg2
    train_navigator(cfg2, model, agent, val_agent=None, iters=2,
                    log_every=2, seed=1)


@pytest.mark.slow
def test_interrupt_saves_latest_checkpoint(tmp_path):
    """An exception mid-training parks a resumable 'latest' checkpoint
    (preemption safety beyond the reference's log_every-cadence save)."""
    from pathlib import Path

    from gridmm_tpu.train.loop import train_navigator

    cfg, env, model, params, agent = build_all()

    calls = []
    orig_rollout = agent.rollout

    def exploding_rollout(*a, **k):
        calls.append(1)
        if len(calls) >= 2:
            raise RuntimeError("boom")
        return orig_rollout(*a, **k)

    agent.rollout = exploding_rollout
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        train_navigator(cfg, model, agent, val_agent=None, iters=5,
                        log_every=100, ckpt_dir=str(tmp_path), seed=0)
    assert (Path(tmp_path) / "latest").exists()


@pytest.mark.slow
def test_training_selection_evals_full_split_by_default():
    """train_navigator's best-SPL decision runs over the WHOLE val split
    unless explicitly subsampled (main_nav.py:180-204 selects on the full
    split; a 4-batch probe would checkpoint on noise)."""
    from gridmm_tpu.train.loop import train_navigator

    cfg, env, model, params, agent = build_all()
    _, val_env, vm, vp, val_agent = build_all()
    seen = []
    orig = val_agent.evaluate

    def spy(num_batches=None):
        avg, preds = orig(num_batches)
        seen.append((num_batches, len(preds)))
        return avg, preds

    val_agent.evaluate = spy
    result = train_navigator(cfg, model, agent, val_agent=val_agent,
                             iters=1, log_every=1, seed=0)
    assert seen and all(nb is None for nb, _ in seen), seen
    assert all(n == val_env.size() for _, n in seen), seen
    assert result.best_iter == 1
