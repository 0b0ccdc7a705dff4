"""Fine-tuning driver loop: interactive rollout -> replay update -> periodic
eval -> checkpointing.

Reference: map_nav_src/main_nav.py:86-215 (train loop with log_every cadence,
best-SPL checkpoint selection) + r2r/agent_base.py:164-211 (per-iteration
train with teacher/sample interleave for DAgger).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional

import jax
import numpy as np

from gridmm_tpu.config import GridMMConfig
from gridmm_tpu.models.navigator import GridMMNavigator
from gridmm_tpu.train.agent import NavAgent
from gridmm_tpu.train.step import TrainState, create_train_state, make_train_step
from gridmm_tpu.utils.logging import MetricLogger, SectionTimer


@dataclasses.dataclass
class TrainerResult:
    best_spl: float
    best_iter: int
    final_metrics: Dict[str, float]


def train_navigator(
    cfg: GridMMConfig,
    model: GridMMNavigator,
    agent: NavAgent,
    val_agent: Optional[NavAgent] = None,
    aug_agent: Optional[NavAgent] = None,
    iters: Optional[int] = None,
    log_every: Optional[int] = None,
    eval_batches: Optional[int] = None,
    ckpt_dir: Optional[str] = None,
    logger: Optional[MetricLogger] = None,
    seed: int = 0,
    mesh=None,
) -> TrainerResult:
    """DAgger-style training, replayed through the scanned trajectory loss.

    cfg.train.dagger_sum=True reproduces the reference gradient shape exactly:
    one optimizer step per iteration over the SUM of a teacher-forced loss
    (ml_weight) and a student-sampled loss (weight 1), agent_base.py:164-196.
    Default (False) alternates the two passes across iterations — half the
    rollout cost per update, acknowledged schedule drift.

    eval_batches=None (the default) evaluates the FULL val split for the
    best-SPL checkpoint decision — reference test() + main_nav.py:180-204
    semantics; a positive count is a subsampled probe for smoke configs
    only (selection on a 4-batch sample is selection on noise).

    aug_agent (an agent over the augmented-instruction env, main_nav.py
    --aug split) alternates 1:1 with the GT-data agent per iteration
    (main_nav.py:142-154 interleave).

    mesh (a jax.sharding.Mesh from parallel.mesh.make_mesh) distributes the
    replay update: params sharded by the Megatron/TP rules over `model` and
    batches split over `data`; XLA inserts the gradient all-reduce — the
    TPU equivalent of the reference's DDP wrap (agent_base.py:115-117).
    cfg.train.batch_size must be divisible by the data-axis size.
    """
    iters = iters or cfg.train.iters
    log_every = log_every or cfg.train.log_every
    logger = logger or MetricLogger()
    timer = SectionTimer()
    dagger_sum = getattr(cfg.train, "dagger_sum", False)

    from gridmm_tpu.train.recollection import pad_to_steps
    from gridmm_tpu.train.step import make_dagger_step

    if mesh is not None:
        from gridmm_tpu.parallel.mesh import param_shardings

        agent.params = jax.device_put(agent.params,
                                      param_shardings(agent.params, mesh))
    state = create_train_state(cfg, agent.params)
    # donate the TrainState: params + adam slots update in place (the old
    # state is never read again — agents re-alias state.params each
    # iteration), halving their peak HBM footprint
    if mesh is not None:
        # pin output-state shardings to the inputs' so every step after the
        # first reuses one executable (GSPMD otherwise re-shards some
        # replicated leaves, forcing a full second compile)
        from gridmm_tpu.parallel.mesh import prepare_train_step

        train_step, state = prepare_train_step(make_train_step(model, cfg),
                                               state, mesh)
        dagger_step = (prepare_train_step(make_dagger_step(model, cfg),
                                          state, mesh)[0]
                       if dagger_sum else None)
    else:
        train_step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
        dagger_step = (jax.jit(make_dagger_step(model, cfg),
                               donate_argnums=(0,))
                       if dagger_sum else None)
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)

    best_spl, best_iter = -1.0, -1
    final_metrics: Dict[str, float] = {}

    # async cadence saves: the write overlaps the next training interval
    # (AsyncSaver host-copies before returning, so the step jits may donate
    # state.params immediately)
    from gridmm_tpu.utils.checkpoint import AsyncSaver

    saver = AsyncSaver()

    def _save_latest():
        # checkpoint writes are rank-0-only: hosts share the output dir and
        # concurrent orbax writers would corrupt it
        if ckpt_dir and jax.process_index() == 0:
            saver.save(os.path.join(os.path.abspath(ckpt_dir), "latest"),
                       state.params)

    def _bucket(s: int) -> int:
        """Smallest configured bucket covering s (else max_action_len).
        Each bucket costs one compiled fwd+bwd graph (jit caches by shape);
        short episodes then skip the padded scan tail.

        Multihost: hosts roll out different episodes, so the bucket is agreed
        on from the GLOBAL max episode length — per-host buckets would hand
        host_local_array_to_global_array inconsistent shard shapes and the
        SPMD programs would diverge."""
        if jax.process_count() > 1 and cfg.train.scan_buckets:
            from jax.experimental import multihost_utils

            s = int(np.max(multihost_utils.process_allgather(
                np.asarray(s, np.int32))))
        buckets = cfg.train.scan_buckets
        if not buckets:
            return cfg.train.max_action_len
        fits = [b for b in buckets if b >= s]
        return min(fits) if fits else cfg.train.max_action_len

    def _rollout(cur_agent, feedback):
        _, batch, _ = cur_agent.rollout(feedback=feedback, record=True,
                                        rng=np_rng)
        return batch

    def _pad(batch, num_steps=None):
        # pad to a fixed step count: variable episode lengths would force
        # a recompile of the scanned fwd+bwd per distinct length
        batch = pad_to_steps(
            batch, num_steps or _bucket(batch.steps.target.shape[0]),
            cfg.train.ignoreid)
        if mesh is not None:
            from gridmm_tpu.parallel.mesh import trajectory_batch_shardings

            sh = trajectory_batch_shardings(batch, mesh)
            if jax.process_count() > 1:
                # each host rolled out ITS batch shard; assemble the global
                # array rather than device_put-ing local data at global
                # offsets
                from jax.experimental import multihost_utils

                specs = jax.tree_util.tree_map(lambda s: s.spec, sh)
                batch = multihost_utils.host_local_array_to_global_array(
                    batch, mesh, specs)
            else:
                batch = jax.device_put(batch, sh)
        return batch

    try:
        for it in range(1, iters + 1):
            # GT/aug interleave: odd iterations GT env, even iterations aug env
            cur = agent if (aug_agent is None or it % 2 == 1) else aug_agent
            cur.params = state.params
            if dagger_sum:
                with timer.section("rollout"):
                    tb = _rollout(cur, "teacher")
                    sb = _rollout(cur, "sample")
                # one common bucket: the paired step compiles per bucket, not per
                # (teacher, sample) length combination
                nb = _bucket(max(tb.steps.target.shape[0],
                                 sb.steps.target.shape[0]))
                with timer.section("update"):
                    state, metrics = dagger_step(state, _pad(tb, nb),
                                                 _pad(sb, nb), rng)
            else:
                # alternate teacher/sample per ENV visit so the aug env sees both
                # passes too (with aug: T(gt) T(aug) S(gt) S(aug) ...)
                phase = ((it + 1) // 2) if aug_agent is not None else it
                feedback = "teacher" if phase % 2 == 1 else "sample"
                with timer.section("rollout"):
                    batch = _pad(_rollout(cur, feedback))
                with timer.section("update"):
                    state, metrics = train_step(state, batch, rng)
            logger.log(it, {k: float(v) for k, v in metrics.items()},
                       prefix="train/")

            if it % log_every == 0:
                # rolling latest checkpoint for crash recovery
                # (agent_base.py latest_dict / IL.is_requeue semantics)
                _save_latest()

            if it % log_every == 0 and val_agent is not None:
                with timer.section("eval"):
                    val_agent.params = state.params
                    avg, preds = val_agent.evaluate(eval_batches)
                if jax.process_count() > 1:
                    # each host evaluated its val shard (sel_data_idxs);
                    # count-weighted mean == metrics over the concatenated
                    # preds, so every host takes the SAME best-SPL decision
                    # (reference merges dist results before summarizing)
                    from gridmm_tpu.parallel.multihost import \
                        weighted_mean_scalars

                    avg = weighted_mean_scalars(avg, float(len(preds)))
                logger.log(it, avg, prefix="val/")
                final_metrics = avg
                # >= so equal-SPL ties keep the LATEST checkpoint, matching
                # main_nav.py:199 / main_rxr.py:199 / main_nav_obj.py:205
                if avg["spl"] >= best_spl:
                    best_spl, best_iter = avg["spl"], it
                    if ckpt_dir and jax.process_index() == 0:
                        saver.save(
                            os.path.join(os.path.abspath(ckpt_dir), "best_spl"),
                            state.params)
    except BaseException:
        # interrupted (preemption / SIGINT): park a resumable checkpoint
        # before propagating — --resume picks it up. The TrainState is
        # donated to the step jits, so an interrupt landing INSIDE a step
        # dispatch leaves `state` pointing at deleted buffers (old buffers
        # invalidated, new state never bound); skip the save then — the
        # last cadence 'latest' stays the resume point — and never let a
        # save failure mask the original exception.
        try:
            from gridmm_tpu.utils.checkpoint import params_deleted

            if params_deleted(state.params):
                print("interrupt landed mid-step (donated buffers gone); "
                      "resume from the last cadence checkpoint", flush=True)
            else:
                _save_latest()
            saver.close()  # make the interrupt save durable before exiting
        except Exception as save_err:
            print(f"interrupt-save failed: {save_err!r}", flush=True)
        raise
    saver.close()
    agent.params = state.params
    logger.log(iters, timer.summary(), prefix="time/")
    return TrainerResult(best_spl, best_iter, final_metrics)
