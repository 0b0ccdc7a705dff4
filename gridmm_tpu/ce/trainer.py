"""Continuous-env trainer: schedule-sampled imitation learning.

Reference: VLN_CE/vlnce_baselines/ss_trainer_GridMap.py:141-675 — per-step
waypoint prediction, oracle teacher via cand_dist_to_goal, CE loss, schedule-
sampling ratio decaying per epoch (ratio^(epoch//num_epoches_per_ratio+1),
ss_trainer:619). The update path reuses the shared jitted nav step; the CE
loss is taken on the CE action head — fused = global+local over the
[stop]+candidates columns (gridmap/vilmodel.py:788-800), the same logits the
rollout acts on (ss_trainer:269-330)."""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gridmm_tpu.ce.agent import CEAgent
from gridmm_tpu.ce.env import ContinuousEnv, ce_episode_metrics
from gridmm_tpu.config import GridMMConfig
from gridmm_tpu.train.step import make_optimizer
from gridmm_tpu.utils.logging import MetricLogger


def derive_batches_per_epoch(env: ContinuousEnv, num_envs: int) -> int:
    """batches_per_epoch = ceil(dataset_length / batch_size), so one epoch
    covers the env's whole episode split (ss_trainer_GridMap.py:606-607).
    Envs advertise their split via `num_episodes` (SyntheticContinuousEnv)
    or an `episodes_allowed` whitelist (HabitatContinuousEnv); an env with
    neither (unbounded stream) raises — pass an explicit batch count."""
    n = getattr(env, "num_episodes", None)
    if not n:
        allowed = getattr(env, "episodes_allowed", None)
        n = len(allowed) if allowed else None
    if not n:
        raise ValueError(
            "cannot derive batches_per_epoch: env advertises no episode "
            "split (num_episodes/episodes_allowed); pass "
            "--batches_per_epoch explicitly")
    return max(1, int(np.ceil(n / num_envs)))


class CETrainer:
    def __init__(self, cfg: GridMMConfig, agent: CEAgent,
                 schedule_ratio: float = 0.5,
                 epochs_per_ratio: int = 1, mesh=None):
        import dataclasses

        # CE acts AND trains on fused = global+local over the
        # [stop]+candidates columns (gridmap/vilmodel.py:788-800; the trainer
        # takes its CE loss on the very logits it acts on,
        # ss_trainer_GridMap.py:269-330); loss accumulates over the WHOLE
        # episode and updates once, like the reference ss_trainer — per-step
        # updates would invalidate the project-at-insertion point cache
        # mid-episode.
        # CE loss contract: il_loss = ml_loss / total actions
        # (ss_trainer_GridMap.py:284,328,493 — no ml_weight factor)
        self.cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, loss_head="ce",
                                           loss_norm="actions"))
        self.agent = agent
        self.schedule_ratio = schedule_ratio
        self.epochs_per_ratio = epochs_per_ratio
        # mesh: SPMD equivalent of the reference's DDP-wrapped CE trainer
        # (base_il_trainer.py _init_distributed/DDP): navigator params shard
        # by the Megatron/TP rules over `model`, the episode batch splits over
        # `data`, and XLA inserts the gradient all-reduce over ICI. The
        # perception towers (no TP rules) are replicated so every jitted
        # input carries an explicit mesh sharding.
        self.mesh = mesh
        if mesh is not None:
            from gridmm_tpu.parallel.mesh import param_shardings, replicated

            agent.nav_params = jax.device_put(
                agent.nav_params, param_shardings(agent.nav_params, mesh))
            for name in ("wp_params", "rgb_params", "depth_params",
                         "clip_params", "view_params"):
                p = getattr(agent, name)
                if p is not None:
                    setattr(agent, name, jax.device_put(
                        p, replicated(p, mesh)))
        self.tx = make_optimizer(self.cfg)
        # eager init on sharded params: computation follows data, so the
        # optimizer state inherits the parameter shardings
        self.opt_state = self.tx.init(agent.nav_params)
        self._epoch = 0

        from gridmm_tpu.train.step import trajectory_loss

        def update(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(
                lambda p: trajectory_loss(self.agent.navigator, self.cfg, p,
                                          batch, rng))(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        # donate params + opt state: updated in place, the pre-update
        # values are never read again (train_epoch re-reads agent.nav_params
        # each batch)
        if mesh is not None:
            # commit the optimizer count scalar and pin output shardings to
            # the inputs' so every update after the first reuses one
            # executable
            from gridmm_tpu.parallel.mesh import commit_and_pin

            (agent.nav_params, self.opt_state), out_sh = commit_and_pin(
                mesh, agent.nav_params, self.opt_state)
            self._jit_update = jax.jit(update, donate_argnums=(0, 1),
                                       out_shardings=out_sh)
        else:
            self._jit_update = jax.jit(update, donate_argnums=(0, 1))

    def ss_ratio(self, epoch: int) -> float:
        return self.schedule_ratio ** (epoch // self.epochs_per_ratio + 1)

    def train_epoch(self, env: ContinuousEnv, epoch: int, batches: int = 2,
                    max_steps: int = 6, logger: Optional[MetricLogger] = None,
                    seed: int = 0) -> Dict[str, float]:
        """Schedule-sampled training: during the rollout the executed action is
        the teacher's with prob ss_ratio, else the student's argmax
        (ss_trainer train_ml); the recorded episode then replays through the
        scanned trajectory loss for ONE update per batch (the reference also
        accumulates the whole rollout before stepping, ss_trainer:644-646)."""
        import jax.random as jrandom

        from gridmm_tpu.train.recollection import pad_to_steps
        from gridmm_tpu.train.step import TrajectoryBatch, StepInputs, init_carry

        rng = np.random.default_rng(seed + epoch)
        jrng = jrandom.PRNGKey(seed * 1000 + epoch)
        ratio = self.ss_ratio(epoch)
        losses = []
        agent = self.agent
        data_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            dp = self.mesh.shape["data"]
            if env.num_envs % dp != 0:
                raise ValueError(
                    f"num_envs {env.num_envs} not divisible by the data-axis "
                    f"size {dp}")
            data_sharding = NamedSharding(self.mesh, PartitionSpec("data"))
        for bi in range(batches):
            obs = env.reset()
            b = env.num_envs
            sh = self.cfg.shapes
            txt_ids = np.zeros((b, sh.max_txt_len), np.int32)
            txt_mask = np.zeros((b, sh.max_txt_len), bool)
            for i, ob in enumerate(obs):
                enc = ob.instruction_ids[: sh.max_txt_len]
                txt_ids[i, : len(enc)] = enc
                txt_mask[i, : len(enc)] = True
            txt_embeds = agent._jit_language(
                agent.nav_params, jnp.asarray(txt_ids), jnp.asarray(txt_mask))

            carry = init_carry(self.cfg, b)
            ended = np.zeros((b,), bool)
            next_slot = np.full((b,), 1, np.int32)
            centers = np.asarray([19 + 36 * i for i in range(7)])
            recorded = []

            for t in range(max_steps):
                rgb = np.stack([ob.rgb for ob in obs])
                depth = np.stack([ob.depth for ob in obs])
                if data_sharding is not None:
                    # perception shards over envs: the towers are pure
                    # batch maps, so GSPMD runs them collective-free
                    rgb = jax.device_put(rgb, data_sharding)
                    depth = jax.device_put(depth, data_sharding)
                else:
                    rgb, depth = jnp.asarray(rgb), jnp.asarray(depth)
                nms_maps, probs, patch_dev, view_cls, view_feats = \
                    agent._jit_perception(
                        agent.wp_params, agent.rgb_params, agent.depth_params,
                        agent.clip_params, agent.view_params, rgb, depth)
                # one batched device_get: the async host copies overlap, so a
                # high-latency link pays one round trip instead of four.
                # (view_feats: same view tokens in train as in eval rollout —
                # the reference runs one policy forward for both)
                nms_maps, probs, view_cls, view_feats = jax.device_get(
                    (nms_maps, probs, view_cls, view_feats))
                # train-time waypoint sampling augmentation (Policy:393-425)
                cand_lists = [
                    agent.candidates_from_nms(nms_maps[i], obs[i].heading,
                                              agent.max_candidates,
                                              probs=probs[i], rng=rng)
                    for i in range(b)]
                x, _ = agent._build_step(obs, cand_lists, view_cls, centers,
                                         next_slot, t, view_feats=view_feats,
                                         ended=ended)
                targets = agent._teacher(env, obs, cand_lists, ended)
                x = x._replace(target=targets.astype(np.int32),
                               patch_fts=patch_dev)
                recorded.append(x)

                carry, out = agent._jit_nav(
                    agent.nav_params, txt_embeds, jnp.asarray(txt_mask),
                    carry, jax.tree_util.tree_map(jnp.asarray, x))
                logits = np.asarray(out.local_logits, np.float64)
                student = logits.argmax(-1)
                use_teacher = rng.random(b) < ratio
                a_t = np.where(use_teacher & (targets >= 0), targets, student)
                for i in range(b):
                    if ended[i]:
                        continue
                    if a_t[i] == 0 or t == max_steps - 1 or \
                            a_t[i] > len(cand_lists[i]):
                        ended[i] = True
                        continue
                    h_i, d_i, _ = cand_lists[i][a_t[i] - 1]
                    env.step_to(i, h_i, d_i)
                obs = env.observations()
                if ended.all():
                    break

            # stack per field; device-resident fields (patch_fts) stack on
            # device so the CLIP tokens never round-trip through the host
            stacked = StepInputs(*[
                (jnp.stack([getattr(s, f) for s in recorded])
                 if isinstance(getattr(recorded[0], f), jax.Array)
                 else np.stack([np.asarray(getattr(s, f))
                                for s in recorded]))
                for f in StepInputs._fields])
            batch = pad_to_steps(
                TrajectoryBatch(txt_ids, txt_mask, stacked), max_steps,
                self.cfg.train.ignoreid)
            if self.mesh is not None:
                from gridmm_tpu.parallel.mesh import \
                    trajectory_batch_shardings

                batch = jax.device_put(
                    batch, trajectory_batch_shardings(batch, self.mesh))
            else:
                batch = jax.tree_util.tree_map(jnp.asarray, batch)
            agent.nav_params, self.opt_state, loss = self._jit_update(
                agent.nav_params, self.opt_state, batch,
                jrandom.fold_in(jrng, bi))
            losses.append(float(loss))
            if logger:
                logger.log(epoch * batches + bi,
                           {"loss": losses[-1], "ss_ratio": ratio},
                           prefix="ce_train/")
        self._epoch = epoch
        return {"loss": float(np.mean(losses)), "ss_ratio": ratio}

    def evaluate(self, env: ContinuousEnv, batches: int = 0,
                 max_steps: int = 20, results_dir: Optional[str] = None,
                 checkpoint_index: int = 0, split: str = "val_unseen",
                 video_dir: Optional[str] = None) -> Dict[str, float]:
        """Greedy eval; optionally persists the reference's observability
        artifacts (base_il_trainer.py:631-644, 725-746):

          results_dir -> per-rank stats_ep_ckpt_{i}_{split}_r{r}_w{w}.json
                         (per-episode metric dicts) and, on rank 0, the
                         aggregated stats_ckpt_{i}_{split}.json
          video_dir   -> one animated GIF of the first camera per episode

        batches=0 (the default) evaluates the FULL episode split: rollouts
        continue until the env's episode iterator wraps around (a rollout
        yields no unseen episode id), and every episode scores exactly once —
        the reference evaluates entire splits with repeats dropped
        (base_il_trainer.py:336,666 — loop `while len(stats_episodes) <
        episodes_to_eval`, pausing envs whose `next_episodes[i].episode_id
        in stats_episodes`).
        max_steps defaults to the reference's episode cap IL.max_traj_len=20
        (run_GridMap.yaml:23, enforced as MAX_EPISODE_STEPS at
        ss_trainer_GridMap.py:503).
        """
        import os

        all_m: List[dict] = []
        ep_stats: Dict[str, dict] = {}
        # full-split mode can stop as soon as every episode is seen when the
        # env advertises its split size (finite SyntheticContinuousEnv does)
        total = _full_split_total(env, batches, "eval")
        rollouts = 0
        while batches == 0 or rollouts < batches:
            rollouts += 1
            frames: Dict[int, list] = {}
            hook = None
            if video_dir:
                def hook(t, obs, frames=frames):
                    for i, ob in enumerate(obs):
                        frames.setdefault(i, []).append(
                            np.asarray(ob.rgb[0], np.uint8))
            ms = self.agent.rollout(env, max_steps=max_steps,
                                    feedback="argmax", on_step=hook)
            obs = env.observations()
            fresh = 0
            for i, m in enumerate(ms):
                eid = getattr(obs[i], "episode_id", "") or \
                    f"anon{rollouts}_{i}"
                if eid in ep_stats:
                    continue  # wraparound repeat: each episode counts once
                fresh += 1
                ep_stats[eid] = {k: float(v) for k, v in m.items()}
                all_m.append(m)
                if video_dir and i in frames:
                    from gridmm_tpu.utils.visualize import save_episode_video

                    os.makedirs(video_dir, exist_ok=True)
                    save_episode_video(
                        os.path.join(video_dir,
                                     f"ep_{eid}_ckpt_{checkpoint_index}"),
                        frames[i])
            if batches == 0:
                if fresh == 0 or (total and len(ep_stats) >= total):
                    break
                if rollouts >= 10000:
                    raise RuntimeError(
                        "full-split eval (batches=0) saw 10000 rollouts "
                        "without the episode iterator wrapping — this env "
                        "has no finite episode set; pass batches=N or give "
                        "the env a num_episodes")
        # Union of keys: ce_episode_metrics emits 'collisions' only when the
        # env recorded sub-step flags, so an episode that stopped at step 0
        # lacks it — average each key over the episodes that have it.
        keys = sorted({k for m in all_m for k in m})
        avg = {k: float(np.mean([m[k] for m in all_m if k in m]))
               for k in keys}
        if results_dir:
            import json

            from gridmm_tpu.parallel.multihost import (process_count,
                                                       process_index,
                                                       weighted_mean_scalars)

            os.makedirs(results_dir, exist_ok=True)
            rank, world = process_index(), process_count()
            with open(os.path.join(
                    results_dir,
                    f"stats_ep_ckpt_{checkpoint_index}_{split}_r{rank}_"
                    f"w{world}.json"), "w") as f:
                json.dump(ep_stats, f, indent=4)
            agg = weighted_mean_scalars(avg, float(len(all_m)))
            if rank == 0:
                with open(os.path.join(
                        results_dir,
                        f"stats_ckpt_{checkpoint_index}_{split}.json"),
                        "w") as f:
                    json.dump(agg, f, indent=4)
            avg = agg
        return avg

    # ----------------------------------------------------------- checkpoints
    def save(self, path: str) -> None:
        """Write `ckpt.{epoch}`-style training state: navigator params +
        optimizer state + epoch (ss_trainer_GridMap.py:65-75 save_checkpoint
        writes state_dict/optim_state/epoch/step_id). Rank-0 only — hosts
        share the checkpoint dir."""
        if jax.process_index() != 0:
            return
        from gridmm_tpu.utils.checkpoint import AsyncSaver

        if not hasattr(self, "_saver"):
            # per-epoch writes overlap the next epoch's episodes; orbax
            # commits by atomic rename, so a polling evaluator (run_ce
            # --run-type eval) never sees a half-written ckpt.{N}
            self._saver = AsyncSaver()
        self._saver.save(os.path.abspath(path), {
            "params": self.agent.nav_params,
            "opt_state": self.opt_state,
            "epoch": np.asarray(self._epoch, np.int32)})

    def flush(self) -> None:
        """Block until any in-flight async checkpoint write is COMMITTED
        (atomic rename done). A polling evaluator in another process only
        ever lists committed paths, but an in-process reader that was handed
        a just-saved path (tests, same-process eval) must flush first or the
        read races the background writer."""
        if hasattr(self, "_saver"):
            self._saver.wait()

    def close(self) -> None:
        """flush() plus release the async writer (end of training)."""
        if hasattr(self, "_saver"):
            self._saver.close()
            del self._saver

    def restore(self, path: str) -> int:
        """Restore full training state saved by `save`; returns the stored
        epoch (the reference's IL.is_requeue restore,
        base_il_trainer.py:147-150). Restoring into the current (possibly
        mesh-sharded) params/opt_state keeps their shardings."""
        from gridmm_tpu.utils.checkpoint import restore_checkpoint

        if hasattr(self, "_saver"):
            self._saver.wait()  # a just-written ckpt must be committed

        state = restore_checkpoint(os.path.abspath(path), {
            "params": self.agent.nav_params,
            "opt_state": self.opt_state,
            "epoch": np.asarray(0, np.int32)})
        self.agent.nav_params = state["params"]
        self.opt_state = state["opt_state"]
        self._epoch = int(state["epoch"])
        return self._epoch

    # ------------------------------------------------------------- inference
    def inference(self, env: ContinuousEnv, predictions_file: str,
                  fmt: str = "r2r", batches: int = 0,
                  max_steps: int = 20) -> int:
        """Greedy rollouts -> leaderboard predictions file
        (base_il_trainer.inference, :915+/1336-1367).

        batches=0 (default) predicts the FULL episode split exactly once
        (same wraparound detection as evaluate); max_steps defaults to the
        reference's IL.max_traj_len=20 cap (run_GridMap.yaml:23).

        fmt='r2r': JSON {episode_id: [{"position": [x, y, z], "heading": h,
        "stop": false}]} — the reference's get_info records verbatim
        (habitat_extensions/nav.py:127-137; stop is hardcoded False there
        and nothing in the reference ever flips it). Envs that expose
        `path_infos` (the habitat adapter) supply real 3D positions +
        headings; the synthetic arena synthesizes [x, 0, y] / heading 0.
        fmt='rxr': jsonlines of {"instruction_id", "path"} with consecutive
        duplicate positions dropped, sorted by instruction_id."""
        import json

        episode_predictions: Dict[str, list] = {}
        total = _full_split_total(env, batches, "inference")
        rollouts = 0
        while batches == 0 or rollouts < batches:
            rollouts += 1
            self.agent.rollout(env, max_steps=max_steps, feedback="argmax")
            obs = env.observations()
            infos_all = getattr(env, "path_infos", None)
            fresh = 0
            for i, ob in enumerate(obs):
                if ob.episode_id in episode_predictions:
                    continue
                fresh += 1
                if infos_all is not None:
                    episode_predictions[ob.episode_id] = [
                        dict(rec) for rec in infos_all[i]]
                else:
                    episode_predictions[ob.episode_id] = [
                        {"position": [float(p[0]), 0.0, float(p[1])],
                         "heading": 0.0, "stop": False}
                        for p in env.paths[i]]
            if batches == 0:
                done = total and len(episode_predictions) >= total
                if fresh == 0 or done:
                    break
                if rollouts >= 10000:
                    raise RuntimeError(
                        "full-split inference (batches=0) never wrapped — "
                        "pass batches=N or give the env a num_episodes")
        # rxr instruction ids: real numeric episode ids when ALL are numeric
        # (the released data's case); otherwise a collision-free enumeration
        if all(e.isdigit() for e in episode_predictions):
            instruction_ids = {e: int(e) for e in episode_predictions}
        else:
            instruction_ids = {e: j for j, e in
                               enumerate(sorted(episode_predictions))}

        if fmt == "r2r":
            with open(predictions_file, "w") as f:
                json.dump(episode_predictions, f, indent=2)
        else:  # rxr-habitat leaderboard format
            out = []
            for eid, infos in episode_predictions.items():
                path = [infos[0]["position"]]
                for rec in infos[1:]:
                    if path[-1] != rec["position"]:
                        path.append(rec["position"])
                out.append({"instruction_id": instruction_ids[eid],
                            "path": path})
            out.sort(key=lambda x: x["instruction_id"])
            with open(predictions_file, "w") as f:
                for rec in out:
                    f.write(json.dumps(rec) + "\n")
        return len(episode_predictions)


def _numbered_checkpoints(ckpt_dir: str) -> List[str]:
    """Checkpoint entries in a folder, ordered by the trailing number in the
    entry name. Only numbered entries count as checkpoints — rolling 'latest'
    links, logs, and in-progress tmp dirs are ignored rather than restored."""
    import re

    if not os.path.isdir(ckpt_dir):
        return []
    entries = []
    for name in os.listdir(ckpt_dir):
        if name.endswith((".tmp", ".log")) or name.startswith((".", "tmp")):
            continue
        # an AsyncSaver write in flight is visible as
        # '<ckpt>.orbax-checkpoint-tmp-<digits>' until the atomic commit
        # rename; its trailing digits must not read as a checkpoint number
        if "orbax-checkpoint-tmp" in name:
            continue
        m = re.search(r"(\d+)(?!.*\d)", name)
        if m is None:
            continue  # e.g. a 'latest' rolling checkpoint
        entries.append((int(m.group(1)), name))
    entries.sort()
    return [os.path.join(ckpt_dir, name) for _, name in entries]


def _full_split_total(env: ContinuousEnv, batches: int,
                      what: str) -> Optional[int]:
    """Split size for batches=0 full-split sweeps, or None when unknown.

    An env that DECLARES itself unbounded (num_episodes attribute present
    and None, SyntheticContinuousEnv's default) can never wrap, so a full-
    split sweep would grind through the 10000-rollout backstop before
    erroring — fail fast instead. An env without the attribute (habitat
    iterators cycle without advertising a size) keeps the wraparound+backstop
    path."""
    total = getattr(env, "num_episodes", "absent")
    if batches == 0 and total is None:
        raise ValueError(
            f"full-split {what} (batches=0) needs a finite episode split, "
            f"but this env declares an unbounded stream (num_episodes="
            f"None). Pass batches=N or construct the env with num_episodes.")
    return None if total == "absent" else total


def poll_checkpoint_dir(ckpt_dir: str, prev_index: int) -> Optional[str]:
    """Next unevaluated checkpoint in a folder (habitat's
    poll_checkpoint_folder behavior used at base_il_trainer.py:896-912).
    None if not yet written."""
    entries = _numbered_checkpoints(ckpt_dir)
    if prev_index + 1 < len(entries):
        return entries[prev_index + 1]
    return None


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest numbered checkpoint (the --resume entry point), or None."""
    entries = _numbered_checkpoints(ckpt_dir)
    return entries[-1] if entries else None


def evaluate_checkpoints_polling(trainer: CETrainer, env: ContinuousEnv,
                                 ckpt_dir: str, batches: int = 0,
                                 max_steps: int = 20,
                                 poll_seconds: float = 2.0,
                                 timeout_seconds: float = 0.0,
                                 results_dir: Optional[str] = None,
                                 split: str = "val_unseen",
                                 video_dir: Optional[str] = None
                                 ) -> List[Dict[str, float]]:
    """Evaluate checkpoints as they appear in ckpt_dir
    (base_il_trainer.eval(), :896-912: sleep-and-poll loop). Stops once no
    new checkpoint shows up within timeout_seconds (0 = single sweep)."""
    import time

    from gridmm_tpu.utils.checkpoint import (restore_checkpoint,
                                             restore_checkpoint_subtree)

    results: List[Dict[str, float]] = []
    prev = -1
    deadline = time.monotonic() + timeout_seconds
    while True:
        ckpt = poll_checkpoint_dir(ckpt_dir, prev)
        if ckpt is None:
            if time.monotonic() >= deadline:
                break
            time.sleep(poll_seconds)
            continue
        prev += 1
        try:
            # CETrainer.save layout: restore ONLY its 'params' entry — eval
            # never touches the optimizer moments, and skipping them cuts
            # the per-checkpoint restore I/O to a third
            trainer.agent.nav_params = restore_checkpoint_subtree(
                os.path.abspath(ckpt), "params", trainer.agent.nav_params)
        except Exception:
            # bare navigator-params checkpoint (e.g. train/loop.py exports)
            trainer.agent.nav_params = restore_checkpoint(
                os.path.abspath(ckpt), trainer.agent.nav_params)
        # stats/video files are named per checkpoint ordinal so successive
        # evals never overwrite each other (base_il_trainer names by index)
        metrics = trainer.evaluate(env, batches=batches, max_steps=max_steps,
                                   results_dir=results_dir,
                                   checkpoint_index=prev, split=split,
                                   video_dir=video_dir)
        metrics["checkpoint"] = ckpt
        results.append(metrics)
        deadline = time.monotonic() + timeout_seconds
    return results
