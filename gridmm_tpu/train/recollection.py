"""Teacher-recollection store: record trajectories once, train offline.

Reference: TeacherRecollectionDataset (VLN_CE/vlnce_baselines/common/
recollection_dataset.py:22-297) replays teacher rollouts from disk so epochs
don't pay simulator cost. Here a recorded TrajectoryBatch (the exact input of
the scanned trajectory loss) serializes to one compressed npz per batch; a
round-robin loader feeds training without touching the env/sim at all."""

from __future__ import annotations

import os
from typing import Iterator, List

import jax
import jax.numpy as jnp
import numpy as np

from gridmm_tpu.train.step import StepInputs, TrajectoryBatch


def save_trajectory_batch(path: str, batch: TrajectoryBatch) -> None:
    arrays = {"txt_ids": np.asarray(batch.txt_ids),
              "txt_mask": np.asarray(batch.txt_mask)}
    for f in StepInputs._fields:
        arrays[f"steps_{f}"] = np.asarray(getattr(batch.steps, f))
    np.savez_compressed(path, **arrays)


def load_trajectory_batch(path: str) -> TrajectoryBatch:
    with np.load(path) as z:
        steps = StepInputs(*[z[f"steps_{f}"] for f in StepInputs._fields])
        return TrajectoryBatch(txt_ids=z["txt_ids"], txt_mask=z["txt_mask"],
                               steps=steps)


def pad_to_steps(batch: TrajectoryBatch, num_steps: int,
                 ignore_id: int = -100) -> TrajectoryBatch:
    """Pad the step axis to a fixed length so every recorded batch shares one
    compiled graph (variable episode lengths otherwise force recompiles —
    SURVEY.md §7 'bucketed episode lengths'). Padding steps replay the last
    real step with ignore targets (loss-neutral; the reference likewise keeps
    feeding ended episodes, agent.py:434)."""
    s = batch.steps.target.shape[0]
    if s >= num_steps:
        return TrajectoryBatch(
            txt_ids=batch.txt_ids, txt_mask=batch.txt_mask,
            steps=StepInputs(*[a[:num_steps] for a in batch.steps]))

    def pad(a, field):
        if isinstance(a, jax.Array):
            # device-resident fields (e.g. CLIP patch tokens recorded by the
            # CE trainer) pad on device — pulling them to host would round-
            # trip megabytes per episode for no reason
            reps = jnp.concatenate(
                [a, jnp.repeat(a[-1:], num_steps - s, axis=0)])
            if field in ("target", "obj_target"):
                reps = reps.at[s:].set(ignore_id)
            return reps
        reps = np.concatenate(
            [np.asarray(a),
             np.repeat(np.asarray(a[-1:]), num_steps - s, axis=0)])
        if field in ("target", "obj_target"):
            reps[s:] = ignore_id
        return reps

    steps = StepInputs(*[pad(getattr(batch.steps, f), f)
                         for f in StepInputs._fields])
    return TrajectoryBatch(batch.txt_ids, batch.txt_mask, steps)


class RecollectionStore:
    """Directory of recorded teacher trajectories."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def record(self, agent, num_batches: int, feedback: str = "teacher",
               rng=None) -> int:
        """Roll out and persist `num_batches` recorded batches."""
        n0 = len(self.paths())
        for i in range(num_batches):
            _, batch, _ = agent.rollout(feedback=feedback, record=True,
                                        rng=rng)
            save_trajectory_batch(
                os.path.join(self.root, f"traj_{n0 + i:06d}.npz"), batch)
        return num_batches

    def paths(self) -> List[str]:
        return sorted(
            os.path.join(self.root, f) for f in os.listdir(self.root)
            if f.endswith(".npz"))

    def __len__(self) -> int:
        return len(self.paths())

    def batches(self, epochs: int = 1,
                pad_steps: int | None = None) -> Iterator[TrajectoryBatch]:
        for _ in range(epochs):
            for p in self.paths():
                b = load_trajectory_batch(p)
                if pad_steps is not None:
                    b = pad_to_steps(b, pad_steps)
                yield b
