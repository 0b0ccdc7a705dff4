"""Multi-host utilities: eval-result merging and cross-host reductions.

The reference gathers variable-length prediction lists by pickling them into
padded ByteTensors and NCCL all_gather (map_nav_src/utils/distributed.py:90-130
+ merge_dist_results :160-164), and reduces scalar stats with dist.all_gather
(pretrain train_r2r.py:370-372). JAX-native equivalents:

  * in-graph tensors: jax collectives (psum/all_gather) — nothing to do here;
  * host-side python objects: multihost_utils broadcast/allgather over the
    jax distributed runtime when world_size > 1, with a no-op fast path for
    single-host runs (this image).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def merge_prediction_lists(local_preds: List[dict]) -> List[dict]:
    """Gather per-host prediction lists to every host, deduped by instr_id
    (the reference's all_gather + merge_dist_results)."""
    if jax.process_count() == 1:
        return local_preds
    import pickle

    from jax.experimental import multihost_utils

    data = pickle.dumps(local_preds)
    # two-phase: agree on the max payload size, then gather padded buffers
    # (the reference pads pickled ByteTensors the same way,
    # utils/distributed.py:99-125)
    sizes = multihost_utils.process_allgather(
        np.asarray([len(data)], np.int64), tiled=False)
    max_size = int(np.max(sizes))
    buf = np.zeros((max_size,), np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    gathered = multihost_utils.process_allgather(buf, tiled=False)
    merged: Dict[str, dict] = {}
    for row, size in zip(np.asarray(gathered).reshape(-1, max_size),
                         np.asarray(sizes).reshape(-1)):
        for item in pickle.loads(row[: int(size)].tobytes()):
            merged.setdefault(item["instr_id"], item)
    return list(merged.values())


def allocate_episodes_by_scene(episodes: List[dict], num_workers: int,
                               scene_key: str = "scan") -> List[List[dict]]:
    """Scene-load-balanced episode allocation across workers/hosts
    (VLN_CE/.../ss_trainer_GridMap.py:77-139 + vlnce_baselines/utils.py:45-162):
    whole scenes are assigned greedily to the least-loaded worker so each
    worker touches few scenes (simulator scene loads are expensive)."""
    by_scene: Dict[str, List[dict]] = {}
    for ep in episodes:
        by_scene.setdefault(str(ep[scene_key]), []).append(ep)
    buckets: List[List[dict]] = [[] for _ in range(num_workers)]
    loads = [0] * num_workers
    for scene, eps in sorted(by_scene.items(),
                             key=lambda kv: -len(kv[1])):
        w = int(np.argmin(loads))
        buckets[w].extend(eps)
        loads[w] += len(eps)
    return buckets


def weighted_mean_scalars(values: Dict[str, float],
                          weight: float) -> Dict[str, float]:
    """Weight-averaged host-local scalars (e.g. per-host eval metrics weighted
    by shard size — the reference computes metrics over the CONCATENATED
    prediction lists, which is exactly a count-weighted mean)."""
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    keys = sorted(values)
    if weight <= 0.0:
        # empty shard (fewer val scenes than hosts): its metrics are
        # np.mean([]) = NaN and NaN * 0.0 would poison every rank's sums
        arr = np.zeros(1 + len(keys), np.float64)
    else:
        arr = np.asarray([weight] + [values[k] * weight for k in keys],
                         np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(
        arr, tiled=False)).reshape(jax.process_count(), -1)
    total_w = max(gathered[:, 0].sum(), 1e-12)
    sums = gathered[:, 1:].sum(0) / total_w
    return {k: float(v) for k, v in zip(keys, sums)}


def all_mean_scalars(values: Dict[str, float]) -> Dict[str, float]:
    """Mean of host-local scalars across hosts (validate_* reductions)."""
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    keys = sorted(values)
    arr = np.asarray([values[k] for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(arr, tiled=False)
    mean = np.asarray(gathered).reshape(jax.process_count(), -1).mean(0)
    return {k: float(v) for k, v in zip(keys, mean)}


