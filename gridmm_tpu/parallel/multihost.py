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


