"""Device-mesh construction and sharding rules.

TPU-native replacement for the reference's distributed runtime
(map_nav_src/utils/distributed.py, pretrain_src/utils/distributed.py,
VLN_CE/vlnce_baselines/utils.py — all torch.distributed/NCCL DDP):

  * data parallelism  -> batch sharded over the `data` mesh axis; gradient
    all-reduce is inserted by XLA over ICI (no explicit allreduce code).
  * optional tensor parallelism -> FFN and attention projection matrices
    sharded over the `model` axis (the model is BERT-base scale so this is a
    scale-out option, not a necessity — SURVEY.md 2.7).
  * eval-result merging (reference's pickle all_gather,
    utils/distributed.py:90-130) -> jax.experimental.multihost_utils at the
    host layer; in-graph tensors use jax collectives.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gridmm_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.mp_size)
    dp = cfg.dp_size if cfg.dp_size > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


# Parameter partition rules: (regex on the flattened param path) -> PartitionSpec.
# Matmul weights are (in, out); sharding the out-dim of up-projections and the
# in-dim of down-projections over `model` gives Megatron-style TP where XLA
# inserts a single psum per block.
_PARAM_RULES = [
    (r"intermediate_dense.*kernel$", P(None, "model")),
    (r"linear1.*kernel$", P(None, "model")),
    (r"output_dense.*kernel$", P("model", None)),
    (r"linear2.*kernel$", P("model", None)),
    (r"(query|key|value).*kernel$", P(None, "model")),
    (r"attn_out.*kernel$", P("model", None)),
    # BERT-style attention out-projections (attention/output/dense,
    # visn_self_att/output/dense, visual_attention/output/dense): input comes
    # from the model-sharded heads -> row-parallel, one psum after (the
    # FFN out-proj spells its name output_dense, matched above)
    (r"output/dense/kernel$", P("model", None)),
    # column-parallel biases live on the sharded out-feature dim; biases of
    # row-parallel projections stay replicated (added after the psum)
    (r"(query|key|value)/bias$", P("model")),
    (r"intermediate_dense.*bias$", P("model")),
    (r"linear1.*bias$", P("model")),
    (r"word_embeddings.*embedding$", P("model", None)),
]


def param_spec(path: str, fsdp: bool = False) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, path):
            if fsdp:
                # ZeRO-3 style: additionally shard the replicated kernel dim
                # over `data` (all-gathered by XLA at use sites)
                dims = list(spec)
                for i, d in enumerate(dims):
                    if d is None:
                        dims[i] = "data"
                        break
                return P(*dims)
            return spec
    if fsdp and path.endswith("kernel"):
        return P("data")
    return P()  # replicate


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_shardings(params: Any, mesh: Mesh, fsdp: bool = False):
    """NamedSharding pytree matching `params`. fsdp=True additionally shards
    parameters over the data axis (ZeRO-3 style; XLA inserts the use-site
    all-gathers)."""

    def spec_for(path, leaf):
        spec = param_spec(_path_str(path), fsdp)
        # drop the fsdp sharding when the dim isn't divisible by the axis
        if fsdp and spec != P():
            dims = leaf.shape
            axis_size = mesh.shape["data"]
            for i, name in enumerate(spec):
                if name == "data" and (i >= len(dims)
                                       or dims[i] % axis_size != 0):
                    spec = param_spec(_path_str(path), False)
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_shardings(batch: Any, mesh: Mesh, data_axis: str = "data",
                    batch_dim: int = 0):
    """Shard every array's batch dim over the data axis."""
    spec = P(*([None] * batch_dim + [data_axis]))
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, spec), batch)


def trajectory_batch_shardings(batch, mesh: Mesh, data_axis: str = "data"):
    """TrajectoryBatch: txt arrays are (B, ...), step arrays are (S, B, ...)."""
    return type(batch)(
        txt_ids=NamedSharding(mesh, P(data_axis)),
        txt_mask=NamedSharding(mesh, P(data_axis)),
        steps=jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P(None, data_axis)), batch.steps),
    )


def replicated(tree: Any, mesh: Mesh):
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


def commit_state(state: Any, mesh: Mesh):
    """Commit every leaf that lacks a NamedSharding to a replicated one.

    create_train_state / tx.init leave the step counter and optimizer count
    scalars on the default device with no mesh sharding; the jitted train
    step returns them committed to the mesh, so without this the SECOND call
    sees different input shardings and silently recompiles the entire
    executable (one full wasted compile per training run — measured +95s on
    the 8-device 1-core virtual mesh)."""
    rep = NamedSharding(mesh, P())

    def commit(x):
        if isinstance(getattr(x, "sharding", None), NamedSharding):
            return x
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(commit, state)


def commit_and_pin(mesh: Mesh, *trees):
    """commit_state every tree, and build the out_shardings for a step that
    returns (updated *trees, metrics): each tree's shardings pinned to its
    committed input's, metrics replicated scalars.

    Pinning matters because GSPMD's sharding propagation may otherwise
    return e.g. biases of TP-sharded projections re-sharded over `model` —
    different input shardings on the next call, which silently recompiles
    the whole executable (measured +95s per training run on the 8-device
    1-core virtual mesh). One place for the workaround; every mesh training
    path (finetune, pretrain, CE) uses it."""
    committed = tuple(commit_state(t, mesh) for t in trees)
    out_sh = tuple(jax.tree_util.tree_map(lambda x: x.sharding, t)
                   for t in committed) + (NamedSharding(mesh, P()),)
    return committed, out_sh


def prepare_train_step(step_fn, state, mesh: Mesh, donate: bool = True):
    """jit a ``(state, ...) -> (state, metrics)`` step for stable reuse.

    Returns ``(jitted_step, committed_state)``; every call after the first
    is a guaranteed executable reuse (see commit_and_pin)."""
    (state,), out_sh = commit_and_pin(mesh, state)
    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else (),
                     out_shardings=out_sh)
    return jitted, state


def shard_params(params: Any, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch: Any, mesh: Mesh, data_axis: str = "data"):
    return jax.device_put(batch, batch_shardings(batch, mesh, data_axis))
