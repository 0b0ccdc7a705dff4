"""AOT serving artifacts for the navigator via `jax.export` (StableHLO).

The reference has no deployment story beyond running the torch model inside
its training stack (the model is rebuilt from source at load time,
map_nav_src/models/vlnbert_init.py:13-63). For TPU serving we export the two
per-episode serving graphs as ahead-of-time StableHLO artifacts:

  * ``language`` — the instruction encoder, run once per episode;
  * ``nav_step`` — the fused per-step graph (panorama encode, point-buffer
    append + egocentric grid assignment, node aggregation, navigation
    forward), the single dispatch the interactive agent issues per action.

An exported artifact is a version-stable byte blob: it carries the lowered
StableHLO, the calling convention (pytree structure, shapes, dtypes) and the
target platforms, and can be deserialized and invoked WITHOUT the model
code or config — only the parameter pytree is needed at call time, so one
artifact serves every checkpoint of the same architecture.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_REGISTERED = False


def register_serving_pytrees() -> None:
    """Register the NamedTuple pytrees crossing the export boundary.

    jax.export needs a stable serialized name per custom pytree node so a
    deserializing process can rebuild the calling convention. Idempotent.
    """
    global _REGISTERED
    if _REGISTERED:
        return
    from jax.export import register_namedtuple_serialization

    from gridmm_tpu.models.navigator import NavOutputs
    from gridmm_tpu.ops.geometry import PointCloudState
    from gridmm_tpu.train.step import NavCarry, StepInputs

    for cls in (StepInputs, NavCarry, PointCloudState, NavOutputs):
        register_namedtuple_serialization(
            cls, serialized_name=f"gridmm_tpu.{cls.__name__}")
    _REGISTERED = True


def zero_step_inputs(cfg, batch: int):
    """Zero-filled per-step StepInputs at the static serving caps (B, ...)."""
    from gridmm_tpu.train.step import StepInputs

    sh, mc, gc = cfg.shapes, cfg.model, cfg.grid
    b, v, g = batch, sh.max_vp_len, sh.max_gmap_len
    d = mc.image_feat_size
    f32, i32 = jnp.float32, jnp.int32
    return StepInputs(
        view_img_fts=jnp.zeros((b, v - 1, d), f32),
        loc_fts=jnp.zeros((b, v - 1, mc.angle_feat_size + 3), f32),
        nav_types=jnp.zeros((b, v - 1), i32),
        view_mask=jnp.zeros((b, v - 1), bool),
        depth=jnp.zeros((b, gc.num_views, gc.patches_per_view), f32),
        patch_fts=jnp.zeros((b, gc.points_per_step, d), f32),
        pos_xy=jnp.zeros((b, 2), f32),
        heading=jnp.zeros((b,), f32),
        gmap_step_ids=jnp.zeros((b, g), i32),
        gmap_pos_fts=jnp.zeros((b, g, mc.angle_feat_size + 3), f32),
        gmap_mask=jnp.zeros((b, g), bool),
        gmap_visited_mask=jnp.zeros((b, g), bool),
        cur_node_idx=jnp.zeros((b,), i32),
        cand_gmap_idx=jnp.full((b, v - 1), -1, i32),
        vp_pos_fts=jnp.zeros((b, v, 2 * mc.angle_feat_size + 6), f32),
        vp_nav_mask=jnp.zeros((b, v), bool),
        fused_add_idx=jnp.full((b, g), -2, i32),
        cand_backtrack_mask=jnp.zeros((b, v), bool),
        target=jnp.zeros((b,), i32),
        grid_target=jnp.zeros((b,), i32),
        vp_obj_mask=jnp.zeros((b, v), bool),
        obj_target=jnp.zeros((b,), i32),
    )


def export_navigator_serving(model, cfg, params, batch: int = 1,
                             platforms: Optional[Sequence[str]] = None):
    """Export {language, nav_step} as `jax.export.Exported` objects.

    Parameters stay a runtime argument (not baked constants), so the
    artifacts are checkpoint-agnostic. `platforms=None` exports for the
    default backend; pass e.g. ("tpu", "cpu") for a multi-platform artifact.
    """
    from gridmm_tpu.serve.engine import serving_cfg
    from gridmm_tpu.train.step import init_carry, nav_device_step

    cfg = serving_cfg(cfg)  # exported graphs keep rows batch-independent
    model = type(model)(cfg.model)

    register_serving_pytrees()

    lang_fn = jax.jit(lambda p, ids, mask: model.apply(
        p, "language", {"txt_ids": ids, "txt_mask": mask}))
    # no donation in the exported artifact: callers that keep the old carry
    # (e.g. beam-style re-expansion) must not have it aliased away; the live
    # agent's jit (train/agent.py:71-74) still donates.
    step_fn = jax.jit(lambda p, txt, mask, carry, x: nav_device_step(
        model, cfg, p, txt, mask, carry, x))

    t = cfg.shapes.max_txt_len
    txt_ids = jnp.zeros((batch, t), jnp.int32)
    txt_mask = jnp.zeros((batch, t), bool)
    txt_embeds = jax.eval_shape(lang_fn, params, txt_ids, txt_mask)
    carry = init_carry(cfg, batch)
    x = zero_step_inputs(cfg, batch)

    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp_lang = jax.export.export(lang_fn, **kw)(params, txt_ids, txt_mask)
    exp_step = jax.export.export(step_fn, **kw)(
        params, txt_embeds, txt_mask, carry, x)
    return {"language": exp_lang, "nav_step": exp_step}


def export_navigator_serving_sharded(model, cfg, params, mesh, batch: int,
                                     platforms: Optional[Sequence[str]] = None,
                                     fsdp: bool = False):
    """Multi-chip serving export: the step graph pjit-ed over a device mesh.

    Parameters follow the parallel/mesh.py rules (Megatron-TP over `model`,
    optional ZeRO-3 over `data`), per-step inputs and the episode carry are
    batch-sharded over the `data` axis. The artifact records the shardings
    and the mesh shape; a deserializing process must run it on the same
    number of devices (jax.export sharded-calling convention). `batch` must
    be divisible by the data-axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gridmm_tpu.parallel.mesh import param_shardings
    from gridmm_tpu.serve.engine import serving_cfg
    from gridmm_tpu.train.step import init_carry, nav_device_step

    cfg = serving_cfg(cfg)  # exported graphs keep rows batch-independent
    model = type(model)(cfg.model)

    register_serving_pytrees()

    data_axis, _ = mesh.axis_names
    dp = mesh.shape[data_axis]
    if batch % dp != 0:
        raise ValueError(f"serving batch {batch} not divisible by "
                         f"data-axis size {dp}")
    pshard = param_shardings(params, mesh, fsdp=fsdp)

    def bshard(tree):
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P(data_axis)), tree)

    t = cfg.shapes.max_txt_len
    txt_ids = jnp.zeros((batch, t), jnp.int32)
    txt_mask = jnp.zeros((batch, t), bool)
    carry = init_carry(cfg, batch)
    x = zero_step_inputs(cfg, batch)
    data_sharding = NamedSharding(mesh, P(data_axis))

    lang_fn = jax.jit(
        lambda p, ids, mask: model.apply(
            p, "language", {"txt_ids": ids, "txt_mask": mask}),
        in_shardings=(pshard, bshard(txt_ids), bshard(txt_mask)))
    step_fn = jax.jit(
        lambda p, txt, mask, c, xx: nav_device_step(
            model, cfg, p, txt, mask, c, xx),
        in_shardings=(pshard, data_sharding,
                      bshard(txt_mask), bshard(carry), bshard(x)))

    # export only traces: abstract avals suffice, nothing runs on device
    txt_embeds = jax.eval_shape(lang_fn, params, txt_ids, txt_mask)

    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp_lang = jax.export.export(lang_fn, **kw)(params, txt_ids, txt_mask)
    exp_step = jax.export.export(step_fn, **kw)(
        params, txt_embeds, txt_mask, carry, x)
    return {"language": exp_lang, "nav_step": exp_step}


def save_serving_bundle(exports: dict, out_dir: str, cfg=None,
                        extra_manifest: Optional[dict] = None) -> dict:
    """Serialize exported graphs to `<out_dir>/<name>.jaxexport` + manifest."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = {"jax_version": jax.__version__, "artifacts": {}}
    for name, exp in exports.items():
        fname = f"{name}.jaxexport"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        manifest["artifacts"][name] = {
            "file": fname,
            "platforms": list(exp.platforms),
            "num_args": len(exp.in_avals),
            "nr_devices": exp.nr_devices,
        }
    if cfg is not None:
        manifest["model"] = {
            "hidden_size": cfg.model.hidden_size,
            "num_l_layers": cfg.model.num_l_layers,
            "num_x_layers": cfg.model.num_x_layers,
            "image_feat_size": cfg.model.image_feat_size,
            "max_txt_len": cfg.shapes.max_txt_len,
            "max_gmap_len": cfg.shapes.max_gmap_len,
            "max_vp_len": cfg.shapes.max_vp_len,
            "max_points": cfg.shapes.max_points,
        }
    if extra_manifest:
        manifest.update(extra_manifest)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(path: str):
    """Deserialize one artifact; invoke via `.call(*args)` under jit."""
    register_serving_pytrees()
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))
