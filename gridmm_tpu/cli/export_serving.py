"""Export AOT serving artifacts (StableHLO) for the GridMM navigator.

The deployment counterpart of cli/main_nav.py: given a dataset preset and a
checkpoint, writes `language.jaxexport` + `nav_step.jaxexport` + a manifest —
ahead-of-time compiled serving graphs that a host can deserialize and call
without the model code (see gridmm_tpu/utils/export.py). Examples:

  # tiny smoke export for the current backend
  python -m gridmm_tpu.cli.export_serving --tiny --out_dir /tmp/bundle

  # flagship R2R graphs for TPU serving, weights from a released torch ckpt
  python -m gridmm_tpu.cli.export_serving --config r2r \
      --navigator_ckpt grid_map.pt --platforms tpu,cpu --out_dir bundle/
"""

from __future__ import annotations

import argparse
import dataclasses

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", choices=["r2r", "reverie", "soon", "rxr"],
                   default="r2r")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model dims (tests/smoke)")
    p.add_argument("--batch", type=int, default=1,
                   help="static serving batch of the exported step graph")
    p.add_argument("--max_action_len", type=int, default=None,
                   help="episode-length cap; sizes the exported point buffer")
    p.add_argument("--int8", action="store_true",
                   help="int8 MXU trunk matmuls in the exported graphs "
                        "(weight-streaming serving; validate accuracy "
                        "per-checkpoint)")
    p.add_argument("--mesh", choices=["auto"], default=None,
                   help="export the graphs pjit-ed over the device mesh "
                        "(multi-chip serving; records shardings + device "
                        "count in the artifact)")
    p.add_argument("--mp_size", type=int, default=1,
                   help="model-axis (tensor-parallel) size of --mesh auto")
    p.add_argument("--fsdp", action="store_true",
                   help="additionally shard params over the data axis "
                        "(ZeRO-3 style) in the exported graphs")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. 'tpu,cpu' "
                        "(default: current backend only)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--resume", default=None, help="orbax checkpoint path")
    p.add_argument("--navigator_ckpt", default=None,
                   help="released torch checkpoint (grid_map/finetune format)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from gridmm_tpu import config as C
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.utils.export import (export_navigator_serving,
                                         save_serving_bundle)

    cfg = C.tiny_config() if args.tiny else {
        "r2r": C.r2r_config, "reverie": C.reverie_config,
        "soon": C.soon_config, "rxr": C.rxr_config}[args.config]()
    if args.int8:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, int8_matmuls=True))
    if args.max_action_len:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, max_action_len=args.max_action_len),
            shapes=dataclasses.replace(
                cfg.shapes,
                max_points=args.max_action_len * cfg.grid.points_per_step))

    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(args.seed))
    if args.navigator_ckpt:
        import torch

        from gridmm_tpu.utils import checkpoint as CK

        sd = torch.load(args.navigator_ckpt, map_location="cpu",
                        weights_only=False)
        sd = CK.remap_ce_released(sd)
        params, report = CK.import_torch_navigator(
            sd, params,
            num_l_layers=cfg.model.num_l_layers,
            num_x_layers=cfg.model.num_x_layers,
            num_pano_layers=cfg.model.num_pano_layers,
            has_obj=cfg.model.obj_feat_size > 0)
        CK.require_navigator_coverage(report, what="serving navigator")
    elif args.resume:
        import os

        from gridmm_tpu.utils.checkpoint import restore_checkpoint
        params = restore_checkpoint(os.path.abspath(args.resume), params)

    platforms = args.platforms.split(",") if args.platforms else None
    if args.mesh:
        from gridmm_tpu.config import MeshConfig
        from gridmm_tpu.parallel.mesh import make_mesh
        from gridmm_tpu.utils.export import export_navigator_serving_sharded

        mesh = make_mesh(MeshConfig(mp_size=args.mp_size))
        exports = export_navigator_serving_sharded(
            model, cfg, params, mesh, batch=args.batch,
            platforms=platforms, fsdp=args.fsdp)
        mesh_manifest = {"mesh": dict(mesh.shape)}
    else:
        exports = export_navigator_serving(
            model, cfg, params, batch=args.batch, platforms=platforms)
        mesh_manifest = {}
    manifest = save_serving_bundle(
        exports, args.out_dir, cfg=cfg,
        extra_manifest={"batch": args.batch,
                        "config": "tiny" if args.tiny else args.config,
                        "int8": bool(args.int8),
                        **mesh_manifest})
    import json
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
