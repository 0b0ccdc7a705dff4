"""Multi-task pretraining driver (MLM/MRC/SAP[/OG]).

Equivalent of pretrain_src/train_r2r.py:70-333: task-multiplexed training with
periodic task-accuracy validation. Data: synthetic trajectory batches (smoke /
benchmark) or a trajectory-jsonl loader for the reference's pretrain_map files.

  python -m gridmm_tpu.cli.pretrain --steps 20 --valid_every 10
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tasks", default="mlm,mrc,sap")
    p.add_argument("--mix_ratio", default="1,1,1")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--valid_every", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_traj_steps", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", default="runs/pretrain")
    p.add_argument("--full", action="store_true",
                   help="full r2r dims (default: tiny smoke dims)")
    return p.parse_args(argv)


def validate(model, params, batches, tasks):
    """Task accuracies (train_r2r.py:355-448 validate_{mlm,mrc,sap})."""
    from gridmm_tpu.models.pretrain import GridMMPretrain
    from gridmm_tpu.train.pretrain import _enc_kwargs

    out = {}
    for task in tasks:
        accs = []
        for batch in batches:
            if task == "mlm":
                logits = model.apply(
                    params, batch.txt_ids, batch.txt_mask, _enc_kwargs(batch),
                    method=GridMMPretrain.forward_mlm_logits)
                sel = batch.txt_labels != -1
                pred = jnp.argmax(logits, -1)
                correct = (pred == batch.txt_labels) & sel
                accs.append(float(correct.sum()) / max(float(sel.sum()), 1))
            elif task == "mrc":
                enc = model.apply(params, batch.txt_ids, batch.txt_mask,
                                  method=GridMMPretrain.encode,
                                  **_enc_kwargs(batch))
                logits = model.apply(params, enc,
                                     method=GridMMPretrain.forward_mrc_logits)
                sel = batch.view_mrc_masks
                pred = jnp.argmax(logits, -1)
                tgt = jnp.argmax(batch.view_probs, -1)
                correct = (pred == tgt) & sel
                accs.append(float(correct.sum()) / max(float(sel.sum()), 1))
            elif task == "sap":
                enc = model.apply(params, batch.txt_ids, batch.txt_mask,
                                  method=GridMMPretrain.encode,
                                  **_enc_kwargs(batch))
                g, l, f, gr = model.apply(
                    params, enc, batch.gmap_mask, batch.gmap_visited_mask,
                    batch.vp_nav_mask, batch.fused_add_idx,
                    batch.cand_backtrack_mask,
                    method=GridMMPretrain.forward_sap_logits)
                out[f"sap_gacc"] = float(
                    (jnp.argmax(g, -1) == batch.global_act_labels).mean())
                out[f"sap_lacc"] = float(
                    (jnp.argmax(l, -1) == batch.local_act_labels).mean())
                accs.append(float(
                    (jnp.argmax(f, -1) == batch.global_act_labels).mean()))
        out[f"{task}_acc"] = float(np.mean(accs)) if accs else 0.0
    return out


def main(argv=None):
    args = parse_args(argv)
    from gridmm_tpu.models.pretrain import GridMMPretrain
    from gridmm_tpu.train.pretrain import (TaskMultiplexer,
                                           init_pretrain_params,
                                           make_pretrain_step)
    from gridmm_tpu.train.step import create_train_state
    from gridmm_tpu.train.synthetic import synthetic_pretrain_batch
    from gridmm_tpu.utils.logging import MetricLogger

    from gridmm_tpu.config import r2r_config, tiny_config

    if args.full:
        cfg = r2r_config()
    else:
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, image_prob_size=32))
    tasks = args.tasks.split(",")
    mix = [float(x) for x in args.mix_ratio.split(",")]

    model = GridMMPretrain(cfg.model)
    train_batches = [synthetic_pretrain_batch(
        cfg, args.batch_size, args.num_traj_steps, seed=args.seed + i)
        for i in range(4)]
    val_batches = [synthetic_pretrain_batch(
        cfg, args.batch_size, args.num_traj_steps, seed=args.seed + 100)]
    params = init_pretrain_params(model, cfg, jax.random.PRNGKey(args.seed),
                                  train_batches[0])
    # warmup + linear decay, the reference pretraining schedule
    # (pretrain_src/optim/sched.py warmup_linear)
    from gridmm_tpu.train.optimizers import (build_optimizer,
                                             warmup_linear_schedule)

    sched = warmup_linear_schedule(
        cfg.train.lr, min(cfg.train.warmup_steps, max(args.steps // 10, 1)),
        max(cfg.train.num_train_steps, args.steps))
    tx = build_optimizer("adamw", cfg.train, sched)
    state = create_train_state(cfg, params, tx)
    steps = {t: make_pretrain_step(model, cfg, t, tx) for t in tasks}
    mux = iter(TaskMultiplexer(tasks, mix, seed=args.seed))
    logger = MetricLogger(args.output_dir)
    rng = jax.random.PRNGKey(args.seed + 1)

    for it in range(1, args.steps + 1):
        task = next(mux)
        batch = train_batches[it % len(train_batches)]
        state, metrics = steps[task](state, batch, rng)
        logger.log(it, {k: float(v) for k, v in metrics.items()},
                   prefix="pretrain/")
        if it % args.valid_every == 0 or it == args.steps:
            acc = validate(model, state.params, val_batches, tasks)
            logger.log(it, acc, prefix="valid/")
            print(json.dumps({"step": it, **acc}))
    return state


if __name__ == "__main__":
    main()
