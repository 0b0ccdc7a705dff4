"""Train/evaluate the continuous-environment (VLN-CE) GridMap policy.

Equivalent of VLN_CE/run.py + run_GridMap.bash. Habitat-backed environments
plug in through the ContinuousEnv protocol when habitat is installed; the
synthetic arena runs anywhere.

  python -m gridmm_tpu.cli.run_ce --run-type train --epochs 2
  python -m gridmm_tpu.cli.run_ce --run-type eval
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-type", choices=["train", "eval"], default="train")
    p.add_argument("--env", choices=["synthetic", "habitat"],
                   default="synthetic")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batches_per_epoch", type=int, default=2)
    p.add_argument("--num_envs", type=int, default=2)
    p.add_argument("--max_steps", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", default="runs/ce")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from gridmm_tpu.ce.factory import build_ce_agent
    from gridmm_tpu.ce.env import SyntheticContinuousEnv
    from gridmm_tpu.ce.trainer import CETrainer
    from gridmm_tpu.utils.logging import MetricLogger

    cfg, agent = build_ce_agent()
    if args.env == "habitat":
        raise SystemExit(
            "habitat-sim is not installed in this image; implement a "
            "ContinuousEnv adapter over habitat VectorEnv to use real scenes")
    env = SyntheticContinuousEnv(num_envs=args.num_envs, image_size=56,
                                 depth_size=256, seed=args.seed)
    trainer = CETrainer(cfg, agent)
    logger = MetricLogger(args.output_dir)

    if args.run_type == "train":
        for ep in range(args.epochs):
            stats = trainer.train_epoch(env, ep,
                                        batches=args.batches_per_epoch,
                                        max_steps=args.max_steps,
                                        logger=logger, seed=args.seed)
            print(json.dumps({"epoch": ep, **stats}))
    metrics = trainer.evaluate(env, batches=1, max_steps=args.max_steps)
    print(json.dumps({"eval": metrics}))
    return metrics


if __name__ == "__main__":
    main()
