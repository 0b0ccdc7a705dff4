"""Per-step latency of the full-scale continuous-env (VLN-CE) policy.

Times complete `CEAgent.rollout` steps on the real device — per step that is
ONE fused dispatch (ResNet50+ddppo waypoint towers + TRM + NMS + top_k
candidate extraction, CLIP ViT-B/32 grid tokens, optional timm ViT-B/16 view
cls, step assembly, navigation forward; ce/device_step.py) plus the host env
move, i.e. the number a VLN-CE user actually experiences per action.
--legacy measures the previous two-dispatch host-assembly path. The
reference publishes no step-latency figure (ss_trainer_GridMap.py drives the
same stack per step).

Through the tunneled dev chip every dispatch carries a ~10-30 ms RPC floor;
whole-rollout timing amortizes it across the episode's steps the same way the
reference's episode loop would.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from gridmm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 4])
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--view_tower", action="store_true",
                   help="include the timm ViT-B/16 view encoder")
    p.add_argument("--breakdown", action="store_true",
                   help="attribute per-step time to rollout phases "
                        "(fused: transfer/fused_step/env_step; legacy: "
                        "transfer/perception/candidates/build_step/nav/"
                        "env_step)")
    p.add_argument("--legacy", action="store_true",
                   help="use the two-dispatch host-assembly rollout path")
    args = p.parse_args()

    from gridmm_tpu.ce.env import SyntheticContinuousEnv
    from gridmm_tpu.ce.factory import build_ce_agent

    _, agent = build_ce_agent(tiny=False, view_tower=args.view_tower,
                              img=224)
    agent.fused_rollout = not args.legacy
    for b in args.batches:
        env = SyntheticContinuousEnv(num_envs=b, image_size=224,
                                     depth_size=256, seed=0)
        agent.rollout(env, max_steps=args.steps, feedback="argmax")  # compile
        per_step = []
        for _ in range(args.rounds):
            steps = []
            t0 = time.perf_counter()
            agent.rollout(env, max_steps=args.steps, feedback="argmax",
                          on_step=lambda t, obs: steps.append(t))
            # an episode that stops after k hook calls ran k policy steps
            per_step.append(
                (time.perf_counter() - t0) * 1e3 / max(len(steps), 1))
        lat = float(np.percentile(per_step, 50))
        print(f"batch={b}: p50 step={lat:.1f} ms  "
              f"({12 * b * 1e3 / lat:.0f} frames/s)")
        if args.breakdown:
            from gridmm_tpu.utils.logging import SectionTimer

            timer = SectionTimer()
            agent.rollout(env, max_steps=args.steps, feedback="argmax",
                          timer=timer)
            for k, v in sorted(timer.summary().items(),
                               key=lambda kv: -kv[1]):
                print(f"  {k:<12} {v * 1e3:7.1f} ms/step")


if __name__ == "__main__":
    main()
