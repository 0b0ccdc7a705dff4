"""Run a full evaluation epoch on the procedurally generated synthetic world.

The no-real-data equivalent of `main_nav.py --test` (map_nav_src/main_nav.py:218-262):
build env + agent, roll out greedy episodes, print SR/SPL/nDTW/... table.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/run_synthetic_eval.py [--teacher]
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from tests.test_agent_e2e import build_all  # reuse the tiny-config builder


def main():
    feedback = "teacher" if "--teacher" in sys.argv else "argmax"
    cfg, env, model, params, agent = build_all(seed=1)
    t0 = time.time()
    if feedback == "argmax":
        avg, preds = agent.evaluate(num_batches=3)
    else:
        env.reset_epoch(shuffle=False)
        preds = {}
        for _ in range(3):
            traj, _, _ = agent.rollout(feedback="teacher")
            for item in traj:
                preds.setdefault(item["instr_id"], {
                    "instr_id": item["instr_id"],
                    "trajectory": item["trajectory"]})
        avg, _ = env.eval_metrics(list(preds.values()))
        preds = list(preds.values())
    dt = time.time() - t0
    print(f"policy={feedback}  episodes={len(preds)}  wall={dt:.1f}s")
    for k in ("sr", "oracle_sr", "spl", "nDTW", "SDTW", "CLS",
              "nav_error", "lengths", "steps"):
        print(f"  {k:>12}: {avg[k]:.2f}")


if __name__ == "__main__":
    main()
