"""Full training-update benchmark (replay fwd+bwd+optax) on the real TPU.

Sweeps batch size x pool implementation (XLA vs Pallas fwd+bwd kernels) and
prints ms/update + episodes/s — the VERDICT round-2 'close the training perf
tail' measurement. Timing per CLAUDE.md: queue iterations with a carried
dependency, sync once with a scalar fetch.
"""

import dataclasses
import sys
import time
import traceback

import jax
import numpy as np

sys.path.insert(0, ".")


def run_one(use_pallas: bool, b: int, steps: int = 15,
            compute_dtype: str = "float32", donate: bool = True) -> None:
    from gridmm_tpu.config import r2r_config
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.train.step import create_train_state, make_train_step
    from gridmm_tpu.train.synthetic import synthetic_trajectory_batch

    cfg = r2r_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model,
                                  use_pallas_grid_pool=use_pallas,
                                  compute_dtype=compute_dtype),
        train=dataclasses.replace(cfg.train, batch_size=b,
                                  max_action_len=steps))
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    state = create_train_state(cfg, params)
    batch = synthetic_trajectory_batch(cfg, batch=b, num_steps=steps)
    batch = jax.device_put(batch)
    rng = jax.random.PRNGKey(1)
    # donation matches train_navigator's production jit (state updates in
    # place); --no-donate isolates its contribution
    step = jax.jit(make_train_step(model, cfg),
                   donate_argnums=(0,) if donate else ())

    state, m = step(state, batch, rng)  # compile
    _ = float(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    _ = float(m["loss"])  # single hard sync after the queue drains
    dt = (time.perf_counter() - t0) / iters
    print(f"pallas_pool={use_pallas} dtype={compute_dtype} B={b} "
          f"donate={donate}: "
          f"{dt*1e3:.1f} ms/update  {b/dt:.1f} eps/s", flush=True)


def main():
    from gridmm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--dtypes", nargs="+", default=["float32"],
                   choices=["float32", "bfloat16"])
    p.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    p.add_argument("--pallas", action="store_true",
                   help="also sweep the Pallas pool variant")
    p.add_argument("--no-donate", action="store_true",
                   help="measure without TrainState donation")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    for use_pallas in ((False, True) if args.pallas else (False,)):
        for dtype in args.dtypes:
            for b in args.batches:
                try:
                    run_one(use_pallas, b, compute_dtype=dtype,
                            donate=not args.no_donate)
                except Exception:
                    print(f"pallas_pool={use_pallas} dtype={dtype} B={b}: "
                          f"FAILED", flush=True)
                    traceback.print_exc()


if __name__ == "__main__":
    main()
