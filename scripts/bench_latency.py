"""p50 per-step action latency of the jitted navigation step (BASELINE.md
tracks this; the reference publishes no number).

Measures the full per-step device graph (panorama encode + point append +
grid assignment + navigation forward) at eval batch size 1 and at the training
batch size, with chained dependencies so queued dispatches can't hide.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from gridmm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from gridmm_tpu.config import r2r_config
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.train.step import init_carry, nav_device_step
    from gridmm_tpu.train.synthetic import synthetic_trajectory_batch

    cfg = r2r_config()
    import dataclasses
    cfg = dataclasses.replace(
        cfg, shapes=dataclasses.replace(cfg.shapes, max_txt_len=80))
    if "--int8" in sys.argv:
        # serving quantization: int8 trunk matmuls (see ModelConfig)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, int8_matmuls=True))
        print("int8 trunk matmuls ON")
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))

    for b in (1, 4):
        batch = synthetic_trajectory_batch(cfg, batch=b, num_steps=2)
        x = jax.tree_util.tree_map(lambda a: a[0], batch.steps)
        txt = jnp.zeros((b, cfg.shapes.max_txt_len, cfg.model.hidden_size))
        mask = batch.txt_mask
        carry = init_carry(cfg, b)

        step = jax.jit(lambda p, t, m, c, xx: nav_device_step(
            model, cfg, p, t, m, c, xx))
        carry2, out = step(params, txt, mask, carry, x)
        jax.block_until_ready(out.fused_logits)

        lats = []
        for i in range(20):
            t0 = time.perf_counter()
            carry2, out = step(params, txt, mask, carry, x)
            _ = float(out.fused_logits[0, 0])  # hard sync
            lats.append(time.perf_counter() - t0)
        lats = np.asarray(lats) * 1e3
        print(f"batch={b}: p50={np.percentile(lats, 50):.2f} ms  "
              f"p90={np.percentile(lats, 90):.2f} ms")


if __name__ == "__main__":
    main()
