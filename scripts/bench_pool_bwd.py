"""Grid-pool forward+backward microbenchmark: XLA formulation vs the Pallas
kernels (fwd + analytic bwd), at the training replay shape.

Run on the real TPU (the hosted plugin is the default backend). Timing per
CLAUDE.md: queue many chained iterations, sync once with a scalar fetch.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gridmm_tpu.ops.grid_pool import (grid_scatter_pool,  # noqa: E402
                                      grid_scatter_pool_pallas)


def bench(fn, args, iters=30, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        args = (args[0] * 0.999 + 0.001 * args[0],) + args[1:]  # chain dep
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from gridmm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    for b, steps in ((8, 15), (16, 15), (32, 15)):
        n, d = steps * 588, 768
        fts = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
        cells = rng.integers(-1, 196, size=(b, n)).astype(np.int32)
        cells_j = jnp.asarray(cells)
        w = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)

        def loss_xla(f, ww):
            p, _ = grid_scatter_pool(f, cells_j, ww, 196)
            return jnp.sum(p * p)

        def loss_pal(f, ww):
            p, _ = grid_scatter_pool_pallas(f, cells_j, ww)
            return jnp.sum(p * p)

        fwd_x = jax.jit(lambda f, ww: grid_scatter_pool(f, cells_j, ww, 196)[0])
        fwd_p = jax.jit(lambda f, ww: grid_scatter_pool_pallas(f, cells_j, ww)[0])
        fb_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))
        fb_p = jax.jit(jax.grad(loss_pal, argnums=(0, 1)))

        r = {
            "fwd_xla": bench(fwd_x, (fts, w)),
            "fwd_pallas": bench(fwd_p, (fts, w)),
            "fwdbwd_xla": bench(fb_x, (fts, w)),
            "fwdbwd_pallas": bench(fb_p, (fts, w)),
        }
        # correctness spot check on device
        gx = fb_x(fts, w)
        gp = fb_p(fts, w)
        err = max(float(jnp.max(jnp.abs(gx[0] - gp[0]))),
                  float(jnp.max(jnp.abs(gx[1] - gp[1]))))
        print(f"B={b} N={n}: " + "  ".join(f"{k}={v:.2f}ms"
                                           for k, v in r.items())
              + f"  max_grad_err={err:.2e}")


if __name__ == "__main__":
    main()
