"""Headline benchmark: panorama-views/sec/chip for CLIP ViT encode + depth
back-projection + grid scatter-pool (BASELINE.md north star: >=5000 on v5e).

Pipeline per iteration (mirrors the reference's per-viewpoint hot path,
preprocess/get_map_feature.py:109-137 + map_nav_src/r2r/env.py:267-374 +
models/vilmodel.py:788-824, all fused on device):
  12 views x 224x224 RGB -> CLIP ViT-B/32 (all 50 tokens)
  -> patch tokens into the episode point buffer (depth back-projection)
  -> egocentric grid assignment over the FULL buffer
  -> instruction-relevance scatter-pool into 196 cells.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 5000 (the driver-set target; the reference repo
publishes no numbers — BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gridmm_tpu.utils.compile_cache import enable_persistent_cache
    from gridmm_tpu.utils.tpu_probe import ensure_live_backend
    # the tunneled dev chip can be down for hours, and a dead tunnel hangs
    # backend init forever — probe in a bounded subprocess and degrade to
    # CPU so an unattended bench run always emits its JSON line
    ensure_live_backend()
    enable_persistent_cache()
    from gridmm_tpu.config import r2r_config
    from gridmm_tpu.models.clip_vit import ClipVisionTransformer, clip_b32
    from gridmm_tpu.ops import geometry as G
    from gridmm_tpu.ops.grid_pool import relevance_weighted_grid

    backend = jax.default_backend()
    # pallas/int8 paths are TPU-specific ("axon" is the hosted TPU plugin);
    # GPU must take the XLA fallback
    on_tpu = backend in ("tpu", "axon")

    import dataclasses

    cfg = r2r_config()
    gc = cfg.grid
    # serving precision: int8 projections/MLP + compute-dtype attention scores
    ccfg = (dataclasses.replace(clip_b32(), int8_matmuls=True,
                                attn_scores_f32=False)
            if on_tpu else clip_b32().__class__(
                patch_size=32, layers=2, compute_dtype="float32"))

    B = 16 if on_tpu else 2           # panoramas per iteration (16 is the
                                      # measured sweet spot on v5e)
    V = gc.num_views                  # 12 views each
    T = 48                            # instruction tokens
    D = 768
    rng = np.random.default_rng(0)

    from gridmm_tpu.models.clip_vit import normalize_images

    model = ClipVisionTransformer(ccfg)
    # realistic input: uint8 camera frames; normalization is part of the
    # measured pipeline (the real extractor pays it)
    images = jnp.asarray(rng.integers(
        0, 256, (B * V, 224, 224, 3)).astype(np.uint8))
    params = model.init(jax.random.PRNGKey(0),
                        normalize_images(images[:1]))

    txt = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32) * 0.3)
    wt = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.02)
    bt = jnp.zeros((D,), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.02)
    bg = jnp.zeros((D,), jnp.float32)

    # bf16 point buffer: quarters the pool's HBM traffic (reference stores
    # grid features as fp16; precision is reference-consistent)
    state0 = G.PointCloudState.create(
        B, gc, cfg.shapes.max_points,
        feature_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    depth = jnp.asarray(rng.integers(
        0, 18000, (B, V, gc.patches_per_view)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-4, 4, (B, 2)).astype(np.float32))
    heading = jnp.asarray(rng.uniform(-3, 3, (B,)).astype(np.float32))

    from gridmm_tpu.ops.grid_pool import (grid_scatter_pool,
                                          grid_scatter_pool_pallas,
                                          instruction_relevance)

    import functools

    # donate the point buffer: the in-place dynamic_update_slice then runs
    # without a full-buffer copy per step
    @functools.partial(jax.jit, donate_argnums=(2,))
    def pipeline(params, images, state, depth, pos, heading, txt):
        tokens = model.apply(params, normalize_images(images))  # (B*V, 50, 768)
        patch = tokens[:, 1:, :].reshape(B, V * gc.patches_per_view, D)
        # project + score only the NEW points (project-at-insertion; the
        # reference reprojects the whole cloud per step). bf16 matmuls match
        # the buffer precision (reference stores grid features in fp16).
        ct = jnp.bfloat16 if on_tpu else jnp.float32
        proj_txt = txt.astype(ct) @ wt.astype(ct) + bt.astype(ct)
        w_new = instruction_relevance(
            patch.astype(ct), proj_txt).astype(jnp.float32)
        g_new = patch.astype(ct) @ wg.astype(ct) + bg.astype(ct)
        state = G.append_panorama(state, depth, g_new, pos, gc, w_new)
        cells, _, pos_fts = G.egocentric_grid_assignment(state, pos, heading, gc)
        if on_tpu:
            pooled, mask = grid_scatter_pool_pallas(
                state.features, cells, state.weights)
        else:
            pooled, mask = grid_scatter_pool(state.features, cells,
                                             state.weights)
        return state, pooled, mask

    # fill the buffer so assignment+pool run at steady-state capacity
    state = state0
    for _ in range(gc.max_steps - 1):
        state, pooled, mask = pipeline(params, images, state, depth, pos, heading, txt)
    jax.block_until_ready(pooled)

    iters = 20 if on_tpu else 3
    # steady state: keep appending against the FILLED buffer (the write
    # offset clamps at capacity, so every iteration still pays the full
    # assignment + pool); carrying the donated state chains the iterations,
    # which also makes the final block_until_ready a real sync through the
    # tunnel (CLAUDE.md gotcha: unchained dispatches don't synchronize)
    start = time.perf_counter()
    for _ in range(iters):
        state, pooled, mask = pipeline(params, images, state, depth, pos, heading, txt)
    jax.block_until_ready(pooled)
    elapsed = time.perf_counter() - start

    views_per_sec = B * V * iters / elapsed
    target = 5000.0
    record = {
        "metric": "panorama_views_per_sec_per_chip",
        "value": round(views_per_sec, 2),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / target, 4),
    }
    record["backend"] = backend
    if backend == "cpu":
        # distinguish a degraded run (dead tunnel -> CPU fallback, tiny
        # 2-layer config) from a genuine TPU regression; a GPU backend is a
        # healthy accelerator taking the XLA fallback path, not a dead tunnel
        record["note"] = "accelerator unreachable; CPU fallback, not the TPU figure"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
