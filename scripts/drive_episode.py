# Drive the framework through its public surface: a full simulated 3-step
# navigation episode — language encode once, then per step: panorama encode,
# point-buffer append, grid assignment, navigation forward -> action logits.
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

import gridmm_tpu
from gridmm_tpu import r2r_config
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
from gridmm_tpu.ops import geometry as G

print("package:", gridmm_tpu.__version__, "| devices:", jax.device_count())
cfg = r2r_config()
model = GridMMNavigator(cfg.model)
rng = np.random.default_rng(0)
B, T, Gm, V = 2, cfg.shapes.max_txt_len, 16, 38

params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"navigator params: {n_params/1e6:.1f}M")

txt_ids = jnp.asarray(rng.integers(1, 30000, (B, T)), jnp.int32)
txt_mask = jnp.arange(T)[None] < jnp.asarray([12, 9])[:, None]
apply = jax.jit(model.apply, static_argnums=(1,))
txt_embeds = apply(params, "language", {"txt_ids": txt_ids, "txt_mask": txt_mask})
print("language out:", txt_embeds.shape)

state = G.PointCloudState.create(B, cfg.grid, cfg.shapes.max_points)
for t in range(3):
    depth = jnp.asarray(rng.integers(0, 18000, (B, 12, 49)), jnp.float32)
    patch_fts = jnp.asarray(rng.standard_normal((B, 588, 768)), jnp.float32) * 0.4
    pos = jnp.asarray(rng.uniform(-4, 4, (B, 2)), jnp.float32)
    heading = jnp.asarray(rng.uniform(-3, 3, (B,)), jnp.float32)
    state = G.append_panorama(state, depth, patch_fts, pos, cfg.grid)
    cells, half_len, grid_pos = G.egocentric_grid_assignment(state, pos, heading, cfg.grid)

    pano, pano_mask = apply(params, "panorama", {
        "view_img_fts": jnp.asarray(rng.standard_normal((B, V, 768)), jnp.float32),
        "loc_fts": jnp.asarray(rng.standard_normal((B, V, 7)), jnp.float32),
        "nav_types": jnp.asarray(rng.integers(0, 2, (B, V)), jnp.int32),
        "view_mask": jnp.ones((B, V), bool)})

    out = apply(params, "navigation", {
        "txt_embeds": txt_embeds, "txt_mask": txt_mask,
        "gmap_img_embeds": jnp.asarray(rng.standard_normal((B, Gm, 768)), jnp.float32),
        "gmap_step_ids": jnp.asarray(rng.integers(0, 5, (B, Gm)), jnp.int32),
        "gmap_pos_fts": jnp.asarray(rng.standard_normal((B, Gm, 7)), jnp.float32),
        "gmap_mask": jnp.broadcast_to(jnp.arange(Gm)[None] < 6, (B, Gm)), "gmap_visited_mask": jnp.broadcast_to(jnp.arange(Gm)[None] < 2, (B, Gm)),
        "vp_img_embeds": jnp.concatenate([jnp.zeros((B,1,768)), pano], 1),
        "vp_pos_fts": jnp.asarray(rng.standard_normal((B, V+1, 14)), jnp.float32),
        "vp_mask": jnp.ones((B, V+1), bool),
        "vp_nav_mask": jnp.broadcast_to(jnp.arange(V+1)[None] < 8, (B, V+1)),
        "grid_fts": state.features, "grid_cells": cells, "gridmap_pos_fts": grid_pos,
        "fused_add_idx": jnp.full((B, Gm), -2, jnp.int32),
        "cand_backtrack_mask": jnp.zeros((B, V+1), bool)})
    fl = out.fused_logits
    act = jnp.argmax(fl, -1)
    print(f"step {t}: points={int(state.count[0])} cells_occupied={int((cells[0]>=0).sum())} "
          f"fused_logits finite={int(jnp.isfinite(fl).sum())}/{fl.size} argmax={np.asarray(act)}")
# valid unvisited slots are 2..5 (driver marks 0,1 visited); those must be finite,
# the rest -inf — exactly the reference's masked_fill semantics.
assert bool(jnp.isfinite(out.fused_logits[:, 2:6]).all()), "unvisited slots must be finite"
assert not bool(jnp.isfinite(out.fused_logits[:, 6:]).any()), "masked slots must be -inf"
assert not bool(jnp.isnan(out.fused_logits).any()), "no NaNs"

# probe: all-points-invalid grid (step-0 zero depth) must not NaN
empty = G.PointCloudState.create(B, cfg.grid, cfg.shapes.max_points)
cells0 = jnp.full((B, cfg.shapes.max_points), -1, jnp.int32)
out0 = apply(params, "navigation", {
    "txt_embeds": txt_embeds, "txt_mask": txt_mask,
    "gmap_img_embeds": jnp.zeros((B, Gm, 768)), "gmap_step_ids": jnp.zeros((B, Gm), jnp.int32),
    "gmap_pos_fts": jnp.zeros((B, Gm, 7)), "gmap_mask": jnp.broadcast_to(jnp.arange(Gm)[None] < 2, (B, Gm)),
    "gmap_visited_mask": jnp.zeros((B, Gm), bool),
    "vp_img_embeds": jnp.zeros((B, V+1, 768)), "vp_pos_fts": jnp.zeros((B, V+1, 14)),
    "vp_mask": jnp.ones((B, V+1), bool), "vp_nav_mask": jnp.broadcast_to(jnp.arange(V+1)[None] < 3, (B, V+1)),
    "grid_fts": empty.features, "grid_cells": cells0, "gridmap_pos_fts": grid_pos,
    "fused_add_idx": jnp.full((B, Gm), -2, jnp.int32),
    "cand_backtrack_mask": jnp.zeros((B, V+1), bool)})
assert bool(jnp.isfinite(out0.fused_logits[:, :2]).all()), "empty grid must stay finite"
print("EMPTY-GRID PROBE OK")
print("EPISODE OK")
