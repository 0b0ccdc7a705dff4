"""Golden tests: the fused scatter-pool vs the reference's pooling loop."""

import numpy as np
import jax.numpy as jnp

from gridmm_tpu.ops.grid_pool import (
    grid_scatter_pool,
    instruction_relevance,
    relevance_weighted_grid,
)

import reference_impl as R

RNG = np.random.default_rng(1)


def _random_case(n=600, t=24, d=768, empty_frac=0.3):
    fts = RNG.standard_normal((n, d)).astype(np.float32) * 0.5
    cells = RNG.integers(0, 196, size=(n,)).astype(np.int32)
    invalid = RNG.random(n) < 0.2
    cells_f = cells.astype(np.float64)
    cells_f[invalid] = -1
    cells[invalid] = -1
    txt = RNG.standard_normal((t, d)).astype(np.float32) * 0.5
    wt = RNG.standard_normal((d, d)).astype(np.float32) * 0.02
    bt = RNG.standard_normal((d,)).astype(np.float32) * 0.02
    wg = RNG.standard_normal((d, d)).astype(np.float32) * 0.02
    bg = RNG.standard_normal((d,)).astype(np.float32) * 0.02
    return fts, cells, cells_f, txt, wt, bt, wg, bg


def test_scatter_pool_matches_reference_loop():
    fts, cells, cells_f, txt, wt, bt, wg, bg = _random_case()

    want, want_mask = R.ref_cell_pooling(fts, cells_f, txt, wt, bt, wg, bg)

    pooled, mask = relevance_weighted_grid(
        jnp.asarray(fts)[None], jnp.asarray(cells)[None], jnp.asarray(txt)[None],
        jnp.asarray(wt), jnp.asarray(bt), jnp.asarray(wg), jnp.asarray(bg))

    np.testing.assert_array_equal(np.asarray(mask[0]), want_mask.astype(bool))
    np.testing.assert_allclose(np.asarray(pooled[0]), want, atol=2e-4)


def test_relevance_unmasked_matches_reference():
    fts, cells, cells_f, txt, wt, bt, wg, bg = _random_case(n=50, t=8, d=32)
    proj = txt @ wt + bt
    got = instruction_relevance(jnp.asarray(fts)[None], jnp.asarray(proj)[None])
    want = (fts @ proj.T).max(axis=-1)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=1e-4)


def test_empty_and_full_cells():
    d = 16
    fts = np.ones((4, d), np.float32)
    cells = np.array([3, 3, -1, 7], np.int32)
    w = np.array([0.0, 1.0, 5.0, 2.0], np.float32)
    pooled, mask = grid_scatter_pool(
        jnp.asarray(fts)[None], jnp.asarray(cells)[None], jnp.asarray(w)[None],
        num_cells=196)
    mask = np.asarray(mask[0])
    pooled = np.asarray(pooled[0])
    assert mask[3] and mask[7] and not mask[0] and mask.sum() == 2
    # cell 3: softmax over two identical feature rows -> still ones
    np.testing.assert_allclose(pooled[3], np.ones(d), atol=1e-6)
    np.testing.assert_allclose(pooled[7], np.ones(d), atol=1e-6)
    np.testing.assert_allclose(pooled[0], np.zeros(d), atol=0)


def test_batched_independence():
    fts, cells, _, txt, wt, bt, wg, bg = _random_case(n=128, t=8, d=64)
    fts2, cells2, _, txt2, *_ = _random_case(n=128, t=8, d=64)
    batched_p, batched_m = relevance_weighted_grid(
        jnp.stack([fts, fts2]), jnp.stack([cells, cells2]),
        jnp.stack([txt, txt2]),
        jnp.asarray(wt), jnp.asarray(bt), jnp.asarray(wg), jnp.asarray(bg))
    single_p, single_m = relevance_weighted_grid(
        jnp.asarray(fts2)[None], jnp.asarray(cells2)[None], jnp.asarray(txt2)[None],
        jnp.asarray(wt), jnp.asarray(bt), jnp.asarray(wg), jnp.asarray(bg))
    np.testing.assert_allclose(
        np.asarray(batched_p[1]), np.asarray(single_p[0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(batched_m[1]), np.asarray(single_m[0]))
