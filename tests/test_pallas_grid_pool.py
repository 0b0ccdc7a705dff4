"""Pallas grid-pool kernel vs the XLA reference implementation (interpret mode
on CPU; compiled path is exercised on real TPU by bench.py)."""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ops.grid_pool import grid_scatter_pool  # noqa: E402
from gridmm_tpu.ops.pallas.grid_pool_kernel import pallas_grid_pool  # noqa: E402

RNG = np.random.default_rng(3)


def test_pallas_matches_xla():
    b, n, d = 2, 1024, 256
    fts = (RNG.standard_normal((b, n, d)) * 0.5).astype(np.float32)
    cells = RNG.integers(0, 196, size=(b, n)).astype(np.int32)
    cells[RNG.random((b, n)) < 0.25] = -1
    w = (RNG.standard_normal((b, n)) * 2.0).astype(np.float32)

    want_p, want_m = grid_scatter_pool(
        jnp.asarray(fts), jnp.asarray(cells), jnp.asarray(w))
    got_p, got_m = pallas_grid_pool(
        jnp.asarray(fts), jnp.asarray(cells), jnp.asarray(w),
        chunk=256, interpret=True)

    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               atol=2e-5)


def test_pallas_all_invalid():
    b, n, d = 1, 512, 128
    fts = np.ones((b, n, d), np.float32)
    cells = np.full((b, n), -1, np.int32)
    w = np.zeros((b, n), np.float32)
    p, m = pallas_grid_pool(jnp.asarray(fts), jnp.asarray(cells),
                            jnp.asarray(w), chunk=256, interpret=True)
    assert not bool(np.asarray(m).any())
    np.testing.assert_allclose(np.asarray(p), 0.0, atol=0)
