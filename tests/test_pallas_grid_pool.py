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


def _rand_case(b=2, n=1024, d=256, invalid=0.25, seed=5):
    rng = np.random.default_rng(seed)
    fts = (rng.standard_normal((b, n, d)) * 0.5).astype(np.float32)
    cells = rng.integers(0, 196, size=(b, n)).astype(np.int32)
    cells[rng.random((b, n)) < invalid] = -1
    w = (rng.standard_normal((b, n)) * 2.0).astype(np.float32)
    return fts, cells, w


def test_pallas_backward_matches_xla_vjp():
    """The analytic Pallas backward (grid_pool_kernel.pallas_grid_pool_bwd)
    must equal the autodiff VJP of the XLA formulation for both inputs."""
    import jax

    from gridmm_tpu.ops.pallas.grid_pool_kernel import (pallas_grid_pool_bwd,
                                                        pallas_grid_pool_raw)

    fts, cells, w = _rand_case()
    b, n, d = fts.shape
    cot = np.random.default_rng(7).standard_normal(
        (b, 196, d)).astype(np.float32)

    _, vjp = jax.vjp(
        lambda f, ww: grid_scatter_pool(f, jnp.asarray(cells), ww, 196)[0],
        jnp.asarray(fts), jnp.asarray(w))
    want_df, want_dw = vjp(jnp.asarray(cot))

    _, _, denom = pallas_grid_pool_raw(
        jnp.asarray(fts), jnp.asarray(cells), jnp.asarray(w),
        chunk=256, interpret=True)
    got_df, got_dw = pallas_grid_pool_bwd(
        jnp.asarray(fts), jnp.asarray(cells), jnp.asarray(w), denom,
        jnp.asarray(cot), chunk=256, interpret=True)

    np.testing.assert_allclose(np.asarray(got_df), np.asarray(want_df),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(want_dw),
                               atol=3e-5)


def test_pallas_custom_vjp_grad_through_loss():
    """End-to-end: jax.grad through grid_scatter_pool_pallas equals grad
    through the XLA pool on a scalar loss (custom_vjp wiring + padding)."""
    import jax

    from gridmm_tpu.ops.grid_pool import grid_scatter_pool_pallas

    # N=588 is NOT 16-divisible -> exercises the pad-to-512 path too
    for n in (1024, 588):
        fts, cells, w = _rand_case(b=2, n=n, d=128, seed=11)

        def loss_pallas(f, ww):
            p, _ = grid_scatter_pool_pallas(f, jnp.asarray(cells), ww)
            return jnp.sum(p * p) + jnp.sum(p)

        def loss_xla(f, ww):
            p, _ = grid_scatter_pool(f, jnp.asarray(cells), ww, 196)
            return jnp.sum(p * p) + jnp.sum(p)

        g1 = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(fts),
                                                jnp.asarray(w))
        # interpret mode reaches the kernels through the public wrapper via
        # the CPU backend (tests/conftest forces cpu)
        import gridmm_tpu.ops.pallas.grid_pool_kernel as K
        orig_raw, orig_bwd = K.pallas_grid_pool_raw, K.pallas_grid_pool_bwd
        K.pallas_grid_pool_raw = lambda *a, **kw: orig_raw(
            *a, **{**kw, "interpret": True})
        K.pallas_grid_pool_bwd = lambda *a, **kw: orig_bwd(
            *a, **{**kw, "interpret": True})
        try:
            g2 = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(fts),
                                                       jnp.asarray(w))
        finally:
            K.pallas_grid_pool_raw, K.pallas_grid_pool_bwd = orig_raw, orig_bwd

        np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                                   atol=5e-5)


def test_pallas_backward_empty_and_single_point_cells():
    """Empty cells contribute zero grads; a single-point cell's dw is ~0
    (softmax over one element is constant)."""
    import jax

    from gridmm_tpu.ops.pallas.grid_pool_kernel import (pallas_grid_pool_bwd,
                                                        pallas_grid_pool_raw)

    b, n, d = 1, 512, 128
    fts = np.ones((b, n, d), np.float32)
    cells = np.full((b, n), -1, np.int32)
    cells[0, 0] = 3          # single-point cell
    cells[0, 1:4] = 7        # multi-point cell
    w = np.linspace(-1, 1, n).reshape(b, n).astype(np.float32)
    cot = np.ones((b, 196, d), np.float32)

    _, _, denom = pallas_grid_pool_raw(
        jnp.asarray(fts), jnp.asarray(cells), jnp.asarray(w),
        chunk=256, interpret=True)
    df, dw = pallas_grid_pool_bwd(
        jnp.asarray(fts), jnp.asarray(cells), jnp.asarray(w), denom,
        jnp.asarray(cot), chunk=256, interpret=True)
    df, dw = np.asarray(df), np.asarray(dw)
    assert np.all(np.isfinite(df)) and np.all(np.isfinite(dw))
    np.testing.assert_allclose(dw[0, 0], 0.0, atol=1e-5)   # singleton cell
    np.testing.assert_allclose(df[0, 4:], 0.0, atol=0)     # invalid points
    np.testing.assert_allclose(dw[0, 4:], 0.0, atol=0)
    np.testing.assert_allclose(df[0, 0], 1.0, atol=1e-6)   # p=1 * cot=1
