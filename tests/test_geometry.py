"""Golden tests: gridmm_tpu.ops.geometry vs the numpy oracle."""

import math

import numpy as np
import jax.numpy as jnp

from gridmm_tpu.config import GridConfig
from gridmm_tpu.ops import geometry as G

import reference_impl as R

RNG = np.random.default_rng(0)


def random_depth(shape):
    d = RNG.integers(0, 20000, size=shape).astype(np.uint16)
    # sprinkle zero-depth holes like real sensors
    holes = RNG.random(shape) < 0.1
    d[holes] = 0
    return d


def test_backproject_view_matches_reference():
    depth = random_depth((49,))
    for angle in [0.0, math.pi / 6, 2.3, -1.1]:
        rx, ry = G.backproject_view(
            jnp.asarray(depth.astype(np.float32)), jnp.float32(angle),
            depth_scale=4000.0, tan_half_hfov=math.tan(math.pi / 6))
        rrx, rry = R.ref_rel_position(depth, angle)
        np.testing.assert_allclose(np.asarray(rx), rrx, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ry), rry, atol=1e-5)


def test_gridmap_pos_fts_matches_reference():
    for half_len in [0.7, 3.3, 12.0]:
        got = np.asarray(G.gridmap_pos_fts(jnp.float32(half_len)))
        want = R.ref_gridmap_pos_fts(half_len)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_rel_heading_reflection():
    a = np.array([0.0, 0.0, 0.0])
    for b in [np.array([1.0, -2.0, 0.5]), np.array([-1.0, 3.0, -0.2]),
              np.array([0.5, 0.0, 0.0])]:
        h, e, d = G.rel_heading_elevation(
            jnp.float32(b[0] - a[0]), jnp.float32(b[1] - a[1]), jnp.float32(b[2] - a[2]))
        rh, re_, rd = R.ref_vp_rel_pos(a, b)
        assert abs(float(h) - rh) < 1e-5
        assert abs(float(e) - re_) < 1e-5
        assert abs(float(d) - rd) < 1e-5


def test_full_grid_build_matches_reference():
    """Multi-step episode: the on-device point buffer reproduces the
    reference's grid assignment exactly (cell ids are integers — require
    bit-exact match)."""
    cfg = GridConfig()
    steps = 4
    b = 2

    ref_builders = [R.RefGridBuilder() for _ in range(b)]
    state = G.PointCloudState.create(b, cfg)

    poses = []
    for t in range(steps):
        depth = random_depth((b, 12, 49))
        feats = RNG.standard_normal((b, 12 * 49, 768)).astype(np.float32)
        pos = RNG.uniform(-5, 5, size=(b, 2)).astype(np.float32)
        heading = RNG.uniform(-np.pi, np.pi, size=(b,)).astype(np.float32)
        poses.append((depth, pos, heading))

        state = G.append_panorama(
            state, jnp.asarray(depth.astype(np.float32)), jnp.asarray(feats),
            jnp.asarray(pos), cfg)
        cells, half_len, pos_fts = G.egocentric_grid_assignment(
            state, jnp.asarray(pos), jnp.asarray(heading), cfg)

        for i in range(b):
            ref_map, ref_half, ref_pos_fts = ref_builders[i].step(
                depth[i], {"x": float(pos[i, 0]), "y": float(pos[i, 1])},
                float(heading[i]))
            n = (t + 1) * 588
            got = np.asarray(cells[i])[:n]
            np.testing.assert_allclose(float(half_len[i]), ref_half, rtol=1e-6)
            np.testing.assert_array_equal(got, ref_map.astype(np.int32))
            # padding slots stay invalid
            assert (np.asarray(cells[i])[n:] == -1).all()
            np.testing.assert_allclose(
                np.asarray(pos_fts[i]), ref_pos_fts, atol=1e-5)


def test_ce_grid_build_matches_reference():
    """Continuous-env variant (heading-relative views, y-flip, map_x negation,
    pi offset) — bit-exact against the CE oracle."""
    from gridmm_tpu.config import r2r_ce_config

    cfg = r2r_ce_config().grid
    b, steps = 2, 3
    ref = [R.RefGridBuilderCE() for _ in range(b)]
    state = G.PointCloudState.create(b, cfg)

    for t in range(steps):
        depth = RNG.uniform(0.0, 8.0, size=(b, 12, 49)).astype(np.float32)
        depth[RNG.random((b, 12, 49)) < 0.08] = 0.0
        feats = RNG.standard_normal((b, 588, 768)).astype(np.float32)
        pos = RNG.uniform(-5, 5, size=(b, 2)).astype(np.float32)
        heading = RNG.uniform(-np.pi, np.pi, size=(b,)).astype(np.float32)
        state = G.append_panorama(
            state, jnp.asarray(depth), jnp.asarray(feats), jnp.asarray(pos),
            cfg, headings=jnp.asarray(heading))
        cells, half_len, _ = G.egocentric_grid_assignment(
            state, jnp.asarray(pos), jnp.asarray(heading), cfg)
        for i in range(b):
            ref_map, ref_half = ref[i].step(
                depth[i], {"x": float(pos[i, 0]), "y": float(pos[i, 1])},
                float(heading[i]))
            n = (t + 1) * 588
            np.testing.assert_allclose(float(half_len[i]), ref_half,
                                       rtol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(cells[i])[:n], ref_map.astype(np.int32))


def test_target_cell_id_range():
    tid = G.target_cell_id(
        jnp.float32(3.0), jnp.float32(-2.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.7), jnp.float32(4.0))
    assert 1 <= int(tid) <= 196
