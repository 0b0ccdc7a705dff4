"""AOT serving export: jax.export roundtrip of the navigator serving graphs.

The exported artifacts must reproduce the live jitted step bit-for-bit on the
same backend, and must deserialize + run WITHOUT rebuilding the model."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridmm_tpu.config import tiny_config
from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
from gridmm_tpu.train.step import init_carry, nav_device_step
from gridmm_tpu.utils.export import (export_navigator_serving, load_exported,
                                     save_serving_bundle, zero_step_inputs)


@pytest.fixture(scope="module")
def setup():
    # exported/serving graphs run the batch-DECOUPLED semantics (no
    # compaction-alias stray keys, serve/engine.serving_cfg) — the live
    # reference side of every bit-for-bit comparison here must match
    from gridmm_tpu.serve.engine import serving_cfg

    cfg = serving_cfg(tiny_config())
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    return cfg, model, params


def _example_inputs(cfg, batch=2, seed=1):
    rng = np.random.default_rng(seed)
    t = cfg.shapes.max_txt_len
    txt_ids = jnp.asarray(
        rng.integers(1, 100, size=(batch, t)), jnp.int32)
    txt_mask = jnp.asarray(np.arange(t)[None] < 7, bool) * jnp.ones(
        (batch, 1), bool)
    x = zero_step_inputs(cfg, batch)
    x = x._replace(
        view_img_fts=jnp.asarray(
            rng.standard_normal(x.view_img_fts.shape), jnp.float32) * 0.3,
        view_mask=jnp.ones_like(x.view_mask),
        nav_types=jnp.ones_like(x.nav_types),
        depth=jnp.asarray(
            rng.integers(100, 15000, size=x.depth.shape), jnp.float32),
        patch_fts=jnp.asarray(
            rng.standard_normal(x.patch_fts.shape), jnp.float32) * 0.3,
        gmap_mask=jnp.asarray(
            np.arange(x.gmap_mask.shape[1])[None] < 3, bool)
        * jnp.ones((batch, 1), bool),
        vp_nav_mask=jnp.ones_like(x.vp_nav_mask),
    )
    return txt_ids, txt_mask, x


def test_export_roundtrip_matches_live_step(setup, tmp_path):
    cfg, model, params = setup
    batch = 2
    exports = export_navigator_serving(model, cfg, params, batch=batch)
    save_serving_bundle(exports, str(tmp_path), cfg=cfg)

    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert set(manifest["artifacts"]) == {"language", "nav_step"}
    assert manifest["model"]["hidden_size"] == cfg.model.hidden_size

    lang = load_exported(str(tmp_path / "language.jaxexport"))
    step = load_exported(str(tmp_path / "nav_step.jaxexport"))

    txt_ids, txt_mask, x = _example_inputs(cfg, batch)
    carry = init_carry(cfg, batch)

    # live path
    txt_live = jax.jit(lambda p, i, m: model.apply(
        p, "language", {"txt_ids": i, "txt_mask": m}))(
            params, txt_ids, txt_mask)
    carry_live, out_live = jax.jit(
        lambda p, t, m, c, xx: nav_device_step(model, cfg, p, t, m, c, xx))(
            params, txt_live, txt_mask, carry, x)

    # exported path (no model object involved)
    txt_exp = jax.jit(lang.call)(params, txt_ids, txt_mask)
    carry_exp, out_exp = jax.jit(step.call)(
        params, txt_exp, txt_mask, init_carry(cfg, batch), x)

    np.testing.assert_array_equal(np.asarray(txt_live), np.asarray(txt_exp))
    np.testing.assert_array_equal(np.asarray(out_live.fused_logits),
                                  np.asarray(out_exp.fused_logits))
    np.testing.assert_array_equal(np.asarray(out_live.grid_logits),
                                  np.asarray(out_exp.grid_logits))
    np.testing.assert_array_equal(np.asarray(carry_live.point_state.count),
                                  np.asarray(carry_exp.point_state.count))
    # the pytree namedtuple types survive the roundtrip
    assert type(carry_exp).__name__ == "NavCarry"
    assert type(out_exp).__name__ == "NavOutputs"


def test_export_rejects_wrong_shapes(setup):
    cfg, model, params = setup
    exports = export_navigator_serving(model, cfg, params, batch=1)
    txt_ids, txt_mask, _ = _example_inputs(cfg, batch=2)
    with pytest.raises(Exception, match="(?i)shape|rank|aval|incompatible"):
        jax.jit(exports["language"].call)(params, txt_ids, txt_mask)


def test_cross_platform_export_from_cpu(setup, tmp_path):
    """TPU serving bundles can be built on a CPU-only host: jax.export
    lowers for the requested platforms without needing the device, and the
    multi-platform artifact still executes on the local backend."""
    cfg, model, params = setup
    exports = export_navigator_serving(model, cfg, params, batch=1,
                                       platforms=("cpu", "tpu"))
    save_serving_bundle(exports, str(tmp_path), cfg=cfg)
    lang = load_exported(str(tmp_path / "language.jaxexport"))
    assert set(lang.platforms) == {"cpu", "tpu"}
    txt_ids, txt_mask, _ = _example_inputs(cfg, batch=1)
    out = jax.jit(lang.call)(params, txt_ids, txt_mask)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_export_matches_single_device(setup, tmp_path):
    """The mesh-sharded (dp=4, tp=2) serving artifact computes the same step
    as the single-device path and records the 8-device calling convention."""
    from gridmm_tpu.config import MeshConfig
    from gridmm_tpu.parallel.mesh import make_mesh
    from gridmm_tpu.utils.export import export_navigator_serving_sharded

    cfg, model, params = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(MeshConfig(mp_size=2), jax.devices())
    batch = 8
    exports = export_navigator_serving_sharded(model, cfg, params, mesh,
                                               batch=batch)
    save_serving_bundle(exports, str(tmp_path), cfg=cfg)
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest["artifacts"]["nav_step"]["nr_devices"] == 8

    lang = load_exported(str(tmp_path / "language.jaxexport"))
    step = load_exported(str(tmp_path / "nav_step.jaxexport"))

    txt_ids, txt_mask, x = _example_inputs(cfg, batch)
    carry = init_carry(cfg, batch)

    txt_ref = jax.jit(lambda p, i, m: model.apply(
        p, "language", {"txt_ids": i, "txt_mask": m}))(
            params, txt_ids, txt_mask)
    carry_ref, out_ref = jax.jit(
        lambda p, t, m, c, xx: nav_device_step(model, cfg, p, t, m, c, xx))(
            params, txt_ref, txt_mask, carry, x)

    # a sharded artifact must be invoked in an N-device context: place the
    # args on the recorded shardings first
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gridmm_tpu.parallel.mesh import param_shardings

    data_sh = lambda tree: jax.device_put(tree, jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P("data")), tree))
    params_d = jax.device_put(params, param_shardings(params, mesh))
    txt_sh = jax.jit(lang.call)(params_d, data_sh(txt_ids), data_sh(txt_mask))
    carry_sh, out_sh = jax.jit(step.call)(
        params_d, txt_sh, data_sh(txt_mask),
        data_sh(init_carry(cfg, batch)), data_sh(x))

    # TP changes the matmul reduction order -> tolerance, not bit equality
    np.testing.assert_allclose(np.asarray(txt_sh), np.asarray(txt_ref),
                               rtol=2e-5, atol=2e-5)
    ref, sh = (np.asarray(out_ref.fused_logits),
               np.asarray(out_sh.fused_logits))
    finite = np.isfinite(ref)
    assert (finite == np.isfinite(sh)).all()
    np.testing.assert_allclose(sh[finite], ref[finite], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(carry_sh.point_state.count),
                                  np.asarray(carry_ref.point_state.count))


def test_zero_step_inputs_matches_live_builder_schema():
    """zero_step_inputs (the exported calling convention) must stay in sync
    with the agent's live StepInputs builder — a drift would silently break
    serving hosts that mirror the agent's input assembly."""
    from gridmm_tpu.env.discrete import DiscreteNavEnv, synthetic_episodes
    from gridmm_tpu.env.world import SyntheticWorld
    from gridmm_tpu.models.navigator import GridMMNavigator, init_navigator
    from gridmm_tpu.train.agent import EpisodeBook, NavAgent

    cfg = tiny_config()
    world = SyntheticWorld(num_scans=1, nodes_per_scan=8, feat_dim=768,
                           seed=0)
    episodes = synthetic_episodes(world, num=4, seed=0, max_len=3)
    env = DiscreteNavEnv(world, world.graphs, episodes,
                         batch_size=cfg.train.batch_size, seed=0)
    model = GridMMNavigator(cfg.model)
    params = init_navigator(model, cfg.shapes, jax.random.PRNGKey(0))
    agent = NavAgent(model, cfg, env, params)
    obs = env.reset()
    agent._update_caches(obs)
    books = [EpisodeBook(ob["viewpoint"], cfg.shapes.max_gmap_len)
             for ob in obs]
    for i, ob in enumerate(obs):
        books[i].topo.update(
            ob["viewpoint"], ob["position"],
            [(c["viewpointId"], c["position"]) for c in ob["candidate"]])
    live, _, _ = agent.build_step_inputs(obs, books)
    zero = zero_step_inputs(cfg, len(obs))
    assert type(live)._fields == type(zero)._fields
    for name, lv, zv in zip(type(live)._fields, live, zero):
        assert tuple(lv.shape) == tuple(zv.shape), name
        assert np.dtype(lv.dtype) == np.dtype(zv.dtype), name


def test_export_cli_smoke(tmp_path):
    from gridmm_tpu.cli.export_serving import main

    main(["--tiny", "--out_dir", str(tmp_path / "bundle"), "--batch", "1"])
    files = {p.name for p in (tmp_path / "bundle").iterdir()}
    assert {"language.jaxexport", "nav_step.jaxexport",
            "manifest.json"} <= files
