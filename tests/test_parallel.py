"""Multi-device SPMD training on the virtual 8-device CPU mesh
(SURVEY.md §4 fake-cluster harness)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bilateral_driving_tpu.data import synthetic
from bilateral_driving_tpu.parallel import data_parallel
from bilateral_driving_tpu.train import density, setup, trainer


def test_parallel_step_matches_semantics():
    n_dev = len(jax.devices())
    assert n_dev == 8
    key = jax.random.key(0)
    scene = synthetic.make_scene(key, num_bg=300, num_frames=8, width=32,
                                 height=32)
    cfg = trainer.TrainerConfig(
        background_model="vanilla", sky_model="none", affine_model="none",
        isect_capacity=2 ** 12, interpret=True, num_images=8, num_frames=8,
        sh_degree=0, density=density.DensityConfig(refine_interval=10000),
        scene_scale=5.0, w_depth=0.0)
    params = setup.build_models(key, cfg)
    masks, aux, statics = {}, {}, {}
    bg, masks["Background"] = setup.build_background(
        key, 512, scene.bg_means, scene.bg_colors, sh_degree=0)
    params["Background"] = bg
    aux["Background"] = {}
    statics["Background"] = {}

    batches = [synthetic.make_batch(
        scene, f, jax.random.uniform(jax.random.fold_in(key, f), (32, 32, 3)))
        for f in range(8)]
    stacked = data_parallel.stack_batches(batches)

    mesh = data_parallel.make_mesh()
    stacked = data_parallel.shard_batch(stacked, mesh)
    state = trainer.init_state(key, cfg, params, masks, aux)
    pstep = data_parallel.parallel_train_step(cfg, statics, mesh)

    state2, metrics = pstep(state, stacked)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1

    # parity: parallel mean-gradient == mean of single-image gradients
    g_single = []
    for b in batches:
        _, _, _, gp, _ = trainer.compute_grads(cfg, statics, state, b)
        g_single.append(gp)
    g_mean = jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs), 0), *g_single)

    # recover the parallel gradient by rerunning the sharded grad fn alone
    total, loss_dict, gp_par, gd_par, radii, psnr = jax.jit(
        data_parallel.shard_map(
            functools.partial(_grads_probe, cfg, statics),
            mesh=mesh, in_specs=(jax.sharding.PartitionSpec(),
                                 jax.sharding.PartitionSpec("data")),
            out_specs=(jax.sharding.PartitionSpec(),) * 6,
            check_vma=False))(state, stacked)
    for ka, (a, b) in enumerate(zip(jax.tree.leaves(gp_par),
                                    jax.tree.leaves(g_mean))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=f"leaf {ka}")

    # a second parallel step keeps shapes/structure
    state3, m3 = pstep(state2, stacked)
    assert np.isfinite(float(m3["loss"]))


def _grads_probe(cfg, statics, state, batch_slice):
    batch = jax.tree.map(lambda x: x[0], batch_slice)
    total, loss_dict, outputs, g_params, g_dummy = trainer.compute_grads(
        cfg, statics, state, batch)
    return (jax.lax.pmean(total, "data"), jax.lax.pmean(loss_dict, "data"),
            jax.lax.pmean(g_params, "data"), jax.lax.psum(g_dummy, "data"),
            jax.lax.pmax(outputs["info"]["radii"], "data"),
            jax.lax.pmean(total, "data"))


def test_tile_sharded_rasterize_matches_single():
    """Intra-image tile sharding: banded multi-device render must equal the
    single-device render bit-for-bit in structure (same pipeline per band)
    and match gradients through the psum transpose."""
    from bilateral_driving_tpu.ops import pipeline
    from bilateral_driving_tpu.parallel import tile_parallel

    key = jax.random.key(3)
    n = 200
    W, H = 64, 96           # 3 tile rows -> bands of 1 row on 4 devices pad
    means = jnp.concatenate([
        jax.random.uniform(key, (n, 2), minval=-1.0, maxval=1.0),
        jax.random.uniform(jax.random.fold_in(key, 1), (n, 1), minval=2.0,
                           maxval=7.0)], axis=1)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.06)
    opac = jnp.full((n,), 0.7)
    colors = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    f = 0.9 * W
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    view = jnp.eye(4)

    cfg = pipeline.RasterizeConfig(isect_capacity=2 ** 12, interpret=True)
    ref = pipeline.rasterize(means, quats, scales, opac, colors, view, K,
                             W, H, cfg)

    mesh = data_parallel.make_mesh(4, axis="tile")
    out = tile_parallel.tile_sharded_rasterize(
        mesh, means, quats, scales, opac, colors, view, K, W, H, cfg)
    # atol 1e-4: bands pack fewer tile bits into the sort key, so two
    # near-equal depths may composite in swapped order (allowed; gsplat
    # gives no tie guarantee)
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=1e-4)
    assert int(out["info"]["num_isects"]) == int(ref["info"]["num_isects"])

    # gradient parity: replicated-param grads psum over bands
    def loss_sharded(means, colors):
        o = tile_parallel.tile_sharded_rasterize(
            mesh, means, quats, scales, opac, colors, view, K, W, H, cfg)
        return jnp.sum(o["rgb"] ** 2) + jnp.sum(o["alpha"])

    def loss_single(means, colors):
        o = pipeline.rasterize(means, quats, scales, opac, colors, view, K,
                               W, H, cfg)
        return jnp.sum(o["rgb"] ** 2) + jnp.sum(o["alpha"])

    gs = jax.grad(loss_sharded, argnums=(0, 1))(means, colors)
    g1 = jax.grad(loss_single, argnums=(0, 1))(means, colors)
    for a, b in zip(gs, g1):
        scale = max(float(np.abs(np.asarray(b)).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3 * scale, rtol=1e-3)


def _small_scene_state(key, cfg, w, h, nbg=300, cap=512):
    scene = synthetic.make_scene(key, num_bg=nbg, num_frames=4, width=w,
                                 height=h)
    params = setup.build_models(key, cfg)
    masks, aux, statics = {}, {}, {}
    bg, masks["Background"] = setup.build_background(
        key, cap, scene.bg_means, scene.bg_colors, sh_degree=cfg.sh_degree)
    params["Background"] = bg
    aux["Background"] = {}
    statics["Background"] = {}
    state = trainer.init_state(key, cfg, params, masks, aux)
    return scene, statics, state


def test_tile_train_step_matches_single():
    """Tile-axis TRAINING parity (VERDICT r3 item 4): a full train step —
    loss, backward, optimizer update, density stats — over 2 horizontal
    bands must reproduce the single-device step, including the appearance/
    sky (replicated-path) gradients the pmean calculus must not double
    count."""
    from bilateral_driving_tpu.parallel import tile_parallel

    key = jax.random.key(3)
    W, H = 32, 64                      # two 32-px tile rows -> 2 real bands
    cfg = trainer.TrainerConfig(
        background_model="vanilla", sky_model="envlight",
        affine_model="multiscale_bilateral", envlight_resolution=16,
        isect_capacity=2 ** 12, interpret=True, num_images=4, num_frames=4,
        sh_degree=1, density=density.DensityConfig(refine_interval=10000),
        scene_scale=5.0, w_depth=0.0)
    scene, statics, state = _small_scene_state(key, cfg, W, H)
    batch = synthetic.make_batch(
        scene, 1, jax.random.uniform(key, (H, W, 3)))

    mesh = data_parallel.make_mesh(2, axis="tile")
    tstep = tile_parallel.tile_train_step(cfg, statics, mesh)
    st_tile, m_tile = tstep(state, batch)

    st_single, m_single = jax.jit(functools.partial(
        trainer.train_step, cfg, statics))(state, batch)

    np.testing.assert_allclose(float(m_tile["loss"]),
                               float(m_single["loss"]), rtol=1e-5)
    assert int(st_tile.step) == 1

    # GRADIENT parity (post-Adam params would amplify f32 summation-order
    # sign flips of ~1e-8 cancellation-level grads into full +-lr steps):
    # band-path and replicated-path grads must both come out exact
    P_ = jax.sharding.PartitionSpec

    def probe(state, batch):
        rfn = tile_parallel._banded_rasterize_fn("tile", 2)
        total, loss_dict, outputs, gp, gd = trainer.compute_grads(
            cfg, statics, state, batch, rasterize_fn=rfn)
        return (jax.lax.pmean(gp, "tile"), jax.lax.pmean(gd, "tile"),
                jax.lax.pmax(outputs["info"]["radii"], "tile"))

    gp_tile, gd_tile, radii_tile = jax.jit(data_parallel.shard_map(
        probe, mesh=mesh, in_specs=(P_(), P_()),
        out_specs=(P_(), P_(), P_()), check_vma=False))(state, batch)
    _, _, outputs_s, gp_s, gd_s = trainer.compute_grads(
        cfg, statics, state, batch)
    # relative-norm parity per leaf: band-split summation reorders f32
    # adds under heavy cancellation (~1e-4 rel-norm noise); a pmean-calculus
    # bug (double counting either path) would show up as a 2x (1e0) error
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp_tile),
            jax.tree_util.tree_leaves_with_path(gp_s)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        diff = np.linalg.norm(a - b)
        rel = diff / (np.linalg.norm(b) + 1e-12)
        assert rel < 1e-3 or diff < 1e-6, (
            jax.tree_util.keystr(ka), rel, diff, np.linalg.norm(b))
    # screen-gradient sink (densification stats source)
    a, b = np.asarray(gd_tile, np.float64), np.asarray(gd_s, np.float64)
    assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12) < 1e-3
    np.testing.assert_array_equal(np.asarray(radii_tile),
                                  np.asarray(outputs_s["info"]["radii"]))


def test_hybrid_data_tile_step():
    """2x2 (data x tile) hybrid mesh: two images, each banded over two
    chips; parity against the existing data-parallel step on 2 devices."""
    from bilateral_driving_tpu.parallel import tile_parallel

    key = jax.random.key(4)
    W, H = 32, 64
    cfg = trainer.TrainerConfig(
        background_model="vanilla", sky_model="envlight",
        affine_model="none", envlight_resolution=16,
        isect_capacity=2 ** 12, interpret=True, num_images=4, num_frames=4,
        sh_degree=0, density=density.DensityConfig(refine_interval=10000),
        scene_scale=5.0, w_depth=0.0)
    scene, statics, state = _small_scene_state(key, cfg, W, H)
    batches = [synthetic.make_batch(
        scene, f, jax.random.uniform(jax.random.fold_in(key, f), (H, W, 3)))
        for f in range(2)]
    stacked = data_parallel.stack_batches(batches)

    hmesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("data", "tile"))
    hstep = tile_parallel.tile_train_step(cfg, statics, hmesh,
                                          data_axis="data")
    st_h, m_h = hstep(state, stacked)

    dmesh = data_parallel.make_mesh(2)
    dstep = data_parallel.parallel_train_step(cfg, statics, dmesh)
    st_d, m_d = dstep(state, data_parallel.shard_batch(stacked, dmesh))

    np.testing.assert_allclose(float(m_h["loss"]), float(m_d["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_h["psnr"]), float(m_d["psnr"]),
                               rtol=1e-5)
    assert int(st_h.step) == 1 and int(st_d.step) == 1
    # gradient parity: hybrid (data x tile) pmean == batch mean of
    # single-image grads
    P_ = jax.sharding.PartitionSpec

    def probe(state, sbatch):
        b = jax.tree.map(lambda x: x[0], sbatch)
        from bilateral_driving_tpu.parallel import tile_parallel as tp
        rfn = tp._banded_rasterize_fn("tile", 2)
        _, _, _, gp, _ = trainer.compute_grads(cfg, statics, state, b,
                                               rasterize_fn=rfn)
        gp = jax.lax.pmean(gp, "tile")
        return jax.lax.pmean(gp, "data")

    gp_h = jax.jit(data_parallel.shard_map(
        probe, mesh=hmesh, in_specs=(P_(), P_("data")),
        out_specs=P_(), check_vma=False))(state, stacked)
    g_single = []
    for b in batches:
        _, _, _, gp, _ = trainer.compute_grads(cfg, statics, state, b)
        g_single.append(gp)
    g_mean = jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs), 0), *g_single)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp_h),
            jax.tree_util.tree_leaves_with_path(g_mean)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        diff = np.linalg.norm(a - b)
        rel = diff / (np.linalg.norm(b) + 1e-12)
        assert rel < 1e-3 or diff < 1e-6, (
            jax.tree_util.keystr(ka), rel, diff, np.linalg.norm(b))
