"""Model-variant coverage: pvg/deformgs backgrounds in the trainer,
neural multiscale bilateral, CP4D grid, camera perturb, export utils."""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from bilateral_driving_tpu.data import synthetic
from bilateral_driving_tpu.models import bilateral
from bilateral_driving_tpu.train import density, setup, trainer
from bilateral_driving_tpu.utils import backup, export


def _run_steps(cfg, params, statics, aux, masks, batch, n=3):
    key = jax.random.key(0)
    state = trainer.init_state(key, cfg, params, masks, aux)
    step_fn = jax.jit(functools.partial(trainer.train_step, cfg, statics))
    for _ in range(n):
        state, m = step_fn(state, batch)
        assert np.isfinite(float(m["loss"])), m
    return state, m


def _base(key, scene, cfg, cap=256):
    params = setup.build_models(key, cfg)
    masks, aux, statics = {}, {}, {}
    return params, statics, aux, masks


def test_pvg_background_trains():
    key = jax.random.key(0)
    scene = synthetic.make_scene(key, num_bg=150, width=32, height=32)
    cfg = trainer.TrainerConfig(
        background_model="pvg", sky_model="none", affine_model="none",
        isect_capacity=2 ** 11, interpret=True, num_images=4, num_frames=4,
        sh_degree=0, density=density.DensityConfig(refine_interval=2,
                                                   warmup_steps=0,
                                                   reset_alpha_interval=10000),
        w_depth=0.0)
    params, statics, aux, masks = _base(key, scene, cfg)
    p, m = setup.build_pvg_background(key, 256, scene.bg_means,
                                      scene.bg_colors,
                                      t_init=jnp.zeros(150), sh_degree=0)
    params["Background"] = p
    masks["Background"] = m
    aux["Background"] = {}
    statics["Background"] = {}
    batch = synthetic.make_batch(scene, 1, jax.random.uniform(key, (32, 32, 3)))
    state, metrics = _run_steps(cfg, params, statics, aux, masks, batch, n=4)
    # refinement ran over pvg extras (taus/velocity copied to children)
    assert state.params["Background"]["taus"].shape == (256,)


def test_deformgs_background_trains():
    key = jax.random.key(1)
    scene = synthetic.make_scene(key, num_bg=100, width=32, height=32)
    cfg = trainer.TrainerConfig(
        background_model="deformgs", sky_model="none", affine_model="none",
        isect_capacity=2 ** 11, interpret=True, num_images=4, num_frames=4,
        sh_degree=0, density=density.DensityConfig(refine_interval=10000),
        w_depth=0.0)
    params, statics, aux, masks = _base(key, scene, cfg)
    p, st, m = setup.build_deformgs_background(
        key, 128, scene.bg_means, scene.bg_colors, jnp.zeros(3), 20.0,
        sh_degree=0, net_depth=3, net_width=32)
    params["Background"] = p
    statics["Background"] = st
    masks["Background"] = m
    aux["Background"] = {}
    batch = synthetic.make_batch(scene, 1, jax.random.uniform(key, (32, 32, 3)))
    state, metrics = _run_steps(cfg, params, statics, aux, masks, batch)
    # deform net got gradients
    g0 = params["Background"]["deform_net"]["trunk"][0]["w"]
    g1 = state.params["Background"]["deform_net"]["trunk"][0]["w"]
    assert float(jnp.abs(g1 - g0).max()) > 0


def test_multiscale_neural_bilateral_trains():
    key = jax.random.key(2)
    scene = synthetic.make_scene(key, num_bg=100, width=32, height=32)
    cfg = trainer.TrainerConfig(
        background_model="vanilla", sky_model="none",
        affine_model="multiscale_neural_bilateral",
        isect_capacity=2 ** 11, interpret=True, num_images=4, num_frames=4,
        sh_degree=0, density=density.DensityConfig(refine_interval=10000),
        w_depth=0.0)
    params, statics, aux, masks = _base(key, scene, cfg)
    p, m = setup.build_background(key, 128, scene.bg_means, scene.bg_colors,
                                  sh_degree=0)
    params["Background"] = p
    masks["Background"] = m
    aux["Background"] = {}
    statics["Background"] = {}
    batch = synthetic.make_batch(scene, 1, jax.random.uniform(key, (32, 32, 3)))
    _run_steps(cfg, params, statics, aux, masks, batch)


def test_camera_perturb_and_opt_compose():
    key = jax.random.key(3)
    scene = synthetic.make_scene(key, num_bg=100, width=32, height=32)
    cfg = trainer.TrainerConfig(
        background_model="vanilla", sky_model="none", affine_model="none",
        use_camera_opt=True, use_camera_perturb=True,
        isect_capacity=2 ** 11, interpret=True, num_images=4, num_frames=4,
        sh_degree=0, density=density.DensityConfig(refine_interval=10000),
        w_depth=0.0)
    params, statics, aux, masks = _base(key, scene, cfg)
    assert "CamPose" in params and "CamPosePerturb" in params
    p, m = setup.build_background(key, 128, scene.bg_means, scene.bg_colors,
                                  sh_degree=0)
    params["Background"] = p
    masks["Background"] = m
    aux["Background"] = {}
    statics["Background"] = {}
    batch = synthetic.make_batch(scene, 1, jax.random.uniform(key, (32, 32, 3)))
    _run_steps(cfg, params, statics, aux, masks, batch)


class TestCP4D:
    def test_identity_init(self):
        params = bilateral.init_cp4d(jax.random.key(0), rank=3)
        xyz = jax.random.uniform(jax.random.key(1), (50, 3), minval=-1,
                                 maxval=1)
        rgb = jax.random.uniform(jax.random.key(2), (50, 3))
        mats = bilateral.cp4d_affines(params, xyz, rgb)
        out = bilateral.apply_affine(mats, rgb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=0.02)
        assert float(bilateral.cp4d_tv_loss(params)) >= 0

    def test_grads(self):
        params = bilateral.init_cp4d(jax.random.key(0), rank=2)
        xyz = jax.random.uniform(jax.random.key(1), (20, 3), minval=-1, maxval=1)
        rgb = jax.random.uniform(jax.random.key(2), (20, 3))
        g = jax.grad(lambda p: jnp.sum(
            bilateral.cp4d_affines(p, xyz, rgb) ** 2))(params)
        assert all(np.isfinite(np.asarray(v)).all()
                   for v in jax.tree.leaves(g))


class TestExport:
    def test_ply(self, tmp_path):
        pts = np.random.RandomState(0).rand(10, 3)
        cols = np.random.RandomState(1).rand(10, 3)
        p = tmp_path / "out.ply"
        export.export_points_to_ply(str(p), pts, cols)
        txt = p.read_text()
        assert "element vertex 10" in txt
        assert len(txt.strip().splitlines()) == 10 + 10

    def test_gaussian_ply(self, tmp_path):
        key = jax.random.key(0)
        params, mask = setup.build_background(
            key, 32, jax.random.normal(key, (20, 3)),
            jax.random.uniform(key, (20, 3)))
        p = tmp_path / "gs.ply"
        export.export_gaussians_to_ply(str(p), params, mask)
        assert "element vertex 20" in p.read_text()

    def test_lidar_from_depth(self):
        depth = np.full((64, 96), 10.0, np.float32)
        K = np.array([[80.0, 0, 48], [0, 80.0, 32], [0, 0, 1]])
        pts = export.lidar_from_depth(depth, K, np.eye(4))
        assert pts.shape[0] > 100
        np.testing.assert_allclose(pts[:, 2], 10.0, atol=1e-4)

    def test_backup(self, tmp_path):
        out = backup.backup_project(str(tmp_path))
        assert os.path.exists(os.path.join(out, "core", "transforms.py"))


def test_pvg_temporal_smoothing_trains():
    """Smoothing on: perturbed render times + velocity correction must still
    produce finite losses and gradients into velocity (pvg.py:375-389)."""
    key = jax.random.key(2)
    scene = synthetic.make_scene(key, num_bg=150, width=32, height=32)
    cfg = trainer.TrainerConfig(
        background_model="pvg", sky_model="none", affine_model="none",
        isect_capacity=2 ** 11, interpret=True, num_images=4, num_frames=4,
        sh_degree=0, density=density.DensityConfig(refine_interval=10000),
        w_depth=0.0, pvg_temporal_smoothing=True, pvg_smooth_probability=1.0,
        pvg_distribution_span=1.5)
    params, statics, aux, masks = _base(key, scene, cfg)
    p, m = setup.build_pvg_background(key, 256, scene.bg_means,
                                      scene.bg_colors,
                                      t_init=jnp.zeros(150), sh_degree=0)
    params["Background"] = p
    masks["Background"] = m
    aux["Background"] = {}
    statics["Background"] = {}
    batch = synthetic.make_batch(scene, 1, jax.random.uniform(key, (32, 32, 3)))
    state, metrics = _run_steps(cfg, params, statics, aux, masks, batch, n=3)
    # velocity receives gradient through the smoothing correction term
    dv = jnp.abs(state.params["Background"]["velocity"]
                 - params["Background"]["velocity"]).max()
    assert float(dv) > 0.0


class TestRigidEditing:
    def _setup(self):
        from bilateral_driving_tpu.scene import rigid
        cap = 12
        pid = jnp.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 0, 1, 2])
        mask = jnp.ones(cap, bool).at[9:].set(False)   # 3 dead slots
        params = {
            "means": jnp.arange(cap * 3, dtype=jnp.float32).reshape(cap, 3),
            "quats": jnp.tile(jnp.array([1.0, 0, 0, 0]), (cap, 1)),
            "instances_quats": jnp.zeros((4, 3, 4)),
            "instances_trans": jnp.zeros((4, 3, 3)),
        }
        statics = {"point_ids": pid,
                   "instances_fv": jnp.ones((4, 3), bool),
                   "instances_size": jnp.ones((3, 3))}
        return rigid, params, statics, mask

    def test_remove(self):
        rigid, params, statics, mask = self._setup()
        m2 = rigid.remove_instances(statics, mask, [1])
        np.testing.assert_array_equal(
            np.asarray(m2),
            [True, True, True, False, False, True, True, True, True,
             False, False, False])

    def test_replace(self):
        rigid, params, statics, mask = self._setup()
        p2, s2, m2 = rigid.replace_instances(params, statics, mask, {1: 0})
        pid2 = np.asarray(s2["point_ids"])
        alive2 = np.asarray(m2)
        # instance 1 now has exactly as many live points as instance 0 had
        assert (alive2 & (pid2 == 1)).sum() == 3
        # geometry of the new points copies instance 0's live rows
        new_rows = np.flatnonzero(alive2 & (pid2 == 1))
        src_rows = np.flatnonzero(np.asarray(mask) & (np.asarray(
            statics["point_ids"]) == 0))
        np.testing.assert_allclose(np.asarray(p2["means"])[new_rows],
                                   np.asarray(params["means"])[src_rows])
        # pose tracks untouched
        np.testing.assert_allclose(np.asarray(p2["instances_trans"]),
                                   np.asarray(params["instances_trans"]))
