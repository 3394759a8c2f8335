"""Appearance subsystem: bilateral grids (parity vs torch grid_sample),
sky models, affine transforms, camera opt, deform nets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilateral_driving_tpu.core import transforms
from bilateral_driving_tpu.models import (affine, bilateral, camera_opt,
                                          deform, encoders, sky)


class TestBilateralSliceParity:
    @pytest.mark.parametrize("shape", [(4, 2, 2, 1), (12, 4, 4, 2),
                                       (12, 8, 16, 16), (3, 3, 5, 7)])
    def test_grid_sample_matches_torch(self, shape):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(0)
        vol = rng.randn(*shape).astype(np.float32)
        coords = rng.uniform(-1.3, 1.3, size=(50, 3)).astype(np.float32)

        out = bilateral.grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords))

        # torch: input (N, C, D, H, W), grid (N, Do, Ho, Wo, 3) with xyz
        # ordered (x->W, y->H, z->D)
        tvol = torch.from_numpy(vol)[None]
        tgrid = torch.from_numpy(coords)[None, None, None]
        ref = F.grid_sample(tvol, tgrid, mode="bilinear",
                            align_corners=True, padding_mode="border")
        ref = ref[0, :, 0, 0].T.numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_identity_grid_is_identity_transform(self):
        params = bilateral.init_bilateral(None, num_images=3)
        rgb = jax.random.uniform(jax.random.key(0), (16, 24, 3))
        mats = bilateral.bilateral_affines(params, rgb, 1)
        out = bilateral.apply_affine(mats, rgb)
        np.testing.assert_allclose(out, rgb, atol=1e-6)

    def test_tv_loss_matches_reference_formula(self):
        import torch

        rng = np.random.RandomState(1)
        g = rng.randn(2, 12, 3, 4, 5).astype(np.float32)
        ours = bilateral.total_variation_loss(jnp.asarray(g))

        x = torch.from_numpy(g)
        tv = 0
        for i in range(2, len(x.shape)):
            n_res = x.shape[i]
            x1 = x.index_select(i, torch.arange(1, n_res))
            x2 = x.index_select(i, torch.arange(0, n_res - 1))
            count = max(float(np.prod(x1.shape[1:])), 1.0)
            tv += torch.pow(x1 - x2, 2).sum() / count
        ref = (tv / 2).item()
        np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


class TestMultiScale:
    def test_identity_and_shapes(self):
        params = bilateral.init_multiscale(None, num_images=4)
        rgb = jax.random.uniform(jax.random.key(1), (40, 64, 3))
        mats_list = bilateral.multiscale_affines(params, rgb, 2)
        assert len(mats_list) == 3
        for m in mats_list:
            assert m.shape == (40, 64, 3, 4)
        out = bilateral.compose_affines(mats_list, rgb)
        np.testing.assert_allclose(out, rgb, atol=1e-5)

    def test_tv_weights(self):
        params = bilateral.init_multiscale(None, num_images=2)
        # identity grids have zero TV
        assert float(bilateral.multiscale_tv_loss(params)) == 0.0
        # perturb one level: loss becomes positive
        params["levels"][1]["grids"] = params["levels"][1]["grids"] + \
            jax.random.normal(jax.random.key(2),
                              params["levels"][1]["grids"].shape) * 0.1
        assert float(bilateral.multiscale_tv_loss(params)) > 0.0

    def test_inverse_loss_zero_for_identity(self):
        params = bilateral.init_multiscale(None, num_images=1)
        rgb = jax.random.uniform(jax.random.key(3), (24, 32, 3))
        mats_list = bilateral.multiscale_affines(params, rgb, 0)
        loss = bilateral.inverse_loss(mats_list, rgb, rgb)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)

    def test_neighbor_averaging(self):
        params = bilateral.init_multiscale(None, num_images=4)
        # make grids differ per image
        for lv in params["levels"]:
            lv["grids"] = lv["grids"] + jax.random.normal(
                jax.random.key(4), lv["grids"].shape) * 0.1
        rgb = jax.random.uniform(jax.random.key(5), (16, 16, 3))
        m_avg = bilateral.multiscale_affines(params, rgb, 0,
                                             neighbor_idx=jnp.array([1, 2]))
        m1 = bilateral.multiscale_affines(params, rgb, 1)
        m2 = bilateral.multiscale_affines(params, rgb, 2)
        for a, b1, b2 in zip(m_avg, m1, m2):
            np.testing.assert_allclose(a, (b1 + b2) / 2, atol=1e-5)

    def test_grads_flow(self):
        params = bilateral.init_multiscale(None, num_images=2)
        rgb = jax.random.uniform(jax.random.key(6), (16, 16, 3))
        target = jax.random.uniform(jax.random.key(7), (16, 16, 3))

        def loss(p):
            mats = bilateral.multiscale_affines(p, rgb, 0)
            return jnp.mean((bilateral.compose_affines(mats, rgb) - target) ** 2)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.abs(lv["grids"]).sum()) for lv in g["levels"])
        assert np.isfinite(total) and total > 0


class TestNeuralBilateral:
    def test_zero_init_and_grads(self):
        params = bilateral.init_neural_bilateral(
            jax.random.key(0), 2, 8, 8, 4, feature_dim=8, hidden_dim=32)
        rgb = jax.random.uniform(jax.random.key(1), (16, 16, 3))
        mats = bilateral.neural_bilateral_affines(params, rgb, 0)
        assert mats.shape == (16, 16, 3, 4)
        # zero-init head -> zero affines (applied residually by trainer)
        np.testing.assert_allclose(np.asarray(mats), 0.0, atol=1e-6)


class TestSky:
    def test_sky_mlp(self):
        params = sky.init_sky_mlp(jax.random.key(0), num_images=5)
        dirs = jax.random.normal(jax.random.key(1), (10, 3))
        rgb = sky.sky_mlp_color(params, dirs, 2)
        assert rgb.shape == (10, 3)
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
        rgb_mean = sky.sky_mlp_color(params, dirs, 0, use_mean_embedding=True)
        assert rgb_mean.shape == (10, 3)

    def test_envlight_constant(self):
        params = sky.init_envlight(None, resolution=16)
        dirs = jax.random.normal(jax.random.key(2), (100, 3))
        out = sky.envlight_color(params, dirs)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)

    def test_cubemap_face_lookup(self):
        # paint each face a distinct color; axis-aligned dirs hit their face
        res = 8
        base = jnp.zeros((6, res, res, 3))
        for f in range(6):
            base = base.at[f].set(f / 10.0)
        params = {"base": base}
        # dirs in OpenGL frame: +x,-x,+y,-y,+z,-z (pre-transform world dirs)
        gl_dirs = np.eye(3)
        world = np.linalg.solve(np.asarray(sky.TO_OPENGL), gl_dirs.T).T
        for i, (w, face) in enumerate(zip(world, [0, 2, 4])):
            out = sky.envlight_color(params, jnp.asarray(w[None]))
            np.testing.assert_allclose(np.asarray(out)[0], face / 10.0,
                                       atol=1e-6)

    def test_cubemap_grads(self):
        params = sky.init_envlight(None, resolution=8)
        dirs = jax.random.normal(jax.random.key(3), (50, 3))
        g = jax.grad(lambda p: jnp.sum(sky.envlight_color(p, dirs)))(params)
        assert float(jnp.abs(g["base"]).sum()) > 0


class TestAffine:
    def test_identity_at_init(self):
        params = affine.init_affine(jax.random.key(0), num_images=4)
        mats = affine.affine_mats(params, 1)
        np.testing.assert_allclose(np.asarray(mats[..., :3, :3]), np.eye(3),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(mats[..., 3]), 0.0, atol=1e-6)
        assert float(affine.identity_reg_loss(mats)) < 1e-6

    def test_pixel_affine_shapes(self):
        params = affine.init_affine(jax.random.key(0), 4, pixel_affine=True)
        coords = jax.random.uniform(jax.random.key(1), (8, 8, 2))
        mats = affine.affine_mats(params, 0, pixel_coords=coords)
        assert mats.shape == (8, 8, 3, 4)


class TestCameraOpt:
    def test_zero_is_identity(self):
        params = camera_opt.init_camera_opt(jax.random.key(0), 3)
        c2w = jnp.eye(4)[None].repeat(3, 0).at[:, :3, 3].set(
            jax.random.normal(jax.random.key(1), (3, 3)))
        out = camera_opt.apply_camera_opt(params, c2w, jnp.arange(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(c2w), atol=1e-6)

    def test_translation_delta(self):
        params = {"embeds": jnp.zeros((2, 9)).at[1, 0].set(0.5)}
        c2w = jnp.eye(4)
        out = camera_opt.apply_camera_opt(params, c2w, 1)
        np.testing.assert_allclose(np.asarray(out[:3, 3]),
                                   [0.5, 0.0, 0.0], atol=1e-6)


class TestDeform:
    def test_shapes_and_grads(self):
        params = deform.init_deform(jax.random.key(0), depth=4, width=32)
        x = jax.random.normal(jax.random.key(1), (10, 3))
        t = jax.random.uniform(jax.random.key(2), (10, 1))
        d_xyz, d_quat, d_scale = deform.apply_deform(params, x, t)
        assert d_xyz.shape == (10, 3)
        assert d_quat.shape == (10, 4)
        assert d_scale.shape == (10, 3)

    def test_conditional(self):
        params = deform.init_deform(jax.random.key(0), depth=4, width=32,
                                    embed_dim=6, deform_scale=False)
        x = jax.random.normal(jax.random.key(1), (10, 3))
        t = jax.random.uniform(jax.random.key(2), (10, 1))
        cond = jax.random.normal(jax.random.key(3), (10, 6))
        d_xyz, d_quat, d_scale = deform.apply_deform(params, x, t, cond)
        assert d_xyz.shape == (10, 3) and d_quat.shape == (10, 4)
        assert d_scale is None


class TestEncoders:
    def test_mlp_skip_shapes(self):
        p = encoders.mlp_init(jax.random.key(0), 8, 3, 3, 16, skips=(1,))
        out = encoders.mlp_apply(p, jnp.ones((5, 8)))
        assert out.shape == (5, 3)

    def test_sinusoidal_dim(self):
        x = jnp.ones((4, 3))
        enc = encoders.sinusoidal_encode(x, 0, 6)
        assert enc.shape == (4, encoders.sinusoidal_dim(3, 0, 6))


class TestColorCorrect:
    def test_recovers_affine_shift(self):
        rng = np.random.RandomState(0)
        ref = rng.uniform(0.1, 0.9, (32, 32, 3)).astype(np.float32)
        img = np.clip(ref * 0.8 + 0.05, 0, 1).astype(np.float32)
        out = bilateral.color_correct(jnp.asarray(img), jnp.asarray(ref))
        err_before = np.abs(img - ref).mean()
        err_after = np.abs(np.asarray(out) - ref).mean()
        assert err_after < 0.1 * err_before
