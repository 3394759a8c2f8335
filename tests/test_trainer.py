"""Trainer integration: forward with all classes, loss stack, jitted
train_step with densification, end-to-end optimization on a synthetic scene
(BASELINE config 2 analogue at toy scale)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilateral_driving_tpu.data import synthetic
from bilateral_driving_tpu.scene import smpl_model
from bilateral_driving_tpu.train import density, losses, setup, trainer


def small_cfg(**kw):
    defaults = dict(
        background_model="vanilla",
        sky_model="envlight",
        affine_model="multiscale_bilateral",
        envlight_resolution=16,
        isect_capacity=2 ** 13,
        interpret=True,
        num_images=6,
        num_frames=6,
        sh_degree=1,
        density=density.DensityConfig(refine_interval=5, warmup_steps=2,
                                      reset_alpha_interval=1000),
        scene_scale=10.0,
    )
    defaults.update(kw)
    return trainer.TrainerConfig(**defaults)


def build_synthetic(key, cfg, scene, bg_capacity=4096):
    params = setup.build_models(key, cfg)
    masks, aux, statics = {}, {}, {}
    bg, bg_mask = setup.build_background(key, bg_capacity, scene.bg_means,
                                         scene.bg_colors,
                                         sh_degree=cfg.sh_degree)
    params["Background"] = bg
    masks["Background"] = bg_mask
    aux["Background"] = {}
    statics["Background"] = {}
    if cfg.use_rigid:
        rp, rs, ra, rm = setup.build_rigid(
            key, 512, scene.rigid_means, scene.rigid_colors,
            scene.rigid_point_ids, scene.rigid_quats, scene.rigid_trans,
            scene.rigid_fv, scene.rigid_sizes, sh_degree=cfg.sh_degree)
        params["RigidNodes"] = rp
        statics["RigidNodes"] = rs
        aux["RigidNodes"] = ra
        masks["RigidNodes"] = rm
    if cfg.use_smpl:
        model = smpl_model.synthetic_model(key, num_verts=64)
        F, I = cfg.num_frames, 1
        root = jnp.broadcast_to(smpl_model.da_pose_quats()[0], (F, I, 1, 4))
        body = jnp.broadcast_to(smpl_model.da_pose_quats()[1:], (F, I, 23, 4))
        trans = jnp.tile(jnp.array([0.0, 0.0, 8.0]), (F, I, 1))
        sp, ss, sa, sm = setup.build_smpl(
            key, model, jnp.zeros((I, 10)), root, body, trans,
            jnp.ones((F, I), bool), sh_degree=cfg.sh_degree)
        params["SMPLNodes"] = sp
        statics["SMPLNodes"] = ss
        aux["SMPLNodes"] = sa
        masks["SMPLNodes"] = sm
    return params, statics, aux, masks


class TestForward:
    def test_all_classes_forward(self):
        key = jax.random.key(0)
        scene = synthetic.make_scene(key, num_bg=400, width=64, height=48)
        cfg = small_cfg(use_rigid=True, use_smpl=True, use_camera_opt=True)
        params, statics, aux, masks = build_synthetic(key, cfg, scene,
                                                      bg_capacity=512)
        batch = synthetic.make_batch(scene, 1, jnp.zeros((48, 64, 3)))
        full = trainer.merge_statics(statics, aux)
        out = trainer.forward(cfg, params, full, masks, batch, 0)
        assert out["rgb"].shape == (48, 64, 3)
        assert np.isfinite(np.asarray(out["rgb"])).all()
        # labels cover all classes
        labels = np.asarray(out["labels"])
        assert set(np.unique(labels)) == {0, 1, 2}

        loss = trainer.compute_losses(cfg, params, full, masks, out, batch, 0)
        for k, v in loss.items():
            assert np.isfinite(float(v)), k

    def test_in_test_set_uses_neighbors(self):
        key = jax.random.key(1)
        scene = synthetic.make_scene(key, num_bg=200, width=64, height=48)
        cfg = small_cfg()
        params, statics, aux, masks = build_synthetic(key, cfg, scene, 256)
        batch = synthetic.make_batch(scene, 2, jnp.zeros((48, 64, 3)))
        full = trainer.merge_statics(statics, aux)
        out = trainer.forward(cfg, params, full, masks, batch, 0,
                              in_test_set=True,
                              neighbor_idx=jnp.array([1, 3]))
        assert np.isfinite(np.asarray(out["rgb"])).all()


class TestTrainStep:
    def test_loss_decreases_and_refines(self):
        key = jax.random.key(0)
        scene = synthetic.make_scene(key, num_bg=400, width=64, height=48)
        cfg = small_cfg(sky_model="envlight", affine_model="none",
                        use_camera_opt=False,
                        density=density.DensityConfig(refine_interval=50,
                                                      warmup_steps=2))
        params, statics, aux, masks = build_synthetic(key, cfg, scene, 1024)

        # target: render GT scene, then perturb params
        full = trainer.merge_statics(statics, aux)
        gt_out = trainer.forward(cfg, params, full, masks,
                                 synthetic.make_batch(
                                     scene, 0, jnp.zeros((48, 64, 3))), 0)
        target = jnp.clip(gt_out["rgb"], 0, 1)
        batch = synthetic.make_batch(scene, 0, target)

        params["Background"]["means"] = params["Background"]["means"] + \
            0.05 * jax.random.normal(key, params["Background"]["means"].shape)
        params["Background"]["sh_dc"] = jnp.zeros_like(
            params["Background"]["sh_dc"])

        state = trainer.init_state(key, cfg, params, masks, aux)
        step_fn = jax.jit(functools.partial(trainer.train_step, cfg, statics))
        state, m0 = step_fn(state, batch)
        losses_seen = [float(m0["loss"])]
        for _ in range(12):
            state, m = step_fn(state, batch)
            losses_seen.append(float(m["loss"]))
        assert losses_seen[-1] < losses_seen[0]
        assert int(state.step) == 13
        assert np.isfinite(losses_seen).all()
        assert int(m["num_points/Background"]) > 0

    def test_refinement_in_step_grows_points(self):
        key = jax.random.key(5)
        scene = synthetic.make_scene(key, num_bg=200, width=32, height=32)
        cfg = small_cfg(affine_model="none", sky_model="none",
                        density=density.DensityConfig(
                            refine_interval=3, warmup_steps=0,
                            reset_alpha_interval=10000,
                            densify_grad_thresh=0.0),
                        scene_scale=0.001)   # everything counts as "large"
        params, statics, aux, masks = build_synthetic(key, cfg, scene, 1024)
        target = jax.random.uniform(key, (32, 32, 3))
        batch = synthetic.make_batch(scene, 0, target)
        state = trainer.init_state(key, cfg, params, masks, aux)
        step_fn = jax.jit(functools.partial(trainer.train_step, cfg, statics))
        n0 = int(state.masks["Background"].sum())
        for _ in range(10):
            state, m = step_fn(state, batch)
        n1 = int(state.masks["Background"].sum())
        assert n1 > n0
        assert np.isfinite(float(m["loss"]))

    def test_step_shapes_stable(self):
        # masks/params shapes identical across steps (no recompile triggers)
        key = jax.random.key(2)
        scene = synthetic.make_scene(key, num_bg=100, width=32, height=32)
        cfg = small_cfg(affine_model="affine", sky_model="mlp")
        params, statics, aux, masks = build_synthetic(key, cfg, scene, 128)
        batch = synthetic.make_batch(scene, 0,
                                     jnp.zeros((32, 32, 3)))
        state = trainer.init_state(key, cfg, params, masks, aux)
        step_fn = jax.jit(functools.partial(trainer.train_step, cfg, statics))
        s1, _ = step_fn(state, batch)
        s2, _ = step_fn(s1, batch)
        assert jax.tree.structure(s1.params) == jax.tree.structure(s2.params)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            assert a.shape == b.shape


class TestLosses:
    def test_ssim_identity(self):
        img = jax.random.uniform(jax.random.key(0), (32, 32, 3))
        assert float(losses.ssim(img, img)) > 0.999

    def test_ssim_differs(self):
        img = jax.random.uniform(jax.random.key(0), (32, 32, 3))
        other = jax.random.uniform(jax.random.key(1), (32, 32, 3))
        assert float(losses.ssim(img, other)) < 0.5

    def test_ssim_matches_depthwise_conv(self):
        # the banded-matmul formulation must match the reference's
        # pytorch_msssim-style 11x11 depthwise conv exactly
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(0)
        a = rng.rand(40, 52, 3).astype("float32")
        b = rng.rand(40, 52, 3).astype("float32")
        ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
        x = np.arange(11) - 5
        g = np.exp(-(x ** 2) / (2 * 1.5 ** 2))
        g = (g / g.sum()).astype("float32")
        k = torch.tensor(np.outer(g, g))[None, None].repeat(3, 1, 1, 1)
        ta = torch.tensor(a).permute(2, 0, 1)[None]
        tb = torch.tensor(b).permute(2, 0, 1)[None]
        conv = lambda t: F.conv2d(t, k, groups=3)
        mx, my = conv(ta), conv(tb)
        sx = conv(ta * ta) - mx * mx
        sy = conv(tb * tb) - my * my
        sxy = conv(ta * tb) - mx * my
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        s = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
            (mx * mx + my * my + c1) * (sx + sy + c2))
        assert abs(ours - float(s.mean())) < 1e-5

    def test_safe_bce_grads_preserved(self):
        # gradient exists even at clipped predictions (losses.py SafeBCE)
        g = jax.grad(lambda x: losses.safe_bce(x, jnp.ones_like(x)))(
            jnp.array([0.001, 0.5, 0.999]))
        assert (np.asarray(g) != 0).all()
        assert np.isfinite(np.asarray(g)).all()

    def test_depth_loss_masks_invalid(self):
        pred = jnp.full((8, 8), 10.0)
        gt = jnp.zeros((8, 8)).at[0, 0].set(10.0)   # single valid hit
        l = losses.depth_loss(pred, gt, loss_type="l1")
        np.testing.assert_allclose(float(l), 0.0, atol=1e-6)
        gt2 = jnp.zeros((8, 8)).at[0, 0].set(20.0)
        l2 = losses.depth_loss(pred, gt2, loss_type="l1")
        np.testing.assert_allclose(float(l2), 10.0 / 80.0, atol=1e-5)

    def test_inverse_depth_smoothness(self):
        img = jnp.zeros((16, 16, 3))
        flat = jnp.ones((16, 16))
        assert float(losses.inverse_depth_smoothness(flat, img)) == 0.0
        bumpy = jax.random.uniform(jax.random.key(0), (16, 16))
        assert float(losses.inverse_depth_smoothness(bumpy, img)) > 0.0

    def test_dynamic_region_loss(self):
        """Dynamic-region weighted rgb loss (reference base.py:638-653):
        a dynamic-classes-only opacity render gates a masked L1 that starts
        after `start_from` and matches a hand-computed masked mean."""
        key = jax.random.key(3)
        scene = synthetic.make_scene(key, num_bg=300, width=64, height=48)
        cfg = small_cfg(use_rigid=True, w_dynamic_region=2.0,
                        dynamic_region_start_from=5)
        params, statics, aux, masks = build_synthetic(key, cfg, scene, 512)
        batch = synthetic.make_batch(
            scene, 1, jax.random.uniform(key, (48, 64, 3)))
        full = trainer.merge_statics(statics, aux)

        out = trainer.forward(cfg, params, full, masks, batch, 10)
        assert "Dynamic_opacity" in out
        dyn = np.asarray(out["Dynamic_opacity"][..., 0])
        assert (dyn > 0.2).any(), "rigid car should cover some pixels"
        # dynamic-only opacity is sparser than the full render's
        assert dyn.sum() < float(jnp.sum(out["opacity"]))

        loss = trainer.compute_losses(cfg, params, full, masks, out, batch,
                                      jnp.asarray(10))
        mask = (dyn > 0.2).astype(np.float32)
        l1 = np.abs(np.asarray(batch["pixels"]) - np.asarray(out["rgb"]))
        want = 2.0 * (l1 * mask[..., None]).sum() / (mask.sum() * 3.0)
        np.testing.assert_allclose(float(loss["vehicle_region_rgb"]), want,
                                   rtol=1e-5)
        # inactive before start_from
        loss0 = trainer.compute_losses(cfg, params, full, masks, out, batch,
                                       jnp.asarray(5))
        assert float(loss0["vehicle_region_rgb"]) == 0.0
        # test-set forward never renders the mask (torch.no_grad parity)
        out_t = trainer.forward(cfg, params, full, masks, batch, 10,
                                in_test_set=True)
        assert "Dynamic_opacity" not in out_t


class TestMultiStep:
    def test_scan_matches_sequential_steps(self):
        """trainer.train_multi_step (K steps in one program via lax.scan)
        must reproduce K sequential train_step calls exactly — state,
        per-sub-step metrics, and refinement firing included."""
        key = jax.random.key(9)
        scene = synthetic.make_scene(key, num_bg=200, width=48, height=32)
        cfg = small_cfg(sky_model="none", affine_model="none",
                        density=density.DensityConfig(refine_interval=2,
                                                      warmup_steps=0))
        params, statics, aux, masks = build_synthetic(key, cfg, scene, 256)
        batches = [synthetic.make_batch(
            scene, f % scene.num_frames,
            jax.random.uniform(jax.random.fold_in(key, f), (32, 48, 3)))
            for f in range(3)]

        s_seq = trainer.init_state(key, cfg, params, masks, aux)
        step_fn = jax.jit(functools.partial(trainer.train_step, cfg,
                                            statics))
        ms_seq = []
        for b in batches:
            s_seq, m = step_fn(s_seq, b)
            ms_seq.append(m)

        s_multi = trainer.init_state(key, cfg, params, masks, aux)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        s_multi, ms = jax.jit(functools.partial(
            trainer.train_multi_step, cfg, statics))(s_multi, stacked)

        assert int(s_multi.step) == int(s_seq.step) == 3
        for j, m in enumerate(ms_seq):
            for kk in m:
                np.testing.assert_allclose(
                    np.asarray(ms[kk][j]), np.asarray(m[kk]), atol=1e-6,
                    err_msg=f"metric {kk} sub-step {j}")
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(s_multi.params),
                jax.tree_util.tree_leaves_with_path(s_seq.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6,
                err_msg=f"param {jax.tree_util.keystr(ka)}")
