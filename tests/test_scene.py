"""Scene-graph node classes: transforms, masking, SMPL LBS, density control."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilateral_driving_tpu.core import transforms
from bilateral_driving_tpu.scene import (background, deformable, nodes, pvg,
                                         rigid, smpl_model, smpl_node,
                                         voxel_deformer)
from bilateral_driving_tpu.train import density, setup


class TestBackground:
    def test_bundle_and_mask(self):
        key = jax.random.key(0)
        means = jax.random.normal(key, (50, 3))
        colors = jax.random.uniform(key, (50, 3))
        params, mask = setup.build_background(key, 64, means, colors)
        b = background.gaussians(params, mask, jnp.zeros(3), 0)
        assert b.means.shape == (64, 3)
        assert float(b.opacities[50:].max()) == 0.0
        assert float(b.opacities[:50].min()) > 0.0

    def test_reg_losses(self):
        key = jax.random.key(1)
        params, mask = setup.build_background(
            key, 32, jax.random.normal(key, (32, 3)),
            jax.random.uniform(key, (32, 3)))
        regs = {"sharp_shape_reg": {"w": 1.0, "max_gauss_ratio": 10.0,
                                    "step_interval": 10},
                "flatten": {"w": 1.0},
                "sparse_reg": {"w": 1.0},
                "max_s_square_reg": {"w": 1.0}}
        out = background.reg_loss(params, mask, jnp.ones(32), 0, regs)
        for k, v in out.items():
            assert np.isfinite(float(v)), k


class TestPVG:
    def test_temporal_opacity_peak(self):
        key = jax.random.key(0)
        params, mask = setup.build_pvg_background(
            key, 32, jax.random.normal(key, (32, 3)),
            jax.random.uniform(key, (32, 3)),
            t_init=jnp.full((32,), 0.5))
        b_peak = pvg.gaussians(params, mask, jnp.zeros(3), 0, t=0.5)
        b_off = pvg.gaussians(params, mask, jnp.zeros(3), 0, t=0.9)
        assert float(b_peak.opacities.mean()) > float(b_off.opacities.mean())

    def test_vibration_displaces_means(self):
        key = jax.random.key(1)
        params, mask = setup.build_pvg_background(
            key, 16, jax.random.normal(key, (16, 3)),
            jax.random.uniform(key, (16, 3)), t_init=jnp.zeros(16))
        params["velocity"] = jnp.ones((16, 3))
        b0 = pvg.gaussians(params, mask, jnp.zeros(3), 0, t=0.0)
        b1 = pvg.gaussians(params, mask, jnp.zeros(3), 0, t=0.05)
        assert float(jnp.abs(b1.means - b0.means).max()) > 1e-3


class TestRigid:
    def _make(self, key, num_frames=5):
        means = jax.random.normal(key, (40, 3)) * 0.3
        colors = jax.random.uniform(key, (40, 3))
        pid = jnp.zeros((40,), jnp.int32)
        quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (num_frames, 1, 1))
        trans = jnp.arange(num_frames, dtype=jnp.float32)[:, None, None] * \
            jnp.array([[[1.0, 0, 0]]])
        fv = jnp.ones((num_frames, 1), bool)
        sizes = jnp.array([[2.0, 2.0, 2.0]])
        return setup.build_rigid(key, 64, means, colors, pid, quats, trans,
                                 fv, sizes)

    def test_translation_track(self):
        key = jax.random.key(0)
        params, statics, aux, mask = self._make(key)
        statics = {**statics, **aux}
        b0 = rigid.gaussians(params, statics, mask, jnp.zeros(3), 0, 0, 5)
        b3 = rigid.gaussians(params, statics, mask, jnp.zeros(3), 0, 3, 5)
        live = np.asarray(mask)
        shift = np.asarray(b3.means - b0.means)[live]
        np.testing.assert_allclose(shift, [[3.0, 0, 0]] * live.sum(),
                                   atol=1e-5)

    def test_invalid_frame_zero_opacity(self):
        key = jax.random.key(1)
        params, statics, aux, mask = self._make(key)
        statics["instances_fv"] = statics["instances_fv"].at[2, 0].set(False)
        statics = {**statics, **aux}
        b = rigid.gaussians(params, statics, mask, jnp.zeros(3), 0, 2, 5)
        assert float(b.opacities.max()) == 0.0

    def test_test_time_interpolation(self):
        key = jax.random.key(2)
        params, statics, aux, mask = self._make(key)
        statics = {**statics, **aux}
        b = rigid.gaussians(params, statics, mask, jnp.zeros(3), 0, 2, 5,
                            in_test_set=True)
        b_train = rigid.gaussians(params, statics, mask, jnp.zeros(3), 0, 2, 5)
        # linear track: interpolated == current
        live = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(b.means)[live],
                                   np.asarray(b_train.means)[live], atol=1e-4)

    def test_rotation_rotates_quats(self):
        key = jax.random.key(3)
        params, statics, aux, mask = self._make(key)
        yaw = jnp.pi / 2
        params["instances_quats"] = params["instances_quats"].at[1, 0].set(
            jnp.array([jnp.cos(yaw / 2), 0.0, jnp.sin(yaw / 2), 0.0]))
        statics = {**statics, **aux}
        b = rigid.gaussians(params, statics, mask, jnp.zeros(3), 0, 1, 5)
        R = transforms.quat_to_rotmat(b.quats[0])
        R_local = transforms.quat_to_rotmat(
            nodes.quat_norm(params["quats"][0]))
        R_ins = transforms.quat_to_rotmat(params["instances_quats"][1, 0])
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_ins @ R_local),
                                   atol=1e-5)


class TestSMPL:
    def test_rigid_transform_identity(self):
        model = smpl_model.synthetic_model(jax.random.key(0))
        _, joints = smpl_model.shape_model(model, jnp.zeros((2, 10)))
        rot = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        posed, A = smpl_model.batch_rigid_transform(rot, joints, model.parents)
        np.testing.assert_allclose(np.asarray(posed), np.asarray(joints),
                                   atol=1e-5)
        # identity pose -> A has identity rotation, zero translation
        np.testing.assert_allclose(np.asarray(A[..., :3, :3]),
                                   np.broadcast_to(np.eye(3), (2, 24, 3, 3)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(A[..., :3, 3]), 0.0, atol=1e-5)

    def test_canonical_pose_roundtrip(self):
        # posing with the canonical da-pose quats must reproduce the
        # canonical template vertices exactly (A·A0^-1 = I)
        model = smpl_model.synthetic_model(jax.random.key(1))
        betas = 0.5 * jax.random.normal(jax.random.key(2), (1, 10))
        template = smpl_model.make_template(model, betas)
        theta = jnp.broadcast_to(smpl_model.da_pose_quats(), (1, 24, 4))
        A = smpl_model.skinning_transforms(template, theta)
        posed, _ = smpl_model.lbs_apply(template.lbs_weights, A,
                                        template.verts_canonical)
        np.testing.assert_allclose(np.asarray(posed),
                                   np.asarray(template.verts_canonical),
                                   atol=1e-4)

    def test_global_rotation(self):
        # rotating the root joint rotates all vertices (about root joint)
        model = smpl_model.synthetic_model(jax.random.key(3))
        template = smpl_model.make_template(model, jnp.zeros((1, 10)))
        base = smpl_model.da_pose_quats()
        yaw = jnp.pi / 2
        root = jnp.array([jnp.cos(yaw / 2), 0.0, 0.0, jnp.sin(yaw / 2)])
        theta = jnp.broadcast_to(base, (1, 24, 4))
        theta_rot = theta.at[0, 0].set(
            transforms.quat_mult(root, base[0]))
        A = smpl_model.skinning_transforms(template, theta_rot)
        posed, _ = smpl_model.lbs_apply(template.lbs_weights, A,
                                        template.verts_canonical)
        # verify rigid rotation: pairwise distances preserved vs canonical
        v0 = np.asarray(template.verts_canonical[0])
        v1 = np.asarray(posed[0])
        d0 = np.linalg.norm(v0[:10, None] - v0[None, :10], axis=-1)
        d1 = np.linalg.norm(v1[:10, None] - v1[None, :10], axis=-1)
        np.testing.assert_allclose(d1, d0, atol=1e-3)
        assert np.abs(v1 - v0).max() > 0.01  # actually moved

    def test_node_gaussians_shapes(self):
        key = jax.random.key(4)
        model = smpl_model.synthetic_model(key, num_verts=128)
        F, I = 4, 2
        betas = jnp.zeros((I, 10))
        root = jnp.broadcast_to(smpl_model.da_pose_quats()[0], (F, I, 1, 4))
        body = jnp.broadcast_to(smpl_model.da_pose_quats()[1:], (F, I, 23, 4))
        trans = jnp.zeros((F, I, 3))
        fv = jnp.ones((F, I), bool)
        params, statics, aux, mask = setup.build_smpl(
            key, model, betas, root, body, trans, fv)
        statics = {**statics, **aux}
        b = smpl_node.gaussians(params, statics, mask, jnp.zeros(3), 0, 1, F)
        assert b.means.shape == (I * 128, 3)
        assert np.isfinite(np.asarray(b.means)).all()
        assert float(b.opacities.min()) > 0

        regs = {"knn_reg": {"lambda_std_shs_dc": 1.0, "lambda_std_o": 1.0,
                            "lambda_std_s": 1.0, "lambda_std_q": 1.0,
                            "lambda_std_shs_rest": 1.0},
                "x_offset": {"w": 1.0}}
        out = smpl_node.knn_reg_loss(params, statics, statics["nn_ind"], 1,
                                     regs)
        for k, v in out.items():
            assert np.isfinite(float(v)), k
        js = smpl_node.joint_smoothness_loss(params, statics, 1, F, 1.0)
        assert np.isfinite(float(js))


class TestVoxelDeformer:
    def test_query_matches_mesh_weights(self):
        key = jax.random.key(0)
        model = smpl_model.synthetic_model(key, num_verts=64)
        verts = model.v_template[None]
        weights = model.lbs_weights[None]
        statics, params = voxel_deformer.init_voxel_deformer(
            verts, weights, resolution_dhw=(8, 16, 16), knn_k=8,
            smooth_iters=5)
        w = voxel_deformer.query_weights(statics, params, verts)
        assert w.shape == (1, 64, 24)
        # weights near-normalized and roughly matching mesh weights' argmax
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=0.05)
        agree = (np.asarray(w.argmax(-1)) ==
                 np.asarray(weights.argmax(-1))).mean()
        assert agree > 0.5
        assert float(voxel_deformer.tv_loss(params)) == 0.0
        assert float(voxel_deformer.mag_loss(params)) == 0.0


class TestDensity:
    def _params(self, key, cap=64, n=32):
        means = jax.random.normal(key, (n, 3))
        colors = jax.random.uniform(key, (n, 3))
        return setup.build_background(key, cap, means, colors)

    def test_split_on_high_grad_large_scale(self):
        key = jax.random.key(0)
        params, mask = self._params(key)
        params["log_scales"] = params["log_scales"].at[:32].set(jnp.log(0.5))
        stats = density.DensityStats(
            grad_norm=jnp.full(64, 10.0), vis_count=jnp.ones(64),
            max_radii=jnp.zeros(64), t_grad=jnp.zeros(64))
        cfg = density.DensityConfig(refine_interval=10, warmup_steps=0,
                                    reset_alpha_interval=10000)
        p2, aux2, alive, touched, info = density.refine(
            key, params, {}, mask, stats, 200, 1.0, cfg)
        assert int(info["splits"]) == 32
        assert int(alive.sum()) > 32          # children placed
        assert int(touched.sum()) == int(alive.sum()) - 32
        # parent scales shrank
        np.testing.assert_allclose(np.asarray(jnp.exp(p2["log_scales"][:32])),
                                   0.5 / 1.6, rtol=1e-5)

    def test_cull_low_opacity(self):
        key = jax.random.key(1)
        params, mask = self._params(key)
        params["logit_opacities"] = params["logit_opacities"].at[:16].set(-10.0)
        stats = density.DensityStats.zeros(64)
        cfg = density.DensityConfig(refine_interval=10, warmup_steps=0,
                                    reset_alpha_interval=10000)
        _, _, alive, _, info = density.refine(
            key, params, {}, mask, stats, 200, 1.0, cfg)
        assert int(info["culled"]) == 16
        assert int(alive.sum()) == 16

    def test_capacity_overflow_drops(self):
        key = jax.random.key(2)
        params, mask = self._params(key, cap=40, n=32)
        params["log_scales"] = params["log_scales"].at[:32].set(jnp.log(0.5))
        stats = density.DensityStats(
            grad_norm=jnp.full(40, 10.0), vis_count=jnp.ones(40),
            max_radii=jnp.zeros(40), t_grad=jnp.zeros(40))
        cfg = density.DensityConfig(refine_interval=10, warmup_steps=0,
                                    reset_alpha_interval=10000)
        _, _, alive, _, info = density.refine(
            key, params, {}, mask, stats, 200, 1.0, cfg)
        assert int(alive.sum()) == 40         # full but not corrupted
        assert int(info["dropped"]) > 0

    def test_opacity_reset(self):
        key = jax.random.key(3)
        params, mask = self._params(key)
        stats = density.DensityStats.zeros(64)
        cfg = density.DensityConfig(refine_interval=100, warmup_steps=0,
                                    reset_alpha_interval=3000,
                                    reset_alpha_value=0.01)
        p2, _, _, _, info = density.refine(
            key, params, {}, mask, stats, 3100, 1.0, cfg)
        op = jax.nn.sigmoid(p2["logit_opacities"][np.asarray(mask)])
        assert float(op.max()) <= 0.0101

    def test_aux_copied_to_children(self):
        key = jax.random.key(4)
        params, mask = self._params(key)
        params["log_scales"] = params["log_scales"].at[:32].set(jnp.log(0.5))
        pid = jnp.arange(64, dtype=jnp.int32) % 7
        stats = density.DensityStats(
            grad_norm=jnp.full(64, 10.0), vis_count=jnp.ones(64),
            max_radii=jnp.zeros(64), t_grad=jnp.zeros(64))
        cfg = density.DensityConfig(refine_interval=10, warmup_steps=0,
                                    reset_alpha_interval=10000,
                                    n_split_samples=1)
        p2, aux2, alive, touched, _ = density.refine(
            key, params, {"point_ids": pid}, mask, stats, 200, 1.0, cfg)
        # each child inherits its parent's id; children fill slots 32..63
        child = np.asarray(touched)
        src_ids = np.asarray(pid[:32])
        child_ids = np.asarray(aux2["point_ids"])[child]
        assert set(child_ids).issubset(set(src_ids))

    def _pvg_params(self, key, cap=64, n=32):
        means = jax.random.normal(key, (n, 3)) * 0.1
        colors = jax.random.uniform(key, (n, 3))
        return setup.build_pvg_background(key, cap, means, colors,
                                          beta_init=0.1)

    def test_pvg_t_grad_splits_along_time(self):
        """High |dL/dtau| + wide temporal extent -> split along time
        (reference pvg.py:166-199,329-353): children perturb taus, spatial
        scale stays when only t triggered, no_time_split keeps betas."""
        key = jax.random.key(5)
        params, mask = self._pvg_params(key)
        # small spatial scales (no xyz densify), wide temporal extent
        params["log_scales"] = jnp.full_like(params["log_scales"],
                                             jnp.log(1e-4))
        params["log_betas"] = params["log_betas"].at[:32].set(jnp.log(0.05))
        params["taus"] = params["taus"].at[:32].set(0.3)
        stats = density.DensityStats(
            grad_norm=jnp.zeros(64), vis_count=jnp.ones(64),
            max_radii=jnp.zeros(64),
            t_grad=jnp.zeros(64).at[:16].set(10.0))  # only first 16 high-t
        cfg = density.DensityConfig(refine_interval=10, warmup_steps=0,
                                    reset_alpha_interval=10000,
                                    densify_t_grad_thresh=0.002,
                                    densify_t_size_thresh=0.01,
                                    n_split_samples=1)
        p2, _, alive, touched, info = density.refine(
            key, params, {}, mask, stats, 200, 1.0, cfg,
            pvg_cycle=0.2)
        # high-t + small-spatial points both split (t) AND dup (xyz), exactly
        # like the reference (dups_xyz = ~big & high_grads, high_grads
        # includes high_t — pvg.py:165-201)
        assert int(info["splits"]) == 16
        assert int(info["dups"]) == 16
        child = np.asarray(touched)
        assert child.sum() == 32
        # split children's taus moved off the parent value; dup children
        # copy it exactly
        child_taus = np.asarray(p2["taus"])[child]
        assert (child_taus == 0.3).sum() == 16          # the dups
        assert (~np.isclose(child_taus, 0.3)).sum() == 16  # the t-splits
        # t-triggered split leaves child spatial scale untouched (dup copies
        # may carry the post-split parent shrink)
        ls = np.asarray(p2["log_scales"])[child]
        assert np.all(np.isclose(ls, np.log(1e-4), rtol=1e-5)
                      | np.isclose(ls, np.log(1e-4 / 1.6), rtol=1e-5))
        # no_time_split (pvg.yaml): betas inherited unchanged
        np.testing.assert_allclose(
            np.asarray(jnp.exp(p2["log_betas"]))[child], 0.05, rtol=1e-5)

    def test_pvg_t_grad_dup_when_narrow(self):
        """High t-grad but temporal extent under densify_t_size_thresh ->
        duplicate, not split (pvg.py:199-201)."""
        key = jax.random.key(6)
        params, mask = self._pvg_params(key)
        params["log_scales"] = jnp.full_like(params["log_scales"],
                                             jnp.log(1e-4))
        params["log_betas"] = params["log_betas"].at[:32].set(jnp.log(0.005))
        stats = density.DensityStats(
            grad_norm=jnp.zeros(64), vis_count=jnp.ones(64),
            max_radii=jnp.zeros(64),
            t_grad=jnp.zeros(64).at[:16].set(10.0))
        cfg = density.DensityConfig(refine_interval=10, warmup_steps=0,
                                    reset_alpha_interval=10000,
                                    densify_t_grad_thresh=0.002,
                                    densify_t_size_thresh=0.01,
                                    n_split_samples=1)
        _, _, alive, touched, info = density.refine(
            key, params, {}, mask, stats, 200, 1.0, cfg,
            pvg_cycle=0.2)
        assert int(info["splits"]) == 0
        assert int(info["dups"]) == 16

    def test_pvg_densify_until_num_points(self):
        """Saturated PVG class stops growing (pvg.py:158-160)."""
        key = jax.random.key(7)
        params, mask = self._pvg_params(key)
        params["log_betas"] = params["log_betas"].at[:32].set(jnp.log(0.05))
        stats = density.DensityStats(
            grad_norm=jnp.zeros(64), vis_count=jnp.ones(64),
            max_radii=jnp.zeros(64), t_grad=jnp.full((64,), 10.0))
        cfg = density.DensityConfig(refine_interval=10, warmup_steps=0,
                                    reset_alpha_interval=10000,
                                    densify_t_grad_thresh=0.002,
                                    densify_until_num_points=8,
                                    n_split_samples=1)
        _, _, alive, touched, info = density.refine(
            key, params, {}, mask, stats, 200, 1.0, cfg, pvg_cycle=0.2)
        assert int(info["splits"]) == 0 and int(info["dups"]) == 0
