import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilateral_driving_tpu.core import gaussians, sampling, sh, transforms


class TestTransforms:
    def test_quat_rotmat_roundtrip(self):
        q = gaussians.random_quats(jax.random.key(0), 64)
        R = transforms.quat_to_rotmat(q)
        # orthonormality
        np.testing.assert_allclose(R @ R.swapaxes(-1, -2),
                                   np.broadcast_to(np.eye(3), (64, 3, 3)),
                                   atol=1e-5)
        assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)
        q2 = transforms.rotmat_to_quat(R)
        R2 = transforms.quat_to_rotmat(q2)
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_quat_mult_matches_matmul(self):
        k1, k2 = jax.random.split(jax.random.key(1))
        q1 = gaussians.random_quats(k1, 16)
        q2 = gaussians.random_quats(k2, 16)
        R = transforms.quat_to_rotmat(transforms.quat_mult(q1, q2))
        R2 = transforms.quat_to_rotmat(q1) @ transforms.quat_to_rotmat(q2)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_slerp_endpoints_and_unit(self):
        k1, k2 = jax.random.split(jax.random.key(2))
        q0 = gaussians.random_quats(k1, 8)
        q1 = gaussians.random_quats(k2, 8)
        for t, ref in [(0.0, q0), (1.0, q1)]:
            out = transforms.quat_slerp(q0, q1, t)
            R_out = transforms.quat_to_rotmat(out)
            R_ref = transforms.quat_to_rotmat(ref)
            np.testing.assert_allclose(R_out, R_ref, atol=1e-4)
        mid = transforms.quat_slerp(q0, q1, 0.5)
        np.testing.assert_allclose(np.linalg.norm(mid, axis=-1), 1.0, atol=1e-5)

    def test_axis_angle(self):
        aa = jnp.array([[0.0, 0.0, jnp.pi / 2], [0.0, 0.0, 0.0]])
        R = transforms.axis_angle_to_rotmat(aa)
        np.testing.assert_allclose(
            R[0] @ jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]),
            atol=1e-6)
        np.testing.assert_allclose(R[1], np.eye(3), atol=1e-6)
        Rq = transforms.quat_to_rotmat(transforms.axis_angle_to_quat(aa))
        np.testing.assert_allclose(Rq, R, atol=1e-6)

    def test_rotation_6d(self):
        q = gaussians.random_quats(jax.random.key(3), 8)
        R = transforms.quat_to_rotmat(q)
        d6 = transforms.matrix_to_rotation_6d(R)
        np.testing.assert_allclose(transforms.rotation_6d_to_matrix(d6), R,
                                   atol=1e-5)

    def test_se3(self):
        q = gaussians.random_quats(jax.random.key(4), 4)
        R = transforms.quat_to_rotmat(q)
        t = jax.random.normal(jax.random.key(5), (4, 3))
        T = transforms.se3_compose(R, t)
        np.testing.assert_allclose(T @ transforms.se3_inverse(T),
                                   np.broadcast_to(np.eye(4), (4, 4, 4)),
                                   atol=1e-5)
        pts = jax.random.normal(jax.random.key(6), (4, 10, 3))
        out = transforms.transform_points(T, pts)
        ref = (R @ pts.swapaxes(-1, -2)).swapaxes(-1, -2) + t[:, None]
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestSH:
    def test_dc_only(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        coeffs = sh.rgb_to_sh(rgb)[:, None, :]
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        out = sh.eval_sh(coeffs, dirs, 0, max_degree=0) + 0.5
        np.testing.assert_allclose(out, rgb, atol=1e-6)

    def test_degree_masking(self):
        key = jax.random.key(0)
        coeffs = jax.random.normal(key, (5, 16, 3))
        dirs = jax.random.normal(jax.random.key(1), (5, 3))
        full_deg1 = sh.eval_sh(coeffs[:, :4], dirs, 1, max_degree=1)
        masked = sh.eval_sh(coeffs, dirs, 1, max_degree=3)
        np.testing.assert_allclose(masked, full_deg1, atol=1e-5)

    def test_orthonormality(self):
        # Monte-Carlo check: int Y_i Y_j over the sphere = delta_ij / (4 pi)
        dirs = jax.random.normal(jax.random.key(2), (200000, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        basis = sh.eval_sh_bases(3, dirs)
        gram = (basis.T @ basis) / dirs.shape[0] * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


class TestGaussianState:
    def test_init_padding(self):
        params, mask = gaussians.init_params(jax.random.key(0), 128,
                                             num_points=100)
        assert params.capacity == 128
        assert int(mask.sum()) == 100
        assert np.all(np.asarray(params.opacities[100:]) < 1e-6)
        np.testing.assert_allclose(params.opacities[:100], 0.1, atol=1e-5)

    def test_covariance_psd(self):
        params, _ = gaussians.init_params(jax.random.key(1), 32, num_points=32)
        cov = gaussians.covariance3d(params)
        eig = np.linalg.eigvalsh(np.asarray(cov))
        assert (eig > -1e-9).all()


class TestSampling:
    def test_sphere_shell(self):
        pts = sampling.uniform_sample_sphere(jax.random.key(0), 5000, 2.0, 5.0)
        r = np.linalg.norm(np.asarray(pts), axis=-1)
        assert r.min() >= 2.0 - 1e-5 and r.max() <= 5.0 + 1e-5

    def test_knn_mean_distance_grid(self):
        # regular 1D grid: nearest-3 mean distance is known
        pts = jnp.stack([jnp.arange(32, dtype=jnp.float32),
                         jnp.zeros(32), jnp.zeros(32)], axis=1)
        d = sampling.knn_mean_distance(pts, k=2, chunk=16)
        # interior points: two neighbors at distance 1
        np.testing.assert_allclose(d[1:-1], 1.0, atol=1e-5)
        np.testing.assert_allclose(d[0], 1.5, atol=1e-5)
