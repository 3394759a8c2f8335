"""Gradient safety at geometric degeneracies (round-5 PVG collapse).

The `x / maximum(norm(x), eps)` idiom is forward-safe but backward-unsafe:
`jnp.linalg.norm`'s VJP is x/||x|| = 0/0 = NaN at the origin, and
`maximum` routes a ZERO cotangent into it — 0 * NaN = NaN. One PVG lidar
point sitting exactly at a camera origin poisoned the camera-opt
translation gradient through the SH viewdir normalize, and from there the
entire background within one optimizer step (the run then kept "training"
a sky-only scene with finite losses — invisible to the NaN guard). These
tests pin finite gradients at every such degeneracy.
"""
import numpy as np

import jax
import jax.numpy as jnp

from bilateral_driving_tpu.core import sh as sh_lib, transforms
from bilateral_driving_tpu.models import camera_opt
from bilateral_driving_tpu.scene import nodes


def _finite(g):
    return all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_safe_norm_and_normalize_at_zero():
    g = jax.grad(lambda x: jnp.sum(transforms.safe_norm(x)))(jnp.zeros(3))
    assert _finite(g) and np.allclose(np.asarray(g), 0.0)
    g = jax.grad(lambda x: jnp.sum(transforms.safe_normalize(x)))(
        jnp.zeros(3))
    assert _finite(g)
    # away from zero they match the plain formulas
    x = jnp.array([0.3, -2.0, 1.1])
    np.testing.assert_allclose(
        np.asarray(transforms.safe_norm(x, keepdims=False)),
        np.linalg.norm(np.asarray(x)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(transforms.safe_normalize(x)),
        np.asarray(x) / np.linalg.norm(np.asarray(x)), rtol=1e-6)


def test_axis_angle_grad_at_identity():
    """Canonical SMPL poses hit aa = 0 exactly; both conversions must have
    finite gradients there (and produce the identity)."""
    aa0 = jnp.zeros(3)
    np.testing.assert_allclose(
        np.asarray(transforms.axis_angle_to_rotmat(aa0)), np.eye(3),
        atol=1e-7)
    q = transforms.axis_angle_to_quat(aa0)
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-7)
    assert _finite(jax.grad(
        lambda a: jnp.sum(transforms.axis_angle_to_rotmat(a)))(aa0))
    assert _finite(jax.grad(
        lambda a: jnp.sum(transforms.axis_angle_to_quat(a)))(aa0))


def test_rotation_6d_grad_at_degenerate_input():
    """a2 parallel to a1 makes the Gram-Schmidt residual exactly zero."""
    d6 = jnp.array([1.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    assert _finite(jax.grad(
        lambda d: jnp.sum(transforms.rotation_6d_to_matrix(d)))(d6))
    # healthy inputs still produce orthonormal frames
    d6 = jnp.array([1.0, 0.2, -0.3, 0.1, 1.0, 0.4])
    R = np.asarray(transforms.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_sh_viewdir_grad_with_point_at_camera_origin():
    """The exact round-5 poisoning scenario: one gaussian AT the camera
    origin, gradients taken wrt the camera origin (the camera-opt
    translation path). Must be finite."""
    n = 4
    means = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 2.0],
                       [0.0, 1.0, 3.0], [-1.0, -1.0, 4.0]])
    sh_dc = jnp.ones((n, 1, 3)) * 0.2
    sh_rest = jnp.ones((n, 8, 3)) * 0.05

    def f(cam_origin):
        rgb = nodes.sh_colors(means, sh_dc, sh_rest, cam_origin,
                              step=2000, sh_degree_interval=1000,
                              max_degree=2)
        return jnp.sum(rgb)

    g = jax.grad(f)(jnp.zeros(3))   # camera at the first gaussian, exactly
    assert _finite(g), g


def test_camera_opt_grad_with_point_at_camera_origin():
    """End-to-end through apply_camera_opt: a zero-range point must not
    NaN the per-image embed gradient (translation OR rotation)."""
    params = camera_opt.init_camera_opt(jax.random.PRNGKey(0), 3)
    c2w = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    means = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 10.0]])
    sh_dc = jnp.ones((2, 1, 3)) * 0.1
    sh_rest = jnp.ones((2, 8, 3)) * 0.02

    def f(p):
        c = camera_opt.apply_camera_opt(p, c2w, 1)
        rgb = nodes.sh_colors(means, sh_dc, sh_rest, c[:3, 3],
                              step=5000, sh_degree_interval=1000,
                              max_degree=2)
        return jnp.sum(rgb)

    g = jax.grad(f)(params)
    assert _finite(g), g


def test_eval_sh_grad_at_zero_dir():
    g = jax.grad(lambda d: jnp.sum(sh_lib.eval_sh(
        jnp.ones((1, 9, 3)), d, 2, max_degree=2)))(jnp.zeros((1, 3)))
    assert _finite(g)
