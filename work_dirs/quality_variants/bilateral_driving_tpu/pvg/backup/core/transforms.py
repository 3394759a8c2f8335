"""Rotation / rigid-transform math as pure jnp functions.

Covers the quaternion and rotation utilities the reference pulls from
pytorch3d.transforms and gsplat helpers (reference:
project/models/gaussians/basics.py:10-76, project/utils/geometry.py:7-100,
project/models/human_body.py:12-16), re-derived for JAX.

Conventions: quaternions are (w, x, y, z), matching gsplat/pytorch3d.
All functions broadcast over leading batch dimensions and are autodiff-safe
(no in-place ops, guarded divisions/sqrt).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def safe_norm(x: jax.Array, axis=-1, keepdims: bool = True,
              eps: float = _EPS) -> jax.Array:
    """L2 norm with a finite gradient at x = 0.

    `jnp.maximum(jnp.linalg.norm(x), eps)` is forward-safe but BACKWARD-
    UNSAFE: norm's own VJP is x/||x|| = 0/0 = NaN at the origin, and
    maximum routes a ZERO cotangent into it — but 0 * NaN = NaN, which
    then poisons every parameter upstream (round-5 finding: one PVG lidar
    point exactly at a camera origin NaN'd the camera-opt translation via
    the SH viewdir normalize, and from there the whole background).
    Clamping the SQUARED norm before the sqrt keeps every intermediate
    derivative finite; below eps the gradient is exactly 0."""
    sq = jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=keepdims),
                     eps * eps)
    return jnp.sqrt(sq)


def safe_normalize(x: jax.Array, axis=-1, eps: float = _EPS) -> jax.Array:
    """x / ||x|| with a finite gradient at x = 0 (see safe_norm)."""
    sq = jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps * eps)
    return x * jax.lax.rsqrt(sq)


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternions to unit norm, safely at 0 — including the
    backward pass (rsqrt of a clamped square-norm; `norm` would produce
    inf*0 = NaN gradients at q = 0)."""
    sq = jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), _EPS * _EPS)
    return q * jax.lax.rsqrt(sq)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select the best-conditioned one with `where` — idiomatic
    for XLA (no data-dependent control flow), unlike the reference's
    pytorch3d `matrix_to_quaternion`.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each scaled by 4*q_i^2 >= 0.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Diagonal dominance decides which candidate is numerically best.
    c0 = 1.0 + tr
    c1 = 1.0 + m00 - m11 - m22
    c2 = 1.0 - m00 + m11 - m22
    c3 = 1.0 - m00 - m11 + m22
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    best = jnp.argmax(cands, axis=-1)

    quats = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(quats, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonicalize sign (w >= 0).
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mult(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of wxyz quaternions (reference: basics.py:64-74)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical interpolation between unit quaternions.

    Matches the semantics of the reference's `interpolate_quats`
    (basics.py:17-45): shortest-arc slerp with a lerp fallback for nearly
    parallel quaternions, expressed with `where` instead of boolean indexing.
    """
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot_c = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot_c, 0.0, 1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(q0) - 1 else jnp.asarray(t)
    w0 = jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS)
    w1 = jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS)
    slerped = w0 * q0 + w1 * q1
    lerped = (1.0 - t) * q0 + t * q1
    out = jnp.where(dot > 0.9995, lerped, slerped)
    return quat_normalize(out)


def axis_angle_to_rotmat(aa: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3) via Rodrigues, safe at theta=0
    in BOTH passes (canonical poses hit aa = 0 exactly; see safe_norm)."""
    theta = safe_norm(aa)
    axis = safe_normalize(aa)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(aa.shape[:-1] + (3, 3))
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    return eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)


def axis_angle_to_quat(aa: jax.Array) -> jax.Array:
    theta = safe_norm(aa)
    axis = safe_normalize(aa)
    half = 0.5 * theta
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Zhou et al. continuous 6D rotation -> matrix (reference:
    project/utils/geometry.py:83-100); rows are the basis vectors."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = safe_normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = safe_normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def transform_points(matrix: jax.Array, points: jax.Array) -> jax.Array:
    """Apply a (..., 4, 4) homogeneous transform to (..., N, 3) points
    (reference: project/utils/geometry.py:7-20)."""
    return points @ matrix[..., :3, :3].swapaxes(-1, -2) + matrix[..., None, :3, 3]


def se3_compose(R: jax.Array, t: jax.Array) -> jax.Array:
    """Stack rotation (...,3,3) + translation (...,3) into (...,4,4)."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = R.swapaxes(-1, -2)
    return se3_compose(Rt, -(Rt @ t[..., None])[..., 0])


def interpolate_poses(T0: jax.Array, T1: jax.Array, t) -> jax.Array:
    """Slerp rotation + lerp translation between (...,4,4) poses
    (reference: project/utils/camera.py:10-56)."""
    q0 = rotmat_to_quat(T0[..., :3, :3])
    q1 = rotmat_to_quat(T1[..., :3, :3])
    q = quat_slerp(q0, q1, t)
    tr = (1.0 - t) * T0[..., :3, 3] + t * T1[..., :3, 3]
    return se3_compose(quat_to_rotmat(q), tr)
