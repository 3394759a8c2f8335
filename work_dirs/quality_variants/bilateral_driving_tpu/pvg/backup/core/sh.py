"""Real spherical-harmonics color evaluation (degrees 0..3).

Replaces the gsplat CUDA `spherical_harmonics` kernel used throughout the
reference (project/models/gaussians/basics.py:15; e.g. vanilla.py:384-389).
Pure jnp polynomial evaluation — XLA fuses it into the surrounding elementwise
graph and autodiff provides the backward pass, so no hand-written kernel is
needed: at N≈1e6 Gaussians this is bandwidth-trivial next to rasterization.

Conventions match gsplat/3DGS: coefficients are (N, K, 3) with K = (deg+1)^2
bases; `masked degree` evaluation zeroes bases above the active degree so the
array shapes stay static while the degree schedule ramps (reference schedules
sh_degree_interval; see vanilla.py:382).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    """gsplat `num_sh_bases` equivalent (basics.py:13)."""
    return (degree + 1) ** 2


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    """RGB2SH (reference: basics.py:76-82): DC coefficient from color."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    """SH2RGB (reference: basics.py:84-89)."""
    return sh * C0 + 0.5


def eval_sh_bases(degree: int, dirs: jax.Array) -> jax.Array:
    """Evaluate SH basis functions for unit directions.

    Args:
      degree: static max degree in [0, 3].
      dirs: (..., 3) unit view directions.
    Returns:
      (..., (degree+1)^2) basis values.
    """
    if not 0 <= degree <= 3:
        raise ValueError(f"SH degree must be in [0,3], got {degree}")
    out = [jnp.full(dirs.shape[:-1], C0, dtype=dirs.dtype)]
    if degree >= 1:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(
    coeffs: jax.Array,
    dirs: jax.Array,
    active_degree: jax.Array | int,
    max_degree: int = 3,
) -> jax.Array:
    """View-dependent color from SH coefficients.

    Mirrors gsplat's `spherical_harmonics(degrees_to_use, viewdirs, coeffs)`:
    bases above `active_degree` are masked to zero (static shapes, traced
    degree allowed), then `clamp(result + 0.5, min=0)` is applied by callers
    exactly where the reference does (vanilla.py:389).

    Args:
      coeffs: (..., K, 3) with K = num_sh_bases(max_degree).
      dirs: (..., 3) directions (normalized internally).
      active_degree: int or traced scalar — bases of degree > this are masked.
    Returns:
      (..., 3) raw SH colors (add 0.5 and clamp outside).
    """
    # grad-safe at dirs = 0 (a gaussian exactly at the camera origin:
    # zero-range lidar returns create such points, and cam_origin is
    # differentiable under camera opt) — see transforms.safe_normalize
    dirs = dirs * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-16))
    basis = eval_sh_bases(max_degree, dirs)  # (..., K)
    k = basis.shape[-1]
    base_degrees = jnp.array(
        [d for d in range(max_degree + 1) for _ in range(2 * d + 1)],
        dtype=jnp.int32,
    )[:k]
    mask = (base_degrees <= jnp.asarray(active_degree)).astype(basis.dtype)
    basis = basis * mask
    return jnp.einsum("...k,...kc->...c", basis, coeffs)
