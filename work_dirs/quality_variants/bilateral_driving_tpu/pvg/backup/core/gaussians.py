"""Gaussian parameter state as a static-capacity pytree.

The reference grows/shrinks `nn.Parameter` tensors during adaptive density
control (torch.cat in vanilla.py:206-302 plus optimizer surgery in
basics.py:162-206). Under XLA everything must be static-shaped, so the
TPU-native design allocates a fixed `capacity` per Gaussian class and tracks
liveness with a boolean `mask`; split/dup/cull are masked scatter ops into the
same buffers (see train/density.py) and the optimizer state is reset by the
same masks — no re-jitting per refinement.

Parameterization matches 3DGS / the reference (vanilla.py:30-77):
  means            (C, 3)   world/local positions
  log_scales       (C, 3)   exp -> scales
  quats            (C, 4)   wxyz, normalized on use
  logit_opacities  (C, 1)   sigmoid -> opacity
  sh_dc            (C, 1, 3) DC SH coefficients
  sh_rest          (C, K-1, 3) higher-order SH
  mask             (C,)    liveness
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from . import sh as sh_lib
from . import transforms


@struct.dataclass
class GaussianParams:
    means: jax.Array
    log_scales: jax.Array
    quats: jax.Array
    logit_opacities: jax.Array
    sh_dc: jax.Array
    sh_rest: jax.Array

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        k = 1 + self.sh_rest.shape[1]
        return int(round(k ** 0.5)) - 1

    @property
    def scales(self) -> jax.Array:
        return jnp.exp(self.log_scales)

    @property
    def opacities(self) -> jax.Array:
        return jax.nn.sigmoid(self.logit_opacities)

    @property
    def sh_coeffs(self) -> jax.Array:
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)

    def colors(self, camera_origin: jax.Array, active_degree) -> jax.Array:
        """View-dependent RGB, clamp(sh+0.5, 0) like vanilla.py:384-389."""
        viewdirs = self.means - camera_origin[None, :]
        rgb = sh_lib.eval_sh(self.sh_coeffs, viewdirs, active_degree,
                             max_degree=self.sh_degree)
        return jnp.clip(rgb + 0.5, 0.0, None)


def init_params(
    key: jax.Array,
    capacity: int,
    num_points: int | None = None,
    *,
    means: Optional[jax.Array] = None,
    colors: Optional[jax.Array] = None,
    scales: Optional[jax.Array] = None,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    dtype=jnp.float32,
) -> tuple[GaussianParams, jax.Array]:
    """Create a padded GaussianParams + mask from an (optional) point cloud.

    Mirrors `create_from_pcd` (vanilla.py:79-121): scales from KNN mean
    distance (caller supplies; defaults to 0.02), random quats, opacity 0.1,
    DC SH from RGB. Entries >= num_points are dead (mask False, opacity -inf).
    """
    if means is not None:
        num_points = means.shape[0]
    assert num_points is not None and num_points <= capacity
    k_means, k_quat, k_col = jax.random.split(key, 3)

    def pad(x, fill=0.0):
        pad_width = [(0, capacity - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x.astype(dtype), pad_width, constant_values=fill)

    if means is None:
        means = jax.random.uniform(k_means, (num_points, 3), minval=-1.0, maxval=1.0)
    if colors is None:
        colors = jax.random.uniform(k_col, (num_points, 3))
    if scales is None:
        scales = jnp.full((num_points, 3), 0.02)
    elif scales.ndim == 1:
        scales = jnp.repeat(scales[:, None], 3, axis=1)

    quats = random_quats(k_quat, num_points).astype(dtype)
    # dead slots must NOT hold zero quats: normalizing a zero quaternion
    # produces inf*0 = NaN in the backward pass even under zero cotangents
    quats = jnp.concatenate(
        [quats, jnp.tile(jnp.array([[1.0, 0, 0, 0]], dtype),
                         (capacity - num_points, 1))])
    n_bases = sh_lib.num_sh_bases(sh_degree)
    sh_dc = sh_lib.rgb_to_sh(colors)[:, None, :]
    sh_rest = jnp.zeros((num_points, n_bases - 1, 3), dtype)

    logit_op = jnp.full((num_points, 1), _logit(init_opacity), dtype)
    mask = jnp.arange(capacity) < num_points
    params = GaussianParams(
        means=pad(means),
        log_scales=pad(jnp.log(jnp.maximum(scales, 1e-8))),
        quats=quats,
        # dead slots get strongly negative opacity so they never render even
        # if a mask is dropped somewhere downstream
        logit_opacities=jnp.where(mask[:, None], pad(logit_op), -20.0),
        sh_dc=pad(sh_dc),
        sh_rest=pad(sh_rest),
    )
    return params, mask


def _logit(p: float) -> float:
    return float(jnp.log(p / (1.0 - p)))


def random_quats(key: jax.Array, n: int) -> jax.Array:
    """Uniform random unit quaternions (reference: basics.py:47-62)."""
    u, v, w = jnp.split(jax.random.uniform(key, (n, 3)), 3, axis=-1)
    return jnp.concatenate(
        [
            jnp.sqrt(1.0 - u) * jnp.sin(2.0 * jnp.pi * v),
            jnp.sqrt(1.0 - u) * jnp.cos(2.0 * jnp.pi * v),
            jnp.sqrt(u) * jnp.sin(2.0 * jnp.pi * w),
            jnp.sqrt(u) * jnp.cos(2.0 * jnp.pi * w),
        ],
        axis=-1,
    )


def covariance3d(params: GaussianParams) -> jax.Array:
    """Sigma = R S S^T R^T per Gaussian, (C, 3, 3)."""
    R = transforms.quat_to_rotmat(params.quats)
    S = params.scales
    RS = R * S[..., None, :]
    return RS @ RS.swapaxes(-1, -2)
