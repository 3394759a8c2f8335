"""VoxelDeformer: learnable voxel grid of LBS skinning-weight corrections.

Counterpart of the reference's `VoxelDeformer`
(project/models/modules.py:1015-1226, from GART/Fast-SNARF): a per-instance
(J, D, H, W) voxel of LBS weights initialized from inverse-distance-weighted
KNN against the canonical mesh and Jacobi-smoothed, plus a zero-init learnable
correction queried by trilinear interpolation; TV and magnitude regularizers
on the correction.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.bilateral import grid_sample_3d

GLOBAL_SCALE = 1.2  # Fast-SNARF bbox padding (modules.py:1068)


class VoxelDeformerStatics(NamedTuple):
    lbs_voxel_base: jax.Array   # (B, J, D, H, W)
    offset: jax.Array           # (B, 3)
    scale: jax.Array            # (B,)
    ratio: float                # long/short resolution ratio (z compressed)


def _normalize(x, statics: VoxelDeformerStatics):
    """Canonical coords -> [-1,1]^3 sampling coords; z (short dim) scaled by
    `ratio` (modules.py:1186-1191)."""
    xn = (x - statics.offset[:, None]) / statics.scale[:, None, None]
    return xn.at[..., 2].multiply(statics.ratio)


def init_voxel_deformer(verts: jax.Array, weights: jax.Array,
                        resolution_dhw=(16, 64, 64), knn_k: int = 30,
                        smooth_iters: int = 30):
    """verts (B, V, 3), weights (B, V, J) -> (statics, params).

    Grid weights = inverse-distance KNN blend of mesh weights, then 30 Jacobi
    smoothing passes with renormalization (modules.py:1197-1226)."""
    B, V, _ = verts.shape
    J = weights.shape[-1]
    d, h, w = resolution_dhw
    ratio = float(max(resolution_dhw)) / float(d)

    bb_min = verts.min(axis=1)
    bb_max = verts.max(axis=1)
    offset = 0.5 * (bb_min + bb_max)
    scale = (bb_max - bb_min).max(axis=-1) / 2.0 * GLOBAL_SCALE

    xs = jnp.linspace(-1, 1, w)
    ys = jnp.linspace(-1, 1, h)
    zs = jnp.linspace(-1, 1, d)
    gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # (DHW, 3)
    # denormalize per instance (z un-compressed)
    grid_d = grid[None].at[..., 2].divide(ratio) * scale[:, None, None] \
        + offset[:, None]

    def weights_one(gpts, vts, wts):
        d2 = (jnp.sum(gpts * gpts, -1, keepdims=True)
              - 2.0 * gpts @ vts.T + jnp.sum(vts * vts, -1)[None])
        neg, idx = jax.lax.top_k(-d2, knn_k)
        dist = jnp.clip(jnp.sqrt(jnp.maximum(-neg, 0.0)), 1e-4, 1.0)
        ws = 1.0 / dist
        ws = ws / ws.sum(-1, keepdims=True)
        return jnp.einsum("nk,nkj->nj", ws, wts[idx])

    vox = jax.vmap(weights_one)(grid_d, verts, weights)     # (B, DHW, J)
    vox = vox.transpose(0, 2, 1).reshape(B, J, d, h, w)

    def smooth(vox, _):
        mean = (
            vox[:, :, 2:, 1:-1, 1:-1] + vox[:, :, :-2, 1:-1, 1:-1]
            + vox[:, :, 1:-1, 2:, 1:-1] + vox[:, :, 1:-1, :-2, 1:-1]
            + vox[:, :, 1:-1, 1:-1, 2:] + vox[:, :, 1:-1, 1:-1, :-2]
        ) / 6.0
        interior = (vox[:, :, 1:-1, 1:-1, 1:-1] - mean) * 0.7 + mean
        vox = vox.at[:, :, 1:-1, 1:-1, 1:-1].set(interior)
        return vox / vox.sum(1, keepdims=True), None

    vox, _ = jax.lax.scan(smooth, vox, None, length=smooth_iters)

    statics = VoxelDeformerStatics(
        lbs_voxel_base=vox, offset=offset, scale=scale, ratio=ratio)
    params = {"voxel_w_correction": jnp.zeros_like(vox)}
    return statics, params


def query_weights(statics: VoxelDeformerStatics, params, xc: jax.Array):
    """Trilinear query of (base + correction) at canonical points xc
    (B, N, 3) -> (B, N, J) (modules.py:1168-1184)."""
    vol = statics.lbs_voxel_base + params["voxel_w_correction"]
    coords = _normalize(xc, statics)
    return jax.vmap(grid_sample_3d)(vol, coords)


def tv_loss(params) -> jax.Array:
    d = params["voxel_w_correction"]
    tv = (jnp.abs(jnp.diff(d, axis=2)).mean()
          + jnp.abs(jnp.diff(d, axis=3)).mean()
          + jnp.abs(jnp.diff(d, axis=4)).mean())
    return tv / 3.0


def mag_loss(params) -> jax.Array:
    return jnp.linalg.norm(params["voxel_w_correction"], axis=1).mean()
