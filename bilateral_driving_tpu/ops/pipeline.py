"""Full differentiable rasterization pipeline (gsplat `rasterization` parity).

Public entry point `rasterize(...)` mirrors the call contract the reference
trainer uses (project/models/trainers/base.py:393-432): Gaussian params +
camera in, `{rgb, depth, alpha}` + projection info out, with `RGB+ED`
expected-depth semantics and per-Gaussian radii for the visibility filter.

Differentiation strategy (TPU-native, no atomics):
  * projection (ops/projection.py) and the per-intersection feature
    construction below are pure JAX — autodiff handles them;
  * binning (ops/binning.py) is index computation under stop_gradient;
  * only the tile compositing kernel carries a custom VJP
    (ops/rasterize_pallas.py); its backward emits *per-intersection* feature
    gradients, which the VJP of the feature gather (`table[gauss_ids]`)
    automatically segment-sums into per-Gaussian gradients — deterministic,
    atomic-free, and exactly the gradient gsplat scatters with atomics.
  * `mean2d_sink`: an optional zeros array added to the *gathered* 2D means;
    its gradient is the per-intersection screen-space gradient, giving the
    `absgrad` densification statistic (reference base.py:281-286) via plain
    `jax.grad` — no side channels.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import binning, projection
from .binning import CHUNK, TILE, num_tiles
from .rasterize_pallas import rasterize_bwd, rasterize_fwd


@struct.dataclass
class RasterizeConfig:
    near_plane: float = struct.field(pytree_node=False, default=0.01)
    far_plane: float = struct.field(pytree_node=False, default=1e10)
    radius_clip: float = struct.field(pytree_node=False, default=0.0)
    antialiased: bool = struct.field(pytree_node=False, default=False)
    isect_capacity: int = struct.field(pytree_node=False, default=2 ** 21)
    interpret: bool = struct.field(pytree_node=False, default=False)


def isect_buffer_size(width: int, height: int, isect_capacity: int) -> int:
    ntx, nty = num_tiles(width, height)
    return isect_capacity + ntx * nty * CHUNK


# --------------------------------------------------------------------------
# custom-VJP boundary around the Pallas kernel pair
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _render_tiles(feats, starts, chunks, n_tiles, interpret):
    return rasterize_fwd(feats, starts, chunks, n_tiles, interpret=interpret)


def _render_tiles_fwd(feats, starts, chunks, n_tiles, interpret):
    out = rasterize_fwd(feats, starts, chunks, n_tiles, interpret=interpret)
    return out, (feats, starts, chunks)


def _render_tiles_bwd(n_tiles, interpret, res, g):
    feats, starts, chunks = res
    d_feats = rasterize_bwd(feats, starts, chunks, g, n_tiles,
                            interpret=interpret)
    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return d_feats, int_zero(starts), int_zero(chunks)


_render_tiles.defvjp(_render_tiles_fwd, _render_tiles_bwd)


# --------------------------------------------------------------------------
# per-Gaussian -> per-intersection gather with a scan-based VJP
# --------------------------------------------------------------------------


@jax.custom_vjp
def _gather_rows(table, gid, dest_exp, offsets):
    """table[gid] with a fast backward: XLA's scatter-add for the gather VJP
    runs at ~10 M rows/s on TPU (hundreds of ms per step at driving-scene
    scale). Instead, cotangent rows are re-ordered into *expansion order*
    (grouped by Gaussian, boundaries = `offsets` from binning) via one row
    gather, then segment-summed with a hierarchical prefix scan — O(M)
    bandwidth, no scatter."""
    return table[gid]


def _gather_rows_fwd(table, gid, dest_exp, offsets):
    return table[gid], (table.shape, gid, dest_exp, offsets)


def _gather_rows_bwd(res, d):
    from . import scan_utils

    (tshape, gid, dest_exp, offsets) = res
    m_al, c = d.shape
    cap = dest_exp.shape[0]
    m_total = offsets[-1]
    # cotangents in expansion order; out-of-range slots clamp -> mask them
    ds = d[jnp.clip(dest_exp, 0, m_al - 1)]
    valid = (jnp.arange(cap, dtype=jnp.int32) < m_total)[:, None]
    ds = jnp.where(valid, ds, 0.0)
    cs = scan_utils.cumsum_rows(ds.T)                      # (C, cap) inclusive
    cs = jnp.concatenate([jnp.zeros((c, 1), d.dtype), cs], axis=1)
    seg = cs[:, offsets]                                    # (C, N+1)
    d_table = (seg[:, 1:] - seg[:, :-1]).T                  # (N, C)
    d_table = jnp.concatenate(
        [d_table, jnp.zeros((tshape[0] - d_table.shape[0], c), d.dtype)])
    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return d_table, int_zero(gid), int_zero(dest_exp), int_zero(offsets)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def rasterize(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    viewmat: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    mean2d_sink: Optional[jax.Array] = None,
    means2d_dummy: Optional[jax.Array] = None,
):
    """Differentiable tiled rasterization of N Gaussians into one camera.

    Args:
      means/quats/scales: (N,3),(N,4),(N,3) world-space Gaussian geometry.
      opacities: (N,) in [0,1] (post-sigmoid).
      colors: (N,3) RGB (post-SH evaluation, as gsplat receives them).
      viewmat: (4,4) world->camera; K: (3,3); width/height: static ints.
      mean2d_sink: optional zeros of shape (isect_buffer_size(...), 2); its
        gradient is the per-intersection screen-gradient (absgrad source).
    Returns:
      dict with rgb (H,W,3), depth (H,W,1) expected depth, alpha (H,W,1),
      and info {means2d, depths, radii, valid, num_isects, overflow,
      gauss_ids}.
    """
    n = means.shape[0]
    proj = projection.project(
        means, quats, scales, viewmat, K, width, height,
        near_plane=cfg.near_plane, far_plane=cfg.far_plane,
        radius_clip=cfg.radius_clip, antialiased=cfg.antialiased,
    )
    if means2d_dummy is not None:
        # zeros input whose gradient is the per-Gaussian screen-space
        # gradient (replaces `info["means2d"].retain_grad()`, base.py:430)
        proj = proj._replace(means2d=proj.means2d + means2d_dummy)
    sg = jax.lax.stop_gradient
    isect = binning.bin_gaussians(
        sg(proj.means2d), sg(proj.radii), sg(proj.depths), sg(proj.valid),
        width, height, cfg.isect_capacity,
    )

    op_eff = opacities * proj.compensations * proj.valid.astype(means.dtype)

    # per-Gaussian feature table, padded with a zero dummy row at index N
    table = jnp.concatenate(
        [
            proj.means2d,                    # 0:2
            proj.conics,                     # 2:5
            op_eff[:, None],                 # 5
            colors,                          # 6:9
            proj.depths[:, None],            # 9
        ],
        axis=1,
    )
    table = jnp.concatenate([table, jnp.zeros((1, table.shape[1]), table.dtype)])

    gid = isect.gauss_ids
    gf = _gather_rows(table, gid, isect.dest, isect.offsets)  # (M_aligned, 10)

    ntx, _ = num_tiles(width, height)
    ox = (isect.isect_tile % ntx).astype(jnp.float32) * TILE
    oy = (isect.isect_tile // ntx).astype(jnp.float32) * TILE
    m2d = gf[:, 0:2]
    if mean2d_sink is not None:
        m2d = m2d + mean2d_sink
    mx = m2d[:, 0] - ox
    my = m2d[:, 1] - oy
    a, b, c = gf[:, 2], gf[:, 3], gf[:, 4]
    # σ′ = σ − log(opacity): α = exp(-σ′) needs no separate opacity feature,
    # and d(opacity) falls out of this line's autodiff.
    log_op = jnp.log(jnp.maximum(gf[:, 5], 1e-12))
    m_al = gid.shape[0]
    zeros = jnp.zeros((m_al,), means.dtype)
    feats = jnp.stack(
        [
            0.5 * a,
            0.5 * c,
            b,
            -(a * mx + b * my),
            -(c * my + b * mx),
            0.5 * a * mx * mx + 0.5 * c * my * my + b * mx * my - log_op,
            zeros,
            zeros,
            gf[:, 6],                       # r
            gf[:, 7],                       # g
            gf[:, 8],                       # b
            gf[:, 9],                       # depth
            jnp.ones((m_al,), means.dtype),  # alpha-accumulator channel
            zeros,
            zeros,
            zeros,
        ],
        axis=0,
    )  # (16, M_aligned) structure-of-arrays, see rasterize_pallas docstring

    n_tiles_total = ntx * num_tiles(width, height)[1]
    out = _render_tiles(feats, isect.tile_starts, isect.tile_chunks,
                        n_tiles_total, cfg.interpret)

    rgb, depth_acc, alpha = _unpack(out, width, height)
    depth = depth_acc / jnp.clip(alpha, 1e-10, None)  # gsplat "ED" semantics
    return {
        "rgb": rgb,
        "depth": depth[..., None],
        "alpha": alpha[..., None],
        "info": {
            "means2d": proj.means2d,
            "depths": proj.depths,
            "radii": proj.radii,
            "valid": proj.valid,
            "num_isects": isect.num_isects,
            "overflow": isect.overflow,
            "gauss_ids": gid,
        },
    }


def _unpack(out: jax.Array, width: int, height: int):
    """(nT, 8, 8, 128) kernel output -> rgb (H,W,3), depth (H,W), alpha (H,W)."""
    ntx, nty = num_tiles(width, height)
    x = out[:, :5].reshape(nty, ntx, 5, TILE, TILE)
    x = x.transpose(2, 0, 3, 1, 4).reshape(5, nty * TILE, ntx * TILE)
    x = x[:, :height, :width]
    return x[0:3].transpose(1, 2, 0), x[3], x[4]


def absgrad_from_sink(d_sink: jax.Array, gauss_ids: jax.Array, n: int):
    """Accumulate |per-intersection screen grads| per Gaussian: the gsplat
    `absgrad` statistic (means2d.absgrad, reference base.py:281-286)."""
    acc = jnp.zeros((n + 1, 2), d_sink.dtype).at[gauss_ids].add(jnp.abs(d_sink))
    return acc[:n]
