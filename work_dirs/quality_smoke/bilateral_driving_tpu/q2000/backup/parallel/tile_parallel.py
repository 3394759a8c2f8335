"""Intra-image tile sharding: one image's rasterization split over chips.

The SP-analog axis from SURVEY.md §2.2 — where data parallelism shards
*cameras* (one image per chip, parallel/data_parallel.py), the `tile` axis
shards ONE image across chips for single-image latency (interactive
rendering, novel-view export, few-camera scenes).

Design: the image is cut into horizontal bands of whole 32-px tile rows.
Rendering a sub-rectangle of a pinhole image is the same camera with the
principal point shifted (K[1,2] -= y0), so each chip runs the complete
existing pipeline — projection, binning, sort, Pallas kernel — on its own
band with zero cross-chip communication in the forward pass. Gaussians and
camera are replicated; `shard_map`'s transpose rule psums the per-band
parameter gradients over ICI automatically. Per-chip work (binning sort,
kernel grid) shrinks ~1/D since each band only intersects its own tiles.

Contrast with the reference: gsplat's CUDA rasterizer has no multi-GPU
story at all (strictly single-device, base.py:411)."""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import binning, pipeline

shard_map = jax.shard_map


def band_height(height: int, n_devices: int) -> int:
    """Whole-tile-row band height covering the image across n devices."""
    nty = -(-height // binning.TILE)
    rows_per = -(-nty // n_devices)
    return rows_per * binning.TILE


def tile_sharded_rasterize(
    mesh: Mesh,
    means, quats, scales, opacities, colors, viewmat, K,
    width: int, height: int,
    cfg: pipeline.RasterizeConfig = pipeline.RasterizeConfig(),
    axis: str | None = None,
) -> Dict:
    """Differentiable full-image rasterization sharded over mesh axis `axis`
    (defaults to the mesh's first axis). cfg.isect_capacity is PER BAND.

    Returns the same dict as pipeline.rasterize minus the per-intersection
    info fields (gauss_ids stay band-local); radii/valid are replicated,
    num_isects/overflow reduce over bands."""
    axis = axis or mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    bh = band_height(height, n_dev)
    # bands must clamp the EWA Jacobian with the FULL image's fov or the
    # stitched result diverges from the single-device render at band edges
    cfg = cfg.replace(fov_extent=(width, height))

    def _band(means, quats, scales, opacities, colors, viewmat, K):
        d = jax.lax.axis_index(axis)
        y0 = (d * bh).astype(K.dtype)
        Kb = K.at[1, 2].add(-y0)
        out = pipeline.rasterize(means, quats, scales, opacities, colors,
                                 viewmat, Kb, width, bh, cfg)
        info = out["info"]
        return (out["rgb"][None], out["depth"][None], out["alpha"][None],
                jax.lax.pmax(info["radii"], axis),
                jax.lax.psum(info["num_isects"], axis),
                jax.lax.pmax(info["overflow"].astype(jnp.int32), axis))

    rgb, depth, alpha, radii, num_isects, overflow = shard_map(
        _band, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
        check_vma=False,
    )(means, quats, scales, opacities, colors, viewmat, K)

    # (D, bh, W, C) band stack -> full image, cropped to the true height
    def _stitch(x):
        return x.reshape(n_dev * bh, *x.shape[2:])[:height]

    return {
        "rgb": _stitch(rgb),
        "depth": _stitch(depth),
        "alpha": _stitch(alpha),
        "info": {"radii": radii, "num_isects": num_isects,
                 "overflow": overflow.astype(bool)},
    }


def make_render_fn(mesh: Mesh, width: int, height: int,
                   cfg: pipeline.RasterizeConfig, axis: str | None = None):
    """Jitted single-image tile-sharded renderer."""
    return jax.jit(functools.partial(
        tile_sharded_rasterize, mesh, width=width, height=height, cfg=cfg,
        axis=axis))
