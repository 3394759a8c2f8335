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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import binning, pipeline

shard_map = jax.shard_map


def band_height(height: int, n_devices: int) -> int:
    """Whole-tile-row band height covering the image across n devices."""
    nty = -(-height // binning.TILE)
    rows_per = -(-nty // n_devices)
    return rows_per * binning.TILE


def make_hybrid_mesh(n_data: int, n_tile: int,
                     data_axis: str = "data",
                     tile_axis: str = "tile") -> Mesh:
    """(data x tile) device mesh: each data row trains one image whose
    rasterization is band-sharded over its tile row."""
    import numpy as np

    devs = jax.devices()
    need = n_data * n_tile
    if need > len(devs):
        raise ValueError(
            f"hybrid mesh {n_data}x{n_tile} needs {need} devices, have "
            f"{len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(n_data, n_tile),
                (data_axis, tile_axis))


def shard_data_batch(stacked_batch, mesh: Mesh, data_axis: str = "data"):
    """Place a stacked batch over `data_axis` of a hybrid mesh (leaves
    whose leading dim matches the axis size shard; others replicate)."""
    n = mesh.shape[data_axis]

    def put(x):
        spec = P(data_axis) if getattr(x, "ndim", 0) >= 1 \
            and x.shape[0] == n else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, stacked_batch)


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


# --------------------------------------------------------------------------
# tile-axis TRAINING (round 4): full loss + backward + refinement over bands
# --------------------------------------------------------------------------
#
# Design. Inside shard_map over the `tile` axis, each chip runs the COMPLETE
# trainer step function (train/trainer.py compute_grads) with one
# substitution: the rasterizer renders only this chip's horizontal band
# (shifted principal point, exactly `tile_sharded_rasterize`'s trick) and
# `all_gather`s the band images into the full image. Everything downstream —
# sky compositing, bilateral appearance, SSIM/depth/BCE losses — runs on the
# gathered full image, replicated per chip, so no loss needs halo exchange
# and the semantics are bit-identical to single-chip training. The heavy
# stage (projection + binning sort + Pallas kernels, fwd AND bwd) is the
# part that splits ~1/D.
#
# Gradient calculus (why a uniform pmean is EXACT, not a heuristic):
#   * band path (gaussian/camera params -> band render -> all_gather ->
#     loss): each chip computes the same full-image loss, so the all_gather
#     transpose (psum_scatter) hands every chip D x its own band's image
#     cotangent; its param gradient is D x that band's true contribution.
#     pmean over chips = (1/D) * sum_d (D * band_d) = the full gradient.
#   * replicated path (sky/appearance params, applied after the gather):
#     every chip computes the identical full gradient; pmean keeps it.
# The same argument covers the means2d_dummy screen-gradient sink, so
# densification statistics are exact too. Refinement then runs replicated
# (identical per chip) in apply_grads_and_refine — band-local refinement is
# unnecessary because parameter state is replicated across the tile axis.
#
# Composition with the data axis: on a ('data', 'tile') mesh each data row
# trains its own image over its tile row; grads pmean over BOTH axes (the
# data-axis pmean is the batch average, matching data_parallel.py).


def _banded_rasterize_fn(tile_axis: str, n_band: int):
    """pipeline.rasterize-compatible callable for use INSIDE shard_map."""

    def rfn(means, quats, scales, opacities, colors, viewmat, K,
            width, height, cfg, mean2d_sink=None, means2d_dummy=None):
        bh = band_height(height, n_band)
        d = jax.lax.axis_index(tile_axis)
        y0 = (d * bh).astype(K.dtype)
        Kb = K.at[1, 2].add(-y0)
        out = pipeline.rasterize(
            means, quats, scales, opacities, colors, viewmat, Kb,
            width, bh, cfg.replace(fov_extent=(width, height)),
            mean2d_sink=mean2d_sink, means2d_dummy=means2d_dummy)

        def g(x):
            full = jax.lax.all_gather(x, tile_axis, axis=0, tiled=True)
            return full[:height]

        info = dict(out["info"])
        info["radii"] = jax.lax.pmax(info["radii"], tile_axis)
        info["valid"] = jax.lax.pmax(
            info["valid"].astype(jnp.int32), tile_axis).astype(bool)
        info["num_isects"] = jax.lax.psum(info["num_isects"], tile_axis)
        info["overflow"] = jax.lax.pmax(
            info["overflow"].astype(jnp.int32), tile_axis).astype(bool)
        return {"rgb": g(out["rgb"]), "depth": g(out["depth"]),
                "alpha": g(out["alpha"]), "info": info}

    return rfn


def tile_train_step(cfg, statics, mesh: Mesh, tile_axis: str = "tile",
                    data_axis: str | None = None):
    """Jitted SPMD train step over a tile (or hybrid data x tile) mesh.

    State replicated; batch replicated (tile-only) or stacked over
    `data_axis` (hybrid). cfg.isect_capacity is PER BAND — a D-band run
    can use roughly 1/D of the single-chip bucket.

    Returns step(state, batch_or_stacked_batch) -> (state, metrics)."""
    from ..train import trainer as trainer_mod

    n_band = mesh.shape[tile_axis]
    axes = ((data_axis,) if data_axis else ()) + (tile_axis,)
    rfn = _banded_rasterize_fn(tile_axis, n_band)

    def _grads(state, batch):
        if data_axis is not None:
            batch = jax.tree.map(lambda x: x[0], batch)
        total, loss_dict, outputs, g_params, g_dummy = \
            trainer_mod.compute_grads(cfg, statics, state, batch,
                                      rasterize_fn=rfn)
        for ax in axes:
            total = jax.lax.pmean(total, ax)
            loss_dict = jax.lax.pmean(loss_dict, ax)
            g_params = jax.lax.pmean(g_params, ax)
            g_dummy = jax.lax.pmean(g_dummy, ax) if ax == tile_axis \
                else jax.lax.psum(g_dummy, ax)   # data: sum over the batch
        radii = outputs["info"]["radii"]
        overflow = outputs["info"]["overflow"].astype(jnp.int32)
        num_isects = outputs["info"]["num_isects"]
        psnr = -10.0 * jnp.log10(jnp.maximum(
            jnp.mean((outputs["rgb"] - batch["pixels"]) ** 2), 1e-12))
        for ax in axes:
            radii = jax.lax.pmax(radii, ax)
            overflow = jax.lax.pmax(overflow, ax)
            psnr = jax.lax.pmean(psnr, ax)
        if data_axis is not None:
            num_isects = jax.lax.psum(num_isects, data_axis)
        return (total, loss_dict, g_params, g_dummy, radii, overflow,
                num_isects, psnr)

    in_batch_spec = P(data_axis) if data_axis else P()
    grads_sharded = shard_map(
        _grads, mesh=mesh,
        in_specs=(P(), in_batch_spec),
        out_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state, batch):
        (total, loss_dict, g_params, g_dummy, radii, overflow, num_isects,
         psnr) = grads_sharded(state, batch)
        batch0 = (jax.tree.map(lambda x: x[0], batch)
                  if data_axis is not None else batch)
        outputs_stub = {"info": {"radii": radii,
                                 "overflow": overflow.astype(bool),
                                 "num_isects": num_isects},
                        "rgb": batch0["pixels"], "labels": None}
        new_state, metrics = trainer_mod.apply_grads_and_refine(
            cfg, statics, state, batch0, total, loss_dict, outputs_stub,
            g_params, g_dummy)
        metrics["psnr"] = psnr
        return new_state, metrics

    return step
