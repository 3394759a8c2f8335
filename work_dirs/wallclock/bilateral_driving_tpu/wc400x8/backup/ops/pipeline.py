"""Full differentiable rasterization pipeline (gsplat `rasterization` parity).

Public entry point `rasterize(...)` mirrors the call contract the reference
trainer uses (project/models/trainers/base.py:393-432): Gaussian params +
camera in, `{rgb, depth, alpha}` + projection info out, with `RGB+ED`
expected-depth semantics and per-Gaussian radii for the visibility filter.

Differentiation strategy (TPU-native, no atomics, no random scatters):
  * projection (ops/projection.py) is pure JAX — autodiff handles it;
  * per-Gaussian feature rows are gathered to expansion order with ONE
    monotone row-gather, then *ride the binning sort as payloads*
    (`_expand_sort` below) — on TPU a multi-payload `lax.sort` costs a
    fraction of the post-sort random gather + relayout scatter it replaces;
  * the tile compositing kernel (ops/rasterize_pallas.py) carries a custom
    VJP emitting *per-intersection* gradients in the sorted layout;
  * `_expand_sort`'s VJP un-sorts those cotangents with a second payload
    sort (key = expansion index) and segment-sums them per Gaussian with a
    hierarchical prefix scan — deterministic and exactly the gradient gsplat
    accumulates with atomics;
  * `mean2d_sink`: optional zeros added to the sorted screen-mean rows; its
    gradient is the per-intersection screen-space gradient, giving the
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

from . import binning, expand_pallas, projection, scan_utils, segsum_pallas
from .binning import CHUNK, TILE, num_tiles
from .rasterize_pallas import FEAT, rasterize_bwd, rasterize_fwd

N_PAYLOAD = 10      # sorted feature columns: x y a b c logop r g b depth


@struct.dataclass
class RasterizeConfig:
    near_plane: float = struct.field(pytree_node=False, default=0.01)
    far_plane: float = struct.field(pytree_node=False, default=1e10)
    radius_clip: float = struct.field(pytree_node=False, default=0.0)
    antialiased: bool = struct.field(pytree_node=False, default=False)
    isect_capacity: int = struct.field(pytree_node=False, default=2 ** 21)
    interpret: bool = struct.field(pytree_node=False, default=False)
    # (width, height) of the FULL image when rendering a sub-rectangle
    # (tile-sharded bands): keeps the EWA Jacobian's frustum clamp identical
    # across bands. None = use the render extent.
    fov_extent: Optional[tuple] = struct.field(pytree_node=False,
                                               default=None)
    # fused Pallas expansion kernel (ops/expand_pallas.py) with automatic
    # XLA fallback on sparse tables; False forces the XLA path everywhere
    pallas_expand: bool = struct.field(pytree_node=False, default=True)
    # opacity-aware effective-radius span tightening (output-exact under the
    # kernel's 1/255 alpha gate; see rasterize())
    tight_radius: bool = struct.field(pytree_node=False, default=True)


def isect_buffer_size(width: int, height: int, isect_capacity: int) -> int:
    """Per-intersection buffer length (sorted layout == capacity)."""
    del width, height
    return isect_capacity


CAP_BUCKET = 2 ** 17


def probe_num_isects(means, quats, scales, viewmat, K, width: int,
                     height: int, cfg: "RasterizeConfig" = None) -> int:
    """Cheap pre-pass (projection + tile spans only, no kernel compile)
    counting the scene's tile intersections for `autotune_capacity`."""
    cfg = cfg or RasterizeConfig()

    @jax.jit
    def count(means, quats, scales, viewmat, K):
        proj = projection.project(
            means, quats, scales, viewmat, K, width, height,
            near_plane=cfg.near_plane, far_plane=cfg.far_plane,
            radius_clip=cfg.radius_clip, antialiased=cfg.antialiased,
            fov_extent=cfg.fov_extent)
        sp = binning.spans(proj.means2d, proj.radii, proj.valid, width,
                           height)
        return jnp.sum(sp.counts)

    return int(count(means, quats, scales, viewmat, K))


def autotune_capacity(num_isects: int, margin: float = 1.35,
                      floor: int = CAP_BUCKET) -> int:
    """Bucketed intersection capacity from measured occupancy.

    Every binning pass is O(capacity), so running a 0.6M-intersection scene
    at the 2^21 default wastes ~3x the sort/scan/kernel-mask work. Callers
    probe `info.num_isects` once (or watch `info.overflow` during training)
    and re-jit with the returned bucket; buckets are multiples of 2^17 so
    recompiles are rare and amortized."""
    want = max(int(num_isects * margin), floor)
    return -(-want // CAP_BUCKET) * CAP_BUCKET


# --------------------------------------------------------------------------
# custom-VJP boundary around the Pallas kernel pair
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _render_tiles(feats, starts, counts, width, height, interpret):
    img, _, _, _ = rasterize_fwd(feats, starts, counts, width, height,
                                 interpret=interpret)
    return img


def _render_tiles_fwd(feats, starts, counts, width, height, interpret):
    img, tc_ckpt, tc_side, n_live = rasterize_fwd(
        feats, starts, counts, width, height, interpret=interpret)
    return img, (feats, starts, counts, tc_ckpt, tc_side, n_live)


def _render_tiles_bwd(width, height, interpret, res, g):
    feats, starts, counts, tc_ckpt, tc_side, n_live = res
    d_feats = rasterize_bwd(feats, starts, counts, n_live, tc_ckpt, tc_side,
                            g, width, height, interpret=interpret)
    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return d_feats, int_zero(starts), int_zero(counts)


_render_tiles.defvjp(_render_tiles_fwd, _render_tiles_bwd)


# --------------------------------------------------------------------------
# expansion gather + payload-carrying sort with a sort-based VJP
# --------------------------------------------------------------------------
# table columns (N+1 rows; last row is the zero-opacity dummy):
#   0 tx0, 1 ty0, 2 span_w, 3 seg_start           (stop-gradient span data)
#   4 x, 5 y, 6 a, 7 b, 8 c, 9 logop, 10 r, 11 g, 12 b, 13 depth
_COL_FEAT0 = 4


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _expand_sort(table, exp, ntx, n_tiles):
    out, _ = _expand_sort_do(table, exp, ntx, n_tiles)
    return out


def _expand_sort_do(table, exp: binning.Expansion, ntx, n_tiles):
    gt = table[exp.g]                                   # (cap, 14) one gather
    tile = binning.entry_tiles(
        gt[:, 0].astype(jnp.int32), gt[:, 1].astype(jnp.int32),
        jnp.maximum(gt[:, 2].astype(jnp.int32), 1),
        gt[:, 3].astype(jnp.int32), exp.m_idx, ntx)
    key = binning.pack_keys(tile, gt[:, 13], n_tiles, exp.entry_valid)
    ops = (key, exp.g, exp.m_idx) + tuple(
        gt[:, _COL_FEAT0 + i] for i in range(N_PAYLOAD))
    # gid tie-break = gsplat stable-radix order (see _expand_sort_pallas_do)
    sorted_ = jax.lax.sort(ops, dimension=0, num_keys=2, is_stable=False)
    key_s, gid_s, eidx_s = sorted_[0], sorted_[1], sorted_[2]
    feats_s = jnp.stack(sorted_[3:], axis=0)            # (N_PAYLOAD, cap)
    return (key_s, gid_s, feats_s), eidx_s


def _expand_sort_fwd(table, exp, ntx, n_tiles):
    out, eidx_s = _expand_sort_do(table, exp, ntx, n_tiles)
    return out, (eidx_s, exp, table.shape)


def _expand_sort_bwd(ntx, n_tiles, res, cots):
    eidx_s, exp, tshape = res
    offsets, num_isects = exp.offsets, exp.num_isects
    _, _, d_feats_s = cots
    cap = eidx_s.shape[0]
    # un-sort cotangents to expansion order: a payload sort keyed by the
    # expansion index (random row-gather/scatter by the inverse permutation
    # costs ~4x a payload sort on TPU)
    unsorted = jax.lax.sort(
        (eidx_s,) + tuple(d_feats_s[i] for i in range(N_PAYLOAD)),
        dimension=0, num_keys=1, is_stable=False)
    d_exp = jnp.stack(unsorted[1:], axis=0)             # (N_PAYLOAD, cap)
    valid = (jnp.arange(cap, dtype=jnp.int32) < num_isects)[None, :]
    d_exp = jnp.where(valid, d_exp, 0.0)
    # per-Gaussian segment sums via inclusive prefix scan + boundary diffs
    cs = scan_utils.cumsum_rows(d_exp)                  # (C, cap)
    cs = jnp.concatenate([jnp.zeros((N_PAYLOAD, 1), cs.dtype), cs], axis=1)
    seg = cs[:, offsets]                                # (C, N+1)
    d_cols = (seg[:, 1:] - seg[:, :-1]).T               # (N, C)
    d_cols = jnp.concatenate(
        [d_cols, jnp.zeros((tshape[0] - d_cols.shape[0], N_PAYLOAD),
                           d_cols.dtype)])
    d_table = jnp.concatenate(
        [jnp.zeros((tshape[0], _COL_FEAT0), d_cols.dtype), d_cols], axis=1)
    # Expansion carries only integer/bool arrays -> float0 zeros
    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    d_exp = jax.tree.map(int_zero, exp)
    return d_table, d_exp


_expand_sort.defvjp(_expand_sort_fwd, _expand_sort_bwd)


# --------------------------------------------------------------------------
# round-3 path: fused Pallas expansion (ops/expand_pallas.py) feeding the
# same payload-carrying lax.sort; VJP identical to _expand_sort's (unsort by
# expansion index + per-Gaussian segment sums), just mapped to the
# lane-major table layout
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _expand_sort_pallas(table_T, offsets, num_isects, cap, ntx, n_tiles,
                        n_orig, interpret):
    out, _ = _expand_sort_pallas_do(table_T, offsets, num_isects, cap, ntx,
                                    n_tiles, n_orig, interpret)
    return out


def _expand_sort_pallas_do(table_T, offsets, num_isects, cap, ntx, n_tiles,
                           n_orig, interpret):
    key, gid, feats = expand_pallas.expand_gather(
        table_T, offsets, num_isects, cap, ntx, n_tiles, n_orig,
        interpret=interpret)
    # num_keys=2: gid tie-break reproduces gsplat's STABLE radix order for
    # entries whose truncated depth bits collide (expansion enumerates
    # Gaussians in id order, so stability == ascending id within a tile)
    ops = (key, gid) + tuple(feats[i] for i in range(N_PAYLOAD))
    sorted_ = jax.lax.sort(ops, dimension=0, num_keys=2, is_stable=False)
    key_s, gid_s = sorted_[0], sorted_[1]
    # one stack straight into the kernel's 16-sublane feature layout
    # (payload rows 0..9 + 6 zero rows) — the caller-side pad concat would
    # cost a second (16, cap) materialization in fwd AND a row slice in bwd
    zrow = jnp.zeros((cap,), sorted_[2].dtype)
    feats16 = jnp.stack(
        list(sorted_[2:]) + [zrow] * (FEAT - N_PAYLOAD), axis=0)
    return (key_s, gid_s, feats16), gid_s


def _expand_sort_pallas_fwd(table_T, offsets, num_isects, cap, ntx, n_tiles,
                            n_orig, interpret):
    out, gid_s = _expand_sort_pallas_do(table_T, offsets, num_isects, cap,
                                        ntx, n_tiles, n_orig, interpret)
    return out, (gid_s, offsets, num_isects, table_T.shape)


def _expand_sort_pallas_bwd(cap, ntx, n_tiles, n_orig, interpret, res, cots):
    gid_s, offsets, num_isects, tshape = res
    _, _, d_feats16 = cots
    # segment-sum per Gaussian: re-sorting the cotangents by Gaussian id
    # reproduces the expansion grouping (within-segment order is irrelevant
    # to a sum, so no expansion index needs to ride the forward sort —
    # measured identical sort cost, one payload cheaper fwd,
    # tools/profile_segsum.py). Invalid entries carry gid n_orig and zero
    # cotangents (kernel masks out-of-range lanes), landing past
    # offsets[-1]; d_table is lane-major (TABLE_ROWS, N'): feature rows
    # FEAT0..FEAT0+NFEAT get the per-Gaussian sums, span rows stay zero.
    # The cotangent arrives as the kernel-layout (16, cap) (pad rows are
    # dead); only the 10 payload rows ride the unsort.
    unsorted = jax.lax.sort(
        (gid_s,) + tuple(d_feats16[i] for i in range(N_PAYLOAD)),
        dimension=0, num_keys=1, is_stable=False)
    if segsum_pallas._MODE != "xla" and cap % segsum_pallas.TILE_L == 0:
        # Pallas masked-matmul ragged reduce (ops/segsum_pallas.py): no
        # prefix scan, no boundary gather. Invalid entries (gid n_orig)
        # sort past offsets[-1] and fall outside every segment, so no
        # explicit valid-mask is needed; offsets are clamped to cap to
        # match the sort's truncation under overflow. The sorted payloads
        # land DIRECTLY at rows FEAT0..FEAT0+NFEAT of the kernel input, so
        # the kernel's lane-major output IS d_table — no transpose, no
        # zeros+set materialization. "split" mode goes further: the sort's
        # R output arrays feed the kernel as separate HBM operands and the
        # (16, cap) stack never exists.
        offs_c = jnp.minimum(offsets.astype(jnp.int32), cap)
        if (segsum_pallas._MODE == "split"
                and cap % segsum_pallas.TILE_R == 0):
            d_table = segsum_pallas.segment_sum_rows(
                tuple(unsorted[1:]), offs_c, row0=expand_pallas.FEAT0,
                interpret=interpret)
        else:
            zrow = jnp.zeros((cap,), d_feats16.dtype)
            d16 = jnp.stack(
                [zrow] * expand_pallas.FEAT0
                + list(unsorted[1:])
                + [zrow] * (segsum_pallas.FEAT - expand_pallas.FEAT0
                            - N_PAYLOAD), axis=0)
            d_table = segsum_pallas.segment_sum(d16, offs_c,
                                                interpret=interpret)
        assert d_table.shape == tshape
    else:
        d_exp = jnp.stack(unsorted[1:], axis=0)         # (N_PAYLOAD, cap)
        valid = (jnp.arange(cap, dtype=jnp.int32) < num_isects)[None, :]
        d_exp = jnp.where(valid, d_exp, 0.0)
        cs = scan_utils.cumsum_rows(d_exp)
        cs = jnp.concatenate([jnp.zeros((N_PAYLOAD, 1), cs.dtype), cs],
                             axis=1)
        seg = cs[:, offsets]                            # (C, N+1)
        d_rows = seg[:, 1:] - seg[:, :-1]               # (C, N)
        n = d_rows.shape[1]
        d_table = jnp.zeros(tshape, d_rows.dtype)
        d_table = d_table.at[expand_pallas.FEAT0:
                             expand_pallas.FEAT0 + N_PAYLOAD, :n].set(d_rows)
    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return d_table, int_zero(offsets), int_zero(num_isects)


_expand_sort_pallas.defvjp(_expand_sort_pallas_fwd, _expand_sort_pallas_bwd)


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
      mean2d_sink: optional zeros of shape (isect_capacity, 2); its gradient
        is the per-intersection screen-gradient (absgrad source).
    Returns:
      dict with rgb (H,W,3), depth (H,W,1) expected depth, alpha (H,W,1),
      and info {means2d, depths, radii, valid, num_isects, overflow,
      gauss_ids}.
    """
    n = means.shape[0]
    cap = cfg.isect_capacity
    proj = projection.project(
        means, quats, scales, viewmat, K, width, height,
        near_plane=cfg.near_plane, far_plane=cfg.far_plane,
        radius_clip=cfg.radius_clip, antialiased=cfg.antialiased,
        fov_extent=cfg.fov_extent,
    )
    if means2d_dummy is not None:
        # zeros input whose gradient is the per-Gaussian screen-space
        # gradient (replaces `info["means2d"].retain_grad()`, base.py:430)
        proj = proj._replace(means2d=proj.means2d + means2d_dummy)
    sg = jax.lax.stop_gradient
    ntx, nty = num_tiles(width, height)
    n_tiles = ntx * nty

    op_eff = opacities * proj.compensations * proj.valid.astype(means.dtype)
    logop = jnp.log(jnp.maximum(op_eff, 1e-12))

    radii, valid = sg(proj.radii), sg(proj.valid)
    if cfg.tight_radius:
        # Opacity-aware effective radius: pixels farther than
        # r_eff = sigma_max * sqrt(2 ln(255 op_eff)) have
        # alpha <= op_eff exp(-d^2 / (2 v1)) < 1/255 and are zeroed by the
        # kernel's alpha gate (rasterize_pallas.ALPHA_THRESH), so shrinking
        # the 3-sigma AABB (gsplat radius, projection.py) to
        # min(3 sigma, r_eff) is output- and gradient-exact while cutting
        # intersections sharply at training opacities (~28% at op 0.1).
        ln_gate = jnp.log(255.0 * jnp.maximum(sg(op_eff), 1e-12))
        sigma_max = radii.astype(jnp.float32) / 3.0
        r_eff = jnp.ceil(sigma_max * jnp.sqrt(2.0 * jnp.maximum(ln_gate, 0.0)))
        radii = jnp.minimum(radii, r_eff.astype(jnp.int32))
        radii = jnp.where(ln_gate > 0.0, radii, 0)
        valid = valid & (radii > 0)

    sp = binning.spans(sg(proj.means2d), radii, valid, width, height)

    if cfg.pallas_expand:
        exp = binning.expand_light(sp.counts, cap)
        table_T = jnp.stack(
            [
                sg(sp.tx0.astype(jnp.float32)),
                sg(sp.ty0.astype(jnp.float32)),
                sg(sp.span_w.astype(jnp.float32)),
                sg(exp.offsets[:-1].astype(jnp.float32)),
                proj.means2d[:, 0], proj.means2d[:, 1],       # 4:6 x, y
                proj.conics[:, 0], proj.conics[:, 1],
                proj.conics[:, 2],                            # 6:9 a, b, c
                logop,                                        # 9
                colors[:, 0], colors[:, 1], colors[:, 2],     # 10:13
                proj.depths,                                  # 13
                sg(jnp.arange(n, dtype=jnp.float32)),         # 14 orig id
                jnp.zeros((n,), jnp.float32),                 # 15 pad
            ],
            axis=0,
        )
        key_s, gid_s, feats16 = _expand_sort_pallas(
            table_T, exp.offsets, exp.num_isects, cap, ntx, n_tiles, n,
            cfg.interpret)
    else:
        exp = binning.expand(sp.counts, cap)
        table = jnp.concatenate(
            [
                sg(sp.tx0.astype(jnp.float32))[:, None],
                sg(sp.ty0.astype(jnp.float32))[:, None],
                sg(sp.span_w.astype(jnp.float32))[:, None],
                sg(exp.offsets[:-1].astype(jnp.float32))[:, None],
                proj.means2d,                    # 4:6 x, y
                proj.conics,                     # 6:9 a, b, c
                logop[:, None],                  # 9
                colors,                          # 10:13
                proj.depths[:, None],            # 13
            ],
            axis=1,
        )
        # dummy padding row: zero spans, -30 log-opacity (alpha below the
        # 1/255 gate for any plausible sigma)
        dummy = jnp.zeros((1, table.shape[1]),
                          table.dtype).at[0, 9].set(-30.0)
        table = jnp.concatenate([table, dummy])
        key_s, gid_s, feats_s = _expand_sort(table, exp, ntx, n_tiles)
        # the sorted payload rows ARE the kernel feature layout, zero-padded
        # to 16 sublanes (rasterize_pallas docstring); the pallas path
        # already emits this layout from inside its custom VJP
        feats16 = jnp.concatenate(
            [feats_s, jnp.zeros((FEAT - N_PAYLOAD, cap), feats_s.dtype)],
            axis=0)
    tile_s = binning.tiles_of_keys(sg(key_s), n_tiles)
    starts, counts = binning.tile_ranges(tile_s, sg(exp.num_isects), n_tiles,
                                         cap)

    if mean2d_sink is not None:
        feats16 = feats16.at[0:2].add(mean2d_sink.T)

    out = _render_tiles(feats16, starts, counts, width, height,
                        cfg.interpret)

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
            "num_isects": exp.num_isects,
            "overflow": exp.overflow,
            "gauss_ids": sg(gid_s),
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
    acc = jnp.zeros((n + 1, 2), d_sink.dtype).at[
        jnp.minimum(gauss_ids, n)].add(jnp.abs(d_sink))
    return acc[:n]
