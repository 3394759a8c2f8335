"""Tile binning: Gaussian -> (tile, depth)-sorted intersection lists.

TPU-native replacement for gsplat's `isect_tiles` + radix sort +
`isect_offset_encode` CUDA kernels (reference call stack SURVEY.md §3.3). The
CUDA version compacts variable-length per-Gaussian tile lists with atomics;
here everything is static-shaped and sort/scan-based, which is what XLA wants:

  1. per-Gaussian tile span from the projected center/radius;
  2. intersection m in a static `isect_capacity` buffer finds its Gaussian via
     scatter-max of Gaussian ids at their cumsum offsets + a cummax fill (the
     vectorized inverse of searchsorted — binary-search gathers serialize on
     TPU, this is one scatter + one prefix pass);
  3. one `lax.sort` over a packed (tile | depth-bits) key. Crucially the sort
     *carries the per-intersection feature columns as payloads* (pipeline.py):
     measured on v5e, an 8-payload sort costs ~10% more than a 2-payload sort,
     while the post-sort random row-gather + chunk-aligned relayout scatter it
     replaces cost ~5x the sort. The rasterizer then reads tiles directly from
     the *sorted, unaligned* buffer (chunks at global 128-alignment, per-entry
     range masks in-kernel) — no relayout pass exists at all;
  4. per-tile [start, count) ranges from sorted-key boundaries (unique-index
     boundary scatter + reverse cummin fill).

The whole pass is integer/scan work of O(capacity); it is not differentiable
and is wrapped in stop_gradient by the pipeline. Gradients flow through the
*feature payloads*, whose custom VJP un-sorts cotangents with a second payload
sort and segment-sums them per Gaussian (ops/pipeline.py) — deterministic,
atomic-free, and exactly the gradient gsplat scatters with atomics.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import scan_utils

TILE = 32          # pixel tile edge; 32x32 = 1024 px = one (8,128) VPU block
CHUNK = 128        # intersections per rasterizer chunk (MXU contraction dim)


def num_tiles(width: int, height: int) -> tuple[int, int]:
    return (-(-width // TILE), -(-height // TILE))


def _tile_bits(n_tiles: int) -> int:
    bits = 1
    while (1 << bits) <= n_tiles:
        bits += 1
    return bits


def quantize_depth_like_sort(depths, n_tiles: int):
    """Depths quantized exactly as the packed sort key sees them (test
    oracle uses this to reproduce the tiled path's compositing order)."""
    shift = _tile_bits(n_tiles)
    bits = jax.lax.bitcast_convert_type(jnp.maximum(depths, 0.0), jnp.int32)
    return jax.lax.bitcast_convert_type((bits >> shift) << shift, jnp.float32)


def _fill_monotone(values_at, positions, size):
    """Segment-fill: out[m] = values_at[i] for the largest positions[i] <= m.

    Requires `values_at` non-decreasing in scatter order (cummax semantics).
    One scatter-max + one cummax — the fast TPU substitute for
    `values[searchsorted(positions, m)]`. (A/B'd against the Pallas scan
    in ops/scan_pallas.py: the scatter dominates this fill, the scan swap
    measured no change — kept XLA for simplicity.)
    """
    base = jnp.zeros((size,), jnp.int32).at[positions].max(values_at, mode="drop")
    return scan_utils.cummax(base)


class Spans(NamedTuple):
    tx0: jax.Array      # (N,) int32
    ty0: jax.Array      # (N,) int32
    span_w: jax.Array   # (N,) int32 (>= 1 where counted)
    counts: jax.Array   # (N,) int32 tiles overlapped (0 for culled)


def spans(means2d, radii, valid, width: int, height: int) -> Spans:
    """Per-Gaussian tile spans (inclusive-exclusive, clamped)."""
    ntx, nty = num_tiles(width, height)
    r = radii.astype(jnp.float32)
    x, y = means2d[..., 0], means2d[..., 1]
    tx0 = jnp.clip(jnp.floor((x - r) / TILE), 0, ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((x + r) / TILE), 0, ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / TILE), 0, nty).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((y + r) / TILE), 0, nty).astype(jnp.int32)
    counts = jnp.where(valid & (radii > 0), (tx1 - tx0) * (ty1 - ty0), 0)
    return Spans(tx0, ty0, jnp.maximum(tx1 - tx0, 1), counts)


class Expansion(NamedTuple):
    g: jax.Array            # (cap,) int32 expansion-order gaussian id
    m_idx: jax.Array        # (cap,) int32 arange
    offsets: jax.Array      # (N+1,) int32 segment boundaries (clamped to cap)
    entry_valid: jax.Array  # (cap,) bool
    num_isects: jax.Array   # () int32 (pre-truncation)
    overflow: jax.Array     # () bool


def expand(counts: jax.Array, isect_capacity: int) -> Expansion:
    """Expand per-Gaussian counts into intersection entries."""
    n = counts.shape[0]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         scan_utils.cumsum(counts).astype(jnp.int32)])
    m_total = offsets[-1]
    m_idx = jnp.arange(isect_capacity, dtype=jnp.int32)
    g = _fill_monotone(jnp.arange(n, dtype=jnp.int32), offsets[:-1],
                       isect_capacity)
    return Expansion(g, m_idx, jnp.minimum(offsets, isect_capacity),
                     m_idx < m_total, m_total,
                     m_total > isect_capacity)


def expand_light(counts: jax.Array, isect_capacity: int) -> Expansion:
    """`expand` without the capacity-sized Gaussian-id fill (the Pallas
    expansion kernel recovers ids in-kernel — ops/expand_pallas.py): only
    the N-sized prefix offsets + totals. `g` is left empty (shape (0,))."""
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         scan_utils.cumsum(counts).astype(jnp.int32)])
    m_total = offsets[-1]
    return Expansion(jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.int32),
                     jnp.minimum(offsets, isect_capacity),
                     jnp.zeros((0,), bool), m_total,
                     m_total > isect_capacity)


def entry_tiles(g_tx0, g_ty0, g_sw, g_seg_start, m_idx, ntx: int):
    """Per-entry tile id from the gathered span columns (expansion order)."""
    k = m_idx - g_seg_start
    ty = g_ty0 + k // g_sw
    tx = g_tx0 + k % g_sw
    return ty * ntx + tx


def pack_keys(tile, depths_exp, n_tiles: int, entry_valid):
    """One packed 31-bit sort key: tile | truncated positive-float depth bits.

    Positive-float bit patterns are order-preserving, so the top
    (31 - tile_bits) bits of the depth float give a monotone depth ordering
    within each tile (23 bits at typical tile counts — ties only between
    depths equal to ~1e-6 relative, which composite in arbitrary order,
    within gsplat's own guarantees)."""
    tile_bits = _tile_bits(n_tiles)
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depths_exp, 0.0), jnp.int32)
    key = (tile << (31 - tile_bits)) | (depth_bits >> tile_bits)
    return jnp.where(entry_valid, key, jnp.int32(2 ** 31 - 1))


def tiles_of_keys(key_s, n_tiles: int):
    tile_bits = _tile_bits(n_tiles)
    return jnp.where(key_s == 2 ** 31 - 1, n_tiles,
                     key_s >> (31 - tile_bits))


def tile_ranges(tile_s, m_total, n_tiles: int, isect_capacity: int):
    """Per-tile (start, count) in the sorted buffer.

    `tile_s` is non-decreasing (it derives from the sorted keys), so the
    ranges are exactly `searchsorted(tile_s, [0..n_tiles])` — ~n_tiles
    binary-search lanes instead of a capacity-sized boundary scatter +
    reverse cummin (which cost ~5 ms at cap 2^20 on a v5e core)."""
    m_total_c = jnp.minimum(m_total, isect_capacity)
    edges = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=tile_s.dtype), side="left"
    ).astype(jnp.int32)
    edges = jnp.minimum(edges, m_total_c)
    return edges[:-1], edges[1:] - edges[:-1]


class Intersections(NamedTuple):
    """Sorted intersection lists (inspection/testing contract; the training
    pipeline fuses this with feature payloads — ops/pipeline.py)."""
    gauss_ids: jax.Array    # (cap,) int32 in [0, N); junk beyond num_isects
    isect_tile: jax.Array   # (cap,) int32 owning tile (n_tiles for invalid)
    tile_counts: jax.Array  # (nT,) int32
    tile_starts: jax.Array  # (nT,) int32 starts in the sorted buffer
    eidx: jax.Array         # (cap,) int32 expansion index at sorted position
    num_isects: jax.Array   # () int32 total true intersections
    overflow: jax.Array     # () bool: isect_capacity exceeded (truncated)
    offsets: jax.Array      # (N+1,) per-gaussian expansion boundaries


def bin_gaussians(
    means2d: jax.Array,
    radii: jax.Array,
    depths: jax.Array,
    valid: jax.Array,
    width: int,
    height: int,
    isect_capacity: int,
) -> Intersections:
    """Standalone binning (no feature payloads) — used by tests and tools;
    the rasterization pipeline runs the same stages with feature columns
    riding the sort."""
    ntx, nty = num_tiles(width, height)
    n_tiles = ntx * nty
    sp = spans(means2d, radii, valid, width, height)
    ex = expand(sp.counts, isect_capacity)

    table = jnp.stack(
        [sp.tx0.astype(jnp.float32), sp.ty0.astype(jnp.float32),
         sp.span_w.astype(jnp.float32), depths,
         ex.offsets[:-1].astype(jnp.float32)], axis=1)
    gt = table[ex.g]
    tile = entry_tiles(gt[:, 0].astype(jnp.int32), gt[:, 1].astype(jnp.int32),
                       jnp.maximum(gt[:, 2].astype(jnp.int32), 1),
                       gt[:, 4].astype(jnp.int32), ex.m_idx, ntx)
    key = pack_keys(tile, gt[:, 3], n_tiles, ex.entry_valid)
    key_s, gid_s, eidx_s = jax.lax.sort(
        (key, ex.g, ex.m_idx), dimension=0, num_keys=1, is_stable=False)
    tile_s = tiles_of_keys(key_s, n_tiles)
    starts, cnt = tile_ranges(tile_s, ex.num_isects, n_tiles, isect_capacity)
    return Intersections(
        gauss_ids=gid_s, isect_tile=tile_s, tile_counts=cnt,
        tile_starts=starts, eidx=eidx_s, num_isects=ex.num_isects,
        overflow=ex.overflow, offsets=ex.offsets)
