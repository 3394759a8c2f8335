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
  3. one `lax.sort` over (tile_id, depth) lexicographic keys;
  4. a *chunk-aligned relayout*: each tile's list is placed at a
     CHUNK-multiple offset so the Pallas rasterizer can DMA fixed-size chunks
     that never straddle two tiles, and its backward can write
     per-intersection gradients without masked stores. The relayout is a
     single unique-index scatter (dest = m + cummax-filled pad delta), not a
     gather — per-entry table gathers are the dominant cost on TPU and are
     avoided throughout (one packed row-gather per expansion is the only one
     left). Padding entries point at a dummy Gaussian slot (id = N) whose
     opacity is zero, so they contribute nothing to forward or backward.

The whole pass is integer/scan work of O(capacity); it is not differentiable
and is wrapped in stop_gradient by the pipeline (gradients flow through the
*gathered feature values*, not the indices — same as gsplat).
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


class Intersections(NamedTuple):
    gauss_ids: jax.Array    # (M_aligned,) int32 in [0, N]; N = dummy padding
    isect_tile: jax.Array   # (M_aligned,) int32 owning tile id (0 for padding)
    tile_counts: jax.Array  # (nT,) int32 true intersection count per tile
    tile_chunks: jax.Array  # (nT,) int32 number of CHUNK-chunks per tile
    tile_starts: jax.Array  # (nT,) int32 chunk-aligned start offsets
    num_isects: jax.Array   # () int32 total true intersections (pre-alignment)
    overflow: jax.Array     # () bool: isect_capacity exceeded (render truncated)
    dest: jax.Array         # (capacity,) expansion index -> aligned slot (or
    #                         m_aligned_cap for invalid); grouped by gaussian
    offsets: jax.Array      # (N+1,) per-gaussian expansion segment boundaries
    #                         (clamped to capacity); used by the gather VJP


def _fill_monotone(values_at, positions, size):
    """Segment-fill: out[m] = values_at[i] for the largest positions[i] <= m.

    Requires `values_at` non-decreasing in scatter order (cummax semantics).
    One scatter-max + one cummax — the fast TPU substitute for
    `values[searchsorted(positions, m)]`.
    """
    base = jnp.zeros((size,), jnp.int32).at[positions].max(values_at, mode="drop")
    return scan_utils.cummax(base)


def bin_gaussians(
    means2d: jax.Array,
    radii: jax.Array,
    depths: jax.Array,
    valid: jax.Array,
    width: int,
    height: int,
    isect_capacity: int,
) -> Intersections:
    n = means2d.shape[0]
    ntx, nty = num_tiles(width, height)
    n_tiles = ntx * nty

    # ---- 1. per-Gaussian tile spans (inclusive-exclusive, clamped) ----
    r = radii.astype(jnp.float32)
    x, y = means2d[..., 0], means2d[..., 1]
    tx0 = jnp.clip(jnp.floor((x - r) / TILE), 0, ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((x + r) / TILE), 0, ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / TILE), 0, nty).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((y + r) / TILE), 0, nty).astype(jnp.int32)
    span_w = tx1 - tx0
    span_h = ty1 - ty0
    counts = jnp.where(valid & (radii > 0), span_w * span_h, 0)

    # ---- 2. expand to intersection entries ----
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         scan_utils.cumsum(counts).astype(jnp.int32)]
    )  # (N+1,)
    m_total = offsets[-1]
    overflow = m_total > isect_capacity

    m_idx = jnp.arange(isect_capacity, dtype=jnp.int32)
    g = _fill_monotone(jnp.arange(n, dtype=jnp.int32), offsets[:-1],
                       isect_capacity)
    entry_valid = m_idx < m_total

    # one packed row-gather for everything the entry needs (separate 1-D
    # gathers cost ~2x more than one (N, 5) row gather on TPU); the
    # per-gaussian expansion start rides along to avoid a second segment fill
    table = jnp.stack(
        [tx0.astype(jnp.float32), ty0.astype(jnp.float32),
         span_w.astype(jnp.float32), depths,
         offsets[:-1].astype(jnp.float32)], axis=1)
    gt = table[g]
    g_tx0 = gt[:, 0].astype(jnp.int32)
    g_ty0 = gt[:, 1].astype(jnp.int32)
    g_sw = jnp.maximum(gt[:, 2].astype(jnp.int32), 1)

    k = m_idx - gt[:, 4].astype(jnp.int32)
    ty = g_ty0 + k // g_sw
    tx = g_tx0 + k % g_sw
    tile = ty * ntx + tx

    # ---- 3. sort by one packed 31-bit key: tile | truncated depth bits.
    # Positive-float bit patterns are order-preserving, so the top
    # (31 - tile_bits) bits of the depth float give a monotone depth ordering
    # within each tile (23 bits at typical tile counts — ties only between
    # depths equal to ~1e-6 relative, which composite in arbitrary order,
    # within gsplat's own guarantees). One key + two payloads sorts ~2x
    # faster than the lexicographic (tile, depth) multi-operand sort.
    tile_bits = _tile_bits(n_tiles)
    depth_shift = tile_bits
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depths, 0.0), jnp.int32)[g]
    key = (tile << (31 - tile_bits)) | (depth_bits >> depth_shift)
    key = jnp.where(entry_valid, key, jnp.int32(2 ** 31 - 1))
    key_s, gid_s, eidx_s = jax.lax.sort(
        (key, g, m_idx), dimension=0, num_keys=1, is_stable=False
    )
    tile_s = jnp.where(key_s == 2 ** 31 - 1, n_tiles, key_s >> (31 - tile_bits))

    # ---- 4. per-tile ranges ----
    # first sorted index per tile via a unique-index boundary scatter (a
    # colliding scatter-min over 2M entries costs ~2x more)
    m_total_c = jnp.minimum(m_total, isect_capacity)
    is_boundary = jnp.concatenate(
        [jnp.ones((1,), bool), tile_s[1:] != tile_s[:-1]])
    b_idx = jnp.where(is_boundary, tile_s, n_tiles + 1)
    first = jnp.full((n_tiles + 1,), m_total_c, jnp.int32).at[b_idx].set(
        m_idx, mode="drop", unique_indices=True)
    starts = jax.lax.cummin(first[::-1])[::-1][:-1]
    ends = jnp.concatenate([starts[1:], m_total_c[None]])
    cnt = ends - starts
    chunks = -(-cnt // CHUNK)
    aligned_starts = CHUNK * jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(chunks).astype(jnp.int32)[:-1]]
    )

    # ---- 5. chunk-aligned relayout as a unique-index scatter ----
    # dest[m] = m + (aligned_start - start) of my tile; the pad delta is
    # non-decreasing over tiles, so a cummax segment-fill at tile starts
    # reproduces it per entry without a gather.
    m_aligned_cap = isect_capacity + n_tiles * CHUNK
    pad_delta = _fill_monotone(aligned_starts - starts, starts, isect_capacity)
    dest = jnp.where(entry_valid, m_idx + pad_delta, m_aligned_cap)
    # One packed scatter instead of two where the static sizes allow it:
    # low `gid_bits` bits hold the gaussian id (0..n inclusive — n is the
    # dummy padding id, so untouched padding slots filled with n unpack to
    # gid=n, tile=0), the high bits the tile id (scattered values < n_tiles).
    # n and n_tiles are Python ints, so the packing width adapts statically;
    # when they don't fit in 31 bits (e.g. 2^21-capacity background at
    # full-res multi-tile images) fall back to two separate scatters rather
    # than corrupt either field.
    gid_bits = max(1, int(n).bit_length())          # represents 0..n
    tile_bits_needed = max(1, int(n_tiles - 1).bit_length()) if n_tiles > 1 \
        else 1
    if gid_bits + tile_bits_needed <= 31:
        packed = gid_s | (tile_s << gid_bits)
        packed_al = jnp.full((m_aligned_cap,), n, jnp.int32).at[dest].set(
            packed, mode="drop")
        gid_aligned = packed_al & ((1 << gid_bits) - 1)
        tile_aligned = (packed_al >> gid_bits) & ((1 << tile_bits_needed) - 1)
    else:
        gid_aligned = jnp.full((m_aligned_cap,), n, jnp.int32).at[dest].set(
            gid_s, mode="drop")
        tile_aligned = jnp.zeros((m_aligned_cap,), jnp.int32).at[dest].set(
            tile_s, mode="drop")

    # expansion index -> aligned slot (invalid entries point past the end)
    dest_exp = jnp.full((isect_capacity,), m_aligned_cap, jnp.int32).at[
        eidx_s].set(dest, mode="drop")

    return Intersections(
        gauss_ids=gid_aligned,
        isect_tile=tile_aligned,
        tile_counts=cnt,
        tile_chunks=chunks,
        tile_starts=aligned_starts,
        num_isects=m_total,
        overflow=overflow,
        dest=dest_exp,
        offsets=jnp.minimum(offsets, isect_capacity),
    )
