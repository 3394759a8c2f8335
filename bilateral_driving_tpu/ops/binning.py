"""Tile binning: Gaussian -> (tile, depth)-sorted intersection lists.

TPU-native replacement for gsplat's `isect_tiles` + radix sort +
`isect_offset_encode` CUDA kernels (reference call stack SURVEY.md §3.3). The
CUDA version compacts variable-length per-Gaussian tile lists with atomics;
here everything is static-shaped and sort-based, which is what XLA wants:

  1. per-Gaussian tile span from the projected center/radius;
  2. intersection m in a static `isect_capacity` buffer finds its Gaussian by
     binary search over the exclusive-cumsum of span sizes (a gather, not a
     scatter — no atomics, fully parallel);
  3. one `lax.sort` over (tile_id, depth) lexicographic keys;
  4. per-tile ranges by binary search, then a *chunk-aligned relayout*: each
     tile's list is placed at a CHUNK-multiple offset so the Pallas rasterizer
     can DMA fixed-size chunks that never straddle two tiles, and its backward
     can write per-intersection gradients without masked stores. Padding
     entries point at a dummy Gaussian slot (id = N) whose features are zero,
     so they contribute nothing to forward or backward.

The whole pass is integer/gather work of O(capacity log N); it is not
differentiable and is wrapped in stop_gradient by the pipeline (gradients flow
through the *gathered feature values*, not the indices — same as gsplat).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 32          # pixel tile edge; 32x32 = 1024 px = one (8,128) VPU block
CHUNK = 128        # intersections per rasterizer chunk (MXU contraction dim)


def num_tiles(width: int, height: int) -> tuple[int, int]:
    return (-(-width // TILE), -(-height // TILE))


class Intersections(NamedTuple):
    gauss_ids: jax.Array    # (M_aligned,) int32 in [0, N]; N = dummy padding
    isect_tile: jax.Array   # (M_aligned,) int32 owning tile id (clamped)
    tile_counts: jax.Array  # (nT,) int32 true intersection count per tile
    tile_chunks: jax.Array  # (nT,) int32 number of CHUNK-chunks per tile
    tile_starts: jax.Array  # (nT,) int32 chunk-aligned start offsets
    num_isects: jax.Array   # () int32 total true intersections (pre-alignment)
    overflow: jax.Array     # () bool: isect_capacity exceeded (render truncated)


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

    # ---- 2. expand to intersection entries via searchsorted (gather) ----
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )  # (N+1,)
    m_total = offsets[-1]
    overflow = m_total > isect_capacity

    m_idx = jnp.arange(isect_capacity, dtype=jnp.int32)
    g = jnp.searchsorted(offsets, m_idx, side="right").astype(jnp.int32) - 1
    g = jnp.clip(g, 0, n - 1)
    entry_valid = m_idx < m_total
    k = m_idx - offsets[g]
    sw = jnp.maximum(span_w[g], 1)
    ty = ty0[g] + k // sw
    tx = tx0[g] + k % sw
    tile = ty * ntx + tx
    tile = jnp.where(entry_valid, tile, n_tiles)  # invalid sorts to the end
    depth_key = jnp.where(entry_valid, depths[g], jnp.inf)

    # ---- 3. lexicographic sort by (tile, depth) ----
    tile_s, _, gid_s = jax.lax.sort(
        (tile, depth_key, g), dimension=0, num_keys=2, is_stable=False
    )

    # ---- 4. per-tile ranges + chunk-aligned relayout ----
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)
    cnt = ends - starts
    chunks = -(-cnt // CHUNK)
    aligned = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(chunks * CHUNK).astype(jnp.int32)]
    )
    aligned_starts = aligned[:-1]

    m_aligned_cap = isect_capacity + n_tiles * CHUNK
    ma = jnp.arange(m_aligned_cap, dtype=jnp.int32)
    t_of = jnp.searchsorted(aligned, ma, side="right").astype(jnp.int32) - 1
    t_of = jnp.clip(t_of, 0, n_tiles - 1)
    local = ma - aligned_starts[t_of]
    src = starts[t_of] + local
    ok = local < cnt[t_of]
    gid_aligned = jnp.where(ok, gid_s[jnp.clip(src, 0, isect_capacity - 1)], n)

    return Intersections(
        gauss_ids=gid_aligned,
        isect_tile=t_of,
        tile_counts=cnt,
        tile_chunks=chunks,
        tile_starts=aligned_starts,
        num_isects=m_total,
        overflow=overflow,
    )
