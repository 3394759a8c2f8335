"""Fused Pallas expansion: per-Gaussian table -> per-intersection sort inputs.

Replaces three XLA stages of the binning pipeline that together cost ~9 ms
at cap 2^20 on a v5e core (tools/profile_prefix.py round-3 numbers):

  1. `binning._fill_monotone` — the capacity-sized scatter+cummax computing
     each entry's Gaussian id (~3.6 ms; the measured "XLA floor" for that
     formulation, ROADMAP);
  2. the (cap, 14) monotone row gather `table[exp.g]` (~5 ms in fusion
     context; XLA row gathers run far off bandwidth on TPU — measured
     21-42 ms standalone);
  3. per-entry tile-id + packed-key arithmetic (binning.entry_tiles /
     pack_keys).

One kernel does all three at ~2.7 ms by exploiting the structure XLA's
gather cannot see: entry -> Gaussian is MONOTONE, so any 128 consecutive
entries touch a window of at most 128 *entry-bearing* table rows. Per
128-entry chunk the kernel

  * slices two 128-lane slabs of a lane-major table window (Mosaic's
    `dynamic_gather` handles a single source vreg, so slabs are the unit);
  * recovers each entry's Gaussian as a comparison-count against the slab's
    segment-start row (a (128,128) compare + sublane reduce — no
    searchsorted, no scatter);
  * gathers all 16 table rows with one single-vreg `take_along_axis` per
    slab and packs the (tile | depth-bits) sort key in registers.

Sparsity contract: the window bound relies on every *interior* Gaussian of
a window owning >= 1 entry, which fails when many zero-count (culled/dead)
rows interleave — e.g. early training with mostly-empty capacity buffers.
The wrapper detects oversized windows in XLA (`window_violation`) and
`lax.cond`-falls back to the reference XLA path, so results are always
exact; the kernel takes over as occupancy rises. Dense scenes (the bench
and converged training) never fall back.

Numerical note: the in-kernel `floor(k / span_w)` runs in f32. Exact
because k < tiles-per-Gaussian <= n_tiles (< 2^13) and the relative error
of a correctly-rounded f32 divide (2^-24) cannot cross an integer boundary
at that magnitude (min true distance to an integer is 1/span_w >= 2^-7).

Reference semantics: gsplat `isect_tiles` expansion as the reference
invokes it (project/models/trainers/base.py:393-408); parity is pinned by
tests/test_expand_pallas.py against `binning.bin_gaussians` and the XLA
payload-sort path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import binning

NR = 16          # lane-major table rows (see TABLE_ROWS)
BLOCK = 2048     # entries per grid block (shrunk to cap when cap < BLOCK)
LW_SLACK = 512   # extra window lanes beyond the block (slab + align slack)
INT_MAX = 2 ** 31 - 1


def _block_lw(cap: int):
    block = min(BLOCK, cap)
    assert cap % block == 0 and block % 128 == 0, cap
    return block, block + LW_SLACK

# Logical table rows (lane-major: row r, lane g = column r of Gaussian g):
#   0 tx0, 1 ty0, 2 span_w, 3 seg_start, 4 x, 5 y, 6 a, 7 b, 8 c,
#   9 logop, 10 colr, 11 colg, 12 colb, 13 depth, 14 orig_id, 15 pad
TABLE_ROWS = 16
FEAT0, NFEAT = 4, 10


def _expand_kernel(edges_ref, ni_ref, tab_ref, keyg_ref, feats_ref,
                   win_ref, sem, *, block: int, lw: int, ntx: int,
                   n_tiles: int, n_orig: int):
    nchunk = block // 128
    tile_bits = binning._tile_bits(n_tiles)
    b = pl.program_id(0)
    m0 = b * block
    ni = ni_ref[0]

    def write_invalid():
        keyg_ref[0:1, :] = jnp.full((1, block), INT_MAX, jnp.int32)
        keyg_ref[1:2, :] = jnp.full((1, block), n_orig, jnp.int32)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (NFEAT, block), 0)
        # logop row (5) below the 1/255 gate; .at[].set would lower to an
        # (unsupported) scatter inside the kernel
        feats_ref[:, :] = jnp.where(rowi == 5, -30.0, 0.0)

    @pl.when(m0 >= ni)
    def _():
        write_invalid()

    @pl.when(m0 < ni)
    def _():
        a0_blk = pl.multiple_of(edges_ref[b * nchunk] & ~127, 128)
        cp = pltpu.make_async_copy(
            tab_ref.at[:, pl.ds(a0_blk, lw)], win_ref, sem)
        cp.start()
        cp.wait()
        for j in range(nchunk):
            cbase = (edges_ref[b * nchunk + j] - a0_blk) & ~127
            cbase = pl.multiple_of(jnp.clip(cbase, 0, lw - 256), 128)
            slab_a = win_ref[:, pl.ds(cbase, 128)]          # (NR, 128)
            slab_b = win_ref[:, pl.ds(cbase + 128, 128)]
            seg_a = slab_a.T[:, 3:4]                        # (128, 1)
            seg_b = slab_b.T[:, 3:4]
            mq = (m0 + 128 * j) + jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1)
            mf = mq.astype(jnp.float32)
            # entry's Gaussian = #window-rows with seg_start <= m, minus 1
            # (rightmost among duplicate boundaries = the entry-bearing row)
            cnt = (jnp.sum((seg_a <= mf).astype(jnp.int32), 0, keepdims=True)
                   + jnp.sum((seg_b <= mf).astype(jnp.int32), 0,
                             keepdims=True))
            gl = cnt - 1                                    # in [0, 256)
            gl_a = jnp.clip(gl, 0, 127)
            gl_b = jnp.clip(gl - 128, 0, 127)
            r_a = jnp.take_along_axis(
                slab_a, jnp.broadcast_to(gl_a, (NR, 128)), 1)
            r_b = jnp.take_along_axis(
                slab_b, jnp.broadcast_to(gl_b, (NR, 128)), 1)
            rows = jnp.where(gl >= 128, r_b, r_a)           # (NR, 128)

            # entry_tiles (binning.entry_tiles): k-th tile of the span
            k = mf - rows[3:4]
            sw = jnp.maximum(rows[2:3], 1.0)
            q = jnp.floor(k / sw)                           # exact: see note
            ty = rows[1:2] + q
            tx = rows[0:1] + (k - q * sw)
            tile = (ty * ntx + tx).astype(jnp.int32)
            # pack_keys (binning.pack_keys)
            dbits = jax.lax.bitcast_convert_type(
                jnp.maximum(rows[13:14], 0.0), jnp.int32)
            key = (tile << (31 - tile_bits)) | (dbits >> tile_bits)
            valid = mq < ni
            key = jnp.where(valid, key, INT_MAX)
            gid = jnp.where(valid, rows[14:15].astype(jnp.int32), n_orig)
            sl = slice(j * 128, (j + 1) * 128)
            keyg_ref[0:1, sl] = key
            keyg_ref[1:2, sl] = gid
            feats = rows[FEAT0:FEAT0 + NFEAT]
            feats = jnp.where(valid, feats, 0.0)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (NFEAT, 128), 0)
            feats = jnp.where(rowi == 5,
                              jnp.where(valid, rows[9:10], -30.0),
                              feats)                        # logop default
            feats_ref[:, sl] = feats


def _run_kernel(table_T, edges, num_isects, cap, ntx, n_tiles, n_orig,
                interpret=False):
    block, lw = _block_lw(cap)
    nb = cap // block
    kern = functools.partial(_expand_kernel, block=block, lw=lw, ntx=ntx,
                             n_tiles=n_tiles, n_orig=n_orig)
    keyg, feats = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((2, block), lambda b, *_: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NFEAT, block), lambda b, *_: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((NR, lw), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=[jax.ShapeDtypeStruct((2, cap), jnp.int32),
                   jax.ShapeDtypeStruct((NFEAT, cap), jnp.float32)],
        interpret=interpret,
    )(edges, num_isects, table_T)
    return keyg[0], keyg[1], feats


def pad_table(table_T, lw: int):
    """Pad lanes to a 128-multiple + window slack; padding rows get a
    segment sentinel beyond any entry index so window counts ignore them."""
    n = table_T.shape[1]
    npad = (-(-(n + lw) // 128)) * 128
    pad = jnp.zeros((TABLE_ROWS, npad - n), table_T.dtype)
    pad = pad.at[3, :].set(jnp.float32(2 ** 30))
    return jnp.concatenate([table_T, pad], axis=1)


def chunk_edges(offsets, cap, npad, lw):
    """First Gaussian of every 128-entry chunk (XLA-side, cheap): rightmost
    row with seg_start <= chunk start. `offsets` are the per-Gaussian
    exclusive prefix starts, offsets[:-1] non-decreasing."""
    starts = jnp.arange(0, cap, 128, dtype=offsets.dtype)
    e = jnp.searchsorted(offsets[:-1], starts, side="right").astype(
        jnp.int32) - 1
    e = jnp.clip(e, 0, npad - lw)
    return e


def window_violation(edges, num_isects, block, lw):
    """True when some block's Gaussian window exceeds the window lanes
    (sparse tables: interleaved zero-count rows break the
    <=128-rows-per-chunk bound) — the caller falls back to the XLA path."""
    nchunk = block // 128
    e = edges.reshape(-1, nchunk)
    span = e[:, -1] - (e[:, 0] & ~127) + 256
    nb_used = num_isects // block + 1
    used = jnp.arange(e.shape[0]) <= nb_used
    return jnp.any((span > lw) & used)


def expand_gather(table_T, offsets, num_isects, cap, ntx, n_tiles, n_orig,
                  interpret=False):
    """(key, gid, feats) per intersection entry, pre-sort.

    table_T: (TABLE_ROWS, N') lane-major per-Gaussian table (see layout
    above; N' arbitrary — padded here). offsets: (N+1,) int32 entry starts.
    Falls back to the XLA gather when the sparsity contract is violated.
    """
    block, lw = _block_lw(cap)
    tab = pad_table(table_T, lw)
    npad = tab.shape[1]
    edges = chunk_edges(offsets, cap, npad, lw)
    bad = window_violation(edges, num_isects, block, lw)
    ni = jnp.asarray(num_isects, jnp.int32).reshape(1)

    def pallas_branch(tab):
        return _run_kernel(tab, edges, ni, cap, ntx, n_tiles, n_orig,
                           interpret=interpret)

    def xla_branch(tab):
        return expand_gather_xla(tab, offsets, num_isects, cap, ntx,
                                 n_tiles, n_orig)

    return jax.lax.cond(bad, xla_branch, pallas_branch, tab)


def expand_gather_xla(table_T, offsets, num_isects, cap, ntx, n_tiles,
                      n_orig):
    """Reference XLA path (fill + monotone gather + key pack) — the
    pre-round-3 pipeline, kept as the sparse-table fallback and test
    oracle."""
    n = offsets.shape[0] - 1
    g = binning._fill_monotone(jnp.arange(n, dtype=jnp.int32),
                               offsets[:-1], cap)
    m_idx = jnp.arange(cap, dtype=jnp.int32)
    gt = table_T[:, g]                                    # (NR, cap)
    tile = binning.entry_tiles(
        gt[0].astype(jnp.int32), gt[1].astype(jnp.int32),
        jnp.maximum(gt[2].astype(jnp.int32), 1),
        gt[3].astype(jnp.int32), m_idx, ntx)
    valid = m_idx < num_isects
    key = binning.pack_keys(tile, gt[13], n_tiles, valid)
    gid = jnp.where(valid, gt[14].astype(jnp.int32), n_orig)
    feats = jnp.where(valid[None, :], gt[FEAT0:FEAT0 + NFEAT], 0.0)
    feats = feats.at[5].set(jnp.where(valid, gt[9], -30.0))
    return key, gid, feats
