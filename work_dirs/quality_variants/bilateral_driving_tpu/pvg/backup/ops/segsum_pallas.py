"""Pallas TPU ragged segment-sum: per-Gaussian reduction of sorted
cotangents.

The rasterization backward needs, for every Gaussian g, the sum of its
per-intersection cotangent rows — contiguous segments
[offsets[g], offsets[g+1]) of the gid-major (unsorted) cotangent array
(ops/pipeline.py `_expand_sort_pallas_bwd`). The round-3 XLA formulation
(hierarchical cumsum + `cs[:, offsets]` boundary gather + diff) spends
~2.7 ms of its ~3.2 ms in the 400k-column lane gather, which XLA lowers
poorly on TPU.

This kernel computes the segment sums directly as masked MXU matmuls — no
prefix scan, no gather anywhere:

  * grid over output blocks of G_BLK Gaussians; block b's input window
    [offsets[b*G], offsets[(b+1)*G]) is CONTIGUOUS (expansion enumerates
    Gaussians in id order) and disjoint across blocks, so total DMA traffic
    is ~one pass over the input;
  * the window streams through VMEM in TILE_L-lane tiles (manual
    double-buffered DMA — the window extent is data-dependent, so
    BlockSpec pipelining cannot express it);
  * per tile, the membership mask m[j, g] = (off[g] <= lane_j < off[g+1])
    is two broadcast compares, and the partial sums are one
    (FEAT, TILE_L) @ (TILE_L, G_BLK) matmul. The mask is EXACT in bf16
    (0/1), so splitting the f32 data into K bf16 limbs gives K full-rate
    one-pass MXU matmuls with f32 accumulation — rel err ~2^-8K (K=3 is
    f32-equivalent), vs 6 passes for a HIGHEST-precision f32 dot.

Modes (BILATERAL_SEGSUM env): "mxu3" (default: stacked (16, cap) input,
3 bf16 limbs — hardware-proven, 8.76 Mpix/s bench r4), "split"
(`segment_sum_rows`, which consumes the R sorted 1-D cotangent arrays
straight from `lax.sort` — no (16, cap) stack materialization — with
3 bf16 limbs), "mxuK", "highest" (f32 HIGHEST dot), "xla" (round-3
cumsum+gather path, kept as fallback and for A/B).

Round-5 note: the original split kernel DMA'd each payload row into a
single sublane of the streaming buffer, which Mosaic rejects on real
hardware (sublane slices must be 8-aligned) — it only ever ran in
interpret mode, and shipping it as default broke BENCH_r04. The split
kernel now lands each row in its own (8, 128)-shaped block (sublane-
aligned by construction) and contracts per sublane-group; defaults are
only flipped after tools/driver_smoke.py passes on-chip.
"""
from __future__ import annotations

import functools
import os
import re

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FEAT = 16        # sublane-padded feature rows (8-aligned for HBM DMA)
G_BLK = 512      # gaussians per grid program
TILE_L = 512     # window lanes streamed per DMA tile (stacked kernel)
# split kernel: 1-D f32 HBM slices must be 1024-aligned (Mosaic memref
# tiling for rank-1 arrays), so its stream tile is 1024 lanes
TILE_R = 1024

_MODE = os.environ.get("BILATERAL_SEGSUM", "mxu3")
if not re.match(r"^(xla|highest|split|mxu[1-9])$", _MODE):
    raise ValueError(
        f"BILATERAL_SEGSUM={_MODE!r}: expected 'xla', 'highest', 'split', "
        "or 'mxuK' with K in 1..9")


# limb count for the bf16 masked-matmul decomposition (3 ≈ f32 accuracy);
# "split" uses the same decomposition as mxu3
_LIMBS = 3 if _MODE == "split" else (
    int(_MODE[3:]) if _MODE.startswith("mxu") else 0)


def _acc_tile(acc, x, m):
    """acc += x @ m with the mode's precision strategy (x (FEAT, TILE_L)
    f32, m (TILE_L, G_BLK) bool membership mask — exact in bf16)."""
    if _MODE == "highest":
        acc[...] += jax.lax.dot_general(
            x, m.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    else:
        mb = m.astype(jnp.bfloat16)
        rem = x
        for _ in range(max(_LIMBS, 1)):
            hi = rem.astype(jnp.bfloat16)
            acc[...] += jax.lax.dot_general(
                hi, mb, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            rem = rem - hi.astype(jnp.float32)


def _kernel(se_ref, offs_ref, data_hbm, out_ref, acc, buf, sem):
    b = pl.program_id(0)
    start = se_ref[b, 0]
    end = se_ref[b, 1]
    astart = (start // TILE_L) * TILE_L
    nt = jnp.where(end > astart, (end - astart + TILE_L - 1) // TILE_L, 0)
    acc[...] = jnp.zeros_like(acc)

    def dma(slot, t):
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(pl.multiple_of(astart + t * TILE_L,
                                                TILE_L), TILE_L)],
            buf.at[slot], sem.at[slot])

    @pl.when(nt > 0)
    def _():
        dma(0, 0).start()

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < nt)
        def _():
            dma(1 - slot, t + 1).start()

        dma(slot, t).wait()
        base = astart + t * TILE_L
        lane = base + jax.lax.broadcasted_iota(jnp.int32, (TILE_L, 1), 0)
        m = ((lane >= offs_ref[0, 0:1, :]) & (lane < offs_ref[0, 1:2, :]))
        _acc_tile(acc, buf[slot], m)
        return 0

    jax.lax.fori_loop(0, nt, body, 0)
    out_ref[...] = acc[...]


def _acc_tile_grouped(acc, x3, base, lo, hi):
    """acc (FEAT, G_BLK) += masked contraction of x3 (FEAT, 8, 128) f32,
    where element (f, s, c) sits at global lane position base + s*128 + c
    and membership in segment g is lo[g] <= pos < hi[g]. One MXU matmul
    (contraction 128) per sublane-group per bf16 limb — numerically
    identical to _acc_tile's decomposition (masks are exact 0/1 in bf16)."""
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    if _MODE == "highest":
        for s in range(8):
            pos = base + s * 128 + ci                   # (128, 1)
            m = ((pos >= lo) & (pos < hi)).astype(jnp.float32)
            acc[...] += jax.lax.dot_general(
                x3[:, s, :], m, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        return
    n_limbs = max(_LIMBS, 1)
    rem = x3
    limbs = []
    for _ in range(n_limbs):
        h = rem.astype(jnp.bfloat16)
        limbs.append(h)
        rem = rem - h.astype(jnp.float32)
    for s in range(8):
        pos = base + s * 128 + ci                       # (128, 1)
        m = ((pos >= lo) & (pos < hi)).astype(jnp.bfloat16)  # (128, G_BLK)
        for h in limbs:
            acc[...] += jax.lax.dot_general(
                h[:, s, :], m, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)


def _kernel_rows(row0, n_rows, se_ref, offs_ref, *rest):
    """Split-input variant: the R payload cotangent arrays arrive as R
    separate 1-D HBM operands (exactly what `lax.sort` returns) reshaped
    to (cap//128, 128); each row's 1024-lane tile is DMA'd as an (8, 128)
    block into its own sublane-aligned slot of the streaming buffer — the
    (FEAT, cap) stack relayout the stacked path pays never exists, and
    every VMEM DMA target is a full (8, 128) tile (Mosaic requires
    sublane slices 8-aligned; the round-4 single-sublane targets did not
    compile on hardware)."""
    rows_hbm = rest[:n_rows]
    out_ref, acc, buf, sem = rest[n_rows:]
    b = pl.program_id(0)
    start = se_ref[b, 0]
    end = se_ref[b, 1]
    astart = (start // TILE_R) * TILE_R
    nt = jnp.where(end > astart, (end - astart + TILE_R - 1) // TILE_R, 0)
    acc[...] = jnp.zeros_like(acc)
    # dead row-blocks (outside row0..row0+R) are never DMA'd; zero them
    # once — scratch persists across grid programs (ADVICE r4 item 3)
    @pl.when(b == 0)
    def _():
        buf[...] = jnp.zeros_like(buf)

    def dmas(slot, t):
        r0 = pl.multiple_of((astart // 128) + t * 8, 8)
        return [pltpu.make_async_copy(
            rows_hbm[j].at[pl.ds(r0, 8)],
            buf.at[slot, row0 + j], sem.at[slot, j])
            for j in range(n_rows)]

    @pl.when(nt > 0)
    def _():
        for c in dmas(0, 0):
            c.start()

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < nt)
        def _():
            for c in dmas(1 - slot, t + 1):
                c.start()

        for c in dmas(slot, t):
            c.wait()
        base = astart + t * TILE_R
        _acc_tile_grouped(acc, buf[slot], base,
                          offs_ref[0, 0:1, :], offs_ref[0, 1:2, :])
        return 0

    jax.lax.fori_loop(0, nt, body, 0)
    out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def segment_sum(data: jax.Array, offsets: jax.Array,
                interpret: bool = False) -> jax.Array:
    """data (FEAT, cap) f32 in gid-major order; offsets (N+1,) i32 sorted
    segment boundaries (offsets[-1] <= cap). Returns (FEAT, N) sums.
    cap must be a multiple of TILE_L (capacity buckets are 2^17-aligned)."""
    feat, cap = data.shape
    assert _MODE != "xla", (
        "segment_sum called with BILATERAL_SEGSUM=xla: the xla mode has no "
        "Pallas kernel; callers must branch to the cumsum+gather path "
        "instead (a 1-limb bf16 kernel here would silently lose precision)")
    assert feat == FEAT, f"pad features to {FEAT} sublanes (got {feat})"
    assert cap % TILE_L == 0, f"cap {cap} not a multiple of {TILE_L}"
    n = offsets.shape[0] - 1
    n_prog = -(-n // G_BLK)
    n_pad = n_prog * G_BLK
    offs_pad = jnp.concatenate(
        [offsets.astype(jnp.int32),
         jnp.broadcast_to(offsets[-1].astype(jnp.int32), (n_pad - n,))])
    lo = offs_pad[:-1].reshape(n_prog, G_BLK)
    hi = offs_pad[1:].reshape(n_prog, G_BLK)
    offs2 = jnp.stack([lo, hi], axis=1)                # (n_prog, 2, G_BLK)
    se = jnp.stack([lo[:, 0], hi[:, -1]], axis=1)      # (n_prog, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,       # se rides SMEM whole (n_prog x 2 i32)
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((1, 2, G_BLK), lambda b, se: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((FEAT, G_BLK), lambda b, se: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((FEAT, G_BLK), jnp.float32),
            pltpu.VMEM((2, FEAT, TILE_L), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # output blocks tile the lane axis directly -> the (FEAT, N) result is
    # written in its final lane-major layout (no post-kernel transpose)
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT, n_pad), jnp.float32),
        interpret=interpret,
    )(se, offs2, data)
    return out if n == n_pad else out[:, :n]


@functools.partial(jax.jit, static_argnames=("row0", "interpret"))
def segment_sum_rows(rows, offsets: jax.Array, row0: int = 0,
                     interpret: bool = False) -> jax.Array:
    """Split-input ragged segment sum: `rows` is a tuple of R (cap,) f32
    arrays in gid-major order (e.g. the payload outputs of `lax.sort`),
    `offsets` (N+1,) i32 sorted segment boundaries. Returns (FEAT, N)
    where output row `row0 + j` is the per-segment sum of rows[j] and all
    other rows are zero — i.e. with row0 = table FEAT0, the result IS the
    lane-major d_table. cap must be a multiple of TILE_R (capacity buckets
    are 2^17-aligned, so this always holds in the pipeline)."""
    n_rows = len(rows)
    assert row0 + n_rows <= FEAT
    assert _MODE != "xla", (
        "segment_sum_rows called with BILATERAL_SEGSUM=xla: the xla mode "
        "has no Pallas kernel; callers must branch to the cumsum+gather "
        "path instead (a 1-limb bf16 kernel here would silently lose "
        "precision)")
    cap = rows[0].shape[0]
    assert cap % TILE_R == 0, f"cap {cap} not a multiple of {TILE_R}"
    rows = tuple(r.reshape(cap // 128, 128) for r in rows)
    n = offsets.shape[0] - 1
    n_prog = -(-n // G_BLK)
    n_pad = n_prog * G_BLK
    offs_pad = jnp.concatenate(
        [offsets.astype(jnp.int32),
         jnp.broadcast_to(offsets[-1].astype(jnp.int32), (n_pad - n,))])
    lo = offs_pad[:-1].reshape(n_prog, G_BLK)
    hi = offs_pad[1:].reshape(n_prog, G_BLK)
    offs2 = jnp.stack([lo, hi], axis=1)                # (n_prog, 2, G_BLK)
    se = jnp.stack([lo[:, 0], hi[:, -1]], axis=1)      # (n_prog, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((1, 2, G_BLK), lambda b, se: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * n_rows,
        out_specs=pl.BlockSpec((FEAT, G_BLK), lambda b, se: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((FEAT, G_BLK), jnp.float32),
            pltpu.VMEM((2, FEAT, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_rows)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_rows, row0, n_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT, n_pad), jnp.float32),
        interpret=interpret,
    )(se, offs2, *rows)
    return out if n == n_pad else out[:, :n]
