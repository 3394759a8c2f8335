"""Pallas TPU tile rasterizer: alpha compositing as MXU matmuls.

TPU-native replacement for gsplat's `rasterize_to_pixels` forward/backward
CUDA kernels (reference pipeline: SURVEY.md §3.3). The CUDA design — one
thread per pixel, sequential front-to-back loop with early termination and
atomic gradient scatters — maps terribly onto a TPU. This kernel re-derives
compositing as dense linear algebra so both passes run on the MXU:

  * One grid program per 32×32 pixel tile; the tile's 1024 pixels live as one
    (8, 128) VPU block.
  * The depth-sorted intersection list of the tile (built by ops/binning.py,
    chunk-aligned) is streamed from HBM in double-buffered chunks of
    CHUNK=128 intersections. Features are stored structure-of-arrays,
    (16, M): chunk DMA slices the 128-aligned M axis, which is the only
    HBM slicing Mosaic allows, and every in-kernel operand arrives already
    transposed for the MXU.
  * α = exp(-σ′) where σ′ = ½ dᵀΣ⁻¹d − log(opacity) is a quadratic in pixel
    coords, so evaluating a chunk is one (128, 8) @ (8, 1024) matmul of
    per-intersection quadratic coefficients against a fixed pixel-monomial
    basis [x², y², xy, x, y, 1] (log-opacity folded into the constant term;
    its gradient falls out of the coefficient construction's autodiff in
    ops/pipeline.py). Coefficients are built against the *tile-local* origin
    so f32 never sees catastrophic cancellation.
  * Front-to-back transmittance is a prefix-sum of log(1-α): a strictly
    lower-triangular (128, 128) @ (128, 1024) matmul in log space.
  * Channel accumulation is colorsᵀ (8, 128) @ w (128, 1024) — the constant
    "1" channel makes the same matmul produce the alpha image.
  * Backward needs suffix sums of downstream contributions — the strictly
    *upper*-triangular matmul — plus per-intersection gradients written to
    disjoint chunk-aligned slots: **no atomics anywhere**; the caller
    segment-sums per-intersection gradients to Gaussians via the VJP of the
    feature gather.
  * Early termination is a per-chunk skip (`pl.when`) once max transmittance
    in the tile falls below 1e-4, matching gsplat's per-pixel cutoff in
    effect while keeping control flow compile-time static.

Feature layout, (16, M) f32, built by ops/pipeline.py:
  rows 0..5   quadratic coeffs matching basis rows [x², y², xy, x, y, 1];
              row 5 carries the constant term minus log(opacity)
  rows 6..7   zero padding (so the basis matmul contracts over 8 sublanes)
  rows 8..12  composited channels [r, g, b, depth, 1]
  rows 13..15 zero padding

Output layout: (num_tiles, 8, 8, 128) f32 — channels [r, g, b, depth, alpha,
0, 0, 0] over the flattened 1024-pixel tile (pixel p = py*32+px ↦ (p//128,
p%128)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import CHUNK, TILE

C_PAD = 8            # padded channel count in the output
FEAT = 16            # feature rows
MAX_BWD_CHUNKS = 512  # transmittance checkpoint depth in backward (64k isects/tile)
STOP_T = 1e-4        # early-termination transmittance threshold
ALPHA_THRESH = 1.0 / 255.0
MAX_ALPHA = 0.999
_PIX = TILE * TILE   # 1024


def _pixel_basis():
    """(8, 1024) tile-local monomial basis [x², y², xy, x, y, 1, 0, 0]."""
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, _PIX), 1)
    px = jnp.mod(flat, TILE).astype(jnp.float32) + 0.5
    py = (flat // TILE).astype(jnp.float32) + 0.5
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate(
        [px * px, py * py, px * py, px, py, one, zero, zero], axis=0
    )


def _tri(strict_lower: bool):
    """(CHUNK, CHUNK) strictly-triangular 0/1 matrix."""
    i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (j < i if strict_lower else j > i).astype(jnp.float32)


def _dot(a, b, contract=((1,), (0,))):
    # HIGHEST: TPU f32 matmul defaults to one-pass bf16 on the MXU, which is
    # far too coarse for transmittance prefix sums (alpha drifts above 1).
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _chunk_alphas(chunkf, basis):
    """Shared alpha math. chunkf: (FEAT, CHUNK). Returns (alpha, log1m)."""
    coef_t = chunkf[0:8, :]                                # (8, CHUNK)
    # sigma[k, p] = Σ_r coef_t[r, k] * basis[r, p]
    sigma = _dot(coef_t, basis, contract=((0,), (0,)))     # (CHUNK, PIX)
    alpha = jnp.minimum(jnp.exp(-sigma), MAX_ALPHA)
    alpha = jnp.where(alpha >= ALPHA_THRESH, alpha, 0.0)
    return alpha, jnp.log1p(-alpha)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(starts_ref, chunks_ref, feats_hbm, out_ref,
                acc, tc, buf, sem):
    t = pl.program_id(0)
    start = starts_ref[t]
    nchunks = chunks_ref[t]

    acc[...] = jnp.zeros_like(acc)
    tc[...] = jnp.ones_like(tc)

    basis = _pixel_basis()
    ltri = _tri(strict_lower=True)

    def dma(slot, c):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK),
                                  CHUNK)],
            buf.at[slot], sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def cond(state):
        c, alive = state
        return (c < nchunks) & alive

    def body(state):
        c, _ = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()

        chunkf = buf[slot]                              # (FEAT, CHUNK)
        alpha, l1m = _chunk_alphas(chunkf, basis)
        s_excl = _dot(ltri, l1m)                        # (CHUNK, PIX)
        trans = jnp.exp(s_excl) * tc[...]               # bcast (1, PIX)
        w = alpha * trans
        colors_t = chunkf[8:16, :]                      # (8, CHUNK)
        # rows [8..16) = [r, g, b, depth, 1, 0, 0, 0]:
        # acc[ch, p] += Σ_k colors_t[ch, k] * w[k, p]
        acc[...] += _dot(colors_t, w)
        tc[...] *= jnp.exp(s_excl[CHUNK - 1:CHUNK, :] + l1m[CHUNK - 1:CHUNK, :])

        return c + 1, jnp.max(tc[...]) > STOP_T

    # true early termination: stop iterating (and issuing DMAs) once the
    # whole tile is saturated; one conditional wait drains the orphan
    # prefetch issued just before exit
    c_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), True))

    @pl.when(c_final < nchunks)
    def _():
        dma(jax.lax.rem(c_final, 2), c_final).wait()

    # acc rows are [r, g, b, depth, Σw, 0, 0, 0]; replace the summed-w alpha
    # channel with the analytically identical but exactly-bounded 1 - T_final
    # (f32 summation lets Σw drift past 1 by ~1e-4).
    acc[4:5, :] = 1.0 - tc[...]
    out_ref[0] = acc[...].reshape(C_PAD, _PIX // 128, 128)


def rasterize_fwd(feats, tile_starts, tile_chunks, n_tiles, *, interpret=False):
    """feats: (FEAT, M_aligned) f32. Returns (n_tiles, 8, 8, 128)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, C_PAD, _PIX // 128, 128), lambda t, *_: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((C_PAD, _PIX), jnp.float32),   # acc
            pltpu.VMEM((1, _PIX), jnp.float32),       # transmittance carry
            pltpu.VMEM((2, FEAT, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, C_PAD, _PIX // 128, 128),
                                       jnp.float32),
        interpret=interpret,
    )(tile_starts, tile_chunks, feats)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(starts_ref, chunks_ref, feats_hbm, gout_ref, dfeats_init_hbm,
                dfeats_hbm, tc_store, carry, buf, dbuf, sem, wsem):
    del dfeats_init_hbm   # aliased to dfeats_hbm (pre-zeroed by the caller)
    t = pl.program_id(0)
    start = starts_ref[t]
    nchunks = jnp.minimum(chunks_ref[t], MAX_BWD_CHUNKS)

    basis = _pixel_basis()
    ltri = _tri(strict_lower=True)
    utri = _tri(strict_lower=False)
    # cotangent rows pair with feature rows 8..16: [r, g, b, depth, alpha(=the
    # constant-1 channel), 0, 0, 0]
    g8 = gout_ref[0].reshape(C_PAD, _PIX)

    def dma_in(slot, c):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK),
                                  CHUNK)],
            buf.at[slot], sem.at[slot],
        )

    def dma_out(slot, c):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dfeats_hbm.at[:, pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK),
                                   CHUNK)],
            wsem.at[slot],
        )

    # ---- pass 1: forward sweep, checkpoint per-chunk entry transmittance ----
    carry[...] = jnp.ones_like(carry)

    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    def cond1(state):
        c, alive = state
        return (c < nchunks) & alive

    def body1(state):
        c, _ = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            dma_in(1 - slot, c + 1).start()

        dma_in(slot, c).wait()
        tc_store[pl.ds(c, 1), :] = carry[...]

        _, l1m = _chunk_alphas(buf[slot], basis)
        total = _dot(jnp.ones((1, CHUNK), jnp.float32), l1m)
        carry[...] *= jnp.exp(total)
        return c + 1, jnp.max(carry[...]) > STOP_T

    # n_live = chunks actually composited before saturation; chunks beyond it
    # contribute nothing and keep the caller's pre-zeroed gradients
    n_live, _ = jax.lax.while_loop(cond1, body1, (jnp.int32(0), True))

    @pl.when(n_live < nchunks)
    def _():
        dma_in(jax.lax.rem(n_live, 2), n_live).wait()

    # ---- pass 2: reverse sweep with downstream-contribution carry R ----
    carry[...] = jnp.zeros_like(carry)   # reused as R = Σ_later w·G

    @pl.when(n_live > 0)
    def _():
        dma_in(0, n_live - 1).start()

    def bwd_body(ci, _):
        c = n_live - 1 - ci
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_live)
        def _():
            dma_in(1 - slot, c - 1).start()

        dma_in(slot, c).wait()
        # wait for the write issued two iterations ago on this slot
        @pl.when(ci >= 2)
        def _():
            dma_out(slot, c + 2).wait()

        tc_in = tc_store[pl.ds(c, 1), :]
        chunkf = buf[slot]
        alpha, l1m = _chunk_alphas(chunkf, basis)
        s_excl = _dot(ltri, l1m)
        trans = jnp.exp(s_excl) * tc_in
        w = alpha * trans

        colors_t = chunkf[8:16, :]                       # (8, CHUNK)
        # G[k, p] = Σ_ch colors_t[ch, k] * g8[ch, p]
        G = _dot(colors_t, g8, contract=((0,), (0,)))    # (CHUNK, PIX)
        wG = w * G
        suffix = _dot(utri, wG) + carry[...]
        # gradient of loss wrt alpha_k (pre-gating)
        one_m = jnp.maximum(1.0 - alpha, 1.0 - MAX_ALPHA)
        d_alpha = trans * G - suffix / one_m
        # gate: no gradient where alpha clamped at MAX_ALPHA or zeroed
        gate = (alpha > 0.0) & (alpha < MAX_ALPHA)
        d_alpha = jnp.where(gate, d_alpha, 0.0)

        # α = exp(-σ′) ⇒ dσ′ = -α·dα; gradient wrt transposed coefs:
        # d_coef_t[r, k] = Σ_p basis[r, p] * d_sigma[k, p]
        d_sigma = -(alpha * d_alpha)
        d_coef_t = _dot(basis, d_sigma, contract=((1,), (1,)))
        # d_colors_t[ch, k] = Σ_p g8[ch, p] * w[k, p]
        d_colors_t = _dot(g8, w, contract=((1,), (1,)))

        dbuf[slot] = jnp.concatenate([d_coef_t, d_colors_t], axis=0)
        dma_out(slot, c).start()

        carry[...] += _dot(jnp.ones((1, CHUNK), jnp.float32), wG)
        return 0

    jax.lax.fori_loop(0, n_live, bwd_body, 0)

    # drain outstanding writes
    @pl.when(n_live >= 2)
    def _():
        dma_out(jax.lax.rem(n_live - 2, 2), 1).wait()

    @pl.when(n_live >= 1)
    def _():
        dma_out(jax.lax.rem(n_live - 1, 2), 0).wait()


def rasterize_bwd(feats, tile_starts, tile_chunks, gout, n_tiles, *,
                  interpret=False):
    """Returns d_feats with the same (FEAT, M_aligned) shape as feats. The
    buffer is pre-zeroed and aliased through the kernel, so early-terminated
    and uncovered slots carry exact zero gradients (they correspond to
    contributions the forward treated as zero)."""
    dfeats_init = jnp.zeros(feats.shape, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, C_PAD, _PIX // 128, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((MAX_BWD_CHUNKS, _PIX), jnp.float32),  # tc checkpoints
            pltpu.VMEM((1, _PIX), jnp.float32),               # carry (Tc / R)
            pltpu.VMEM((2, FEAT, CHUNK), jnp.float32),        # read buffers
            pltpu.VMEM((2, FEAT, CHUNK), jnp.float32),        # write buffers
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(feats.shape, jnp.float32),
        input_output_aliases={4: 0},
        interpret=interpret,
    )(tile_starts, tile_chunks, feats, gout, dfeats_init)
