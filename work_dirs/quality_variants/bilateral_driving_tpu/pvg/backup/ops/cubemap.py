"""Differentiable cube-map sampling with a Pallas window-splat backward.

The EnvLight sky (reference modules.py:176-211, nvdiffrast `dr.texture`
cube mode) bilinearly gathers a (6, R, R, 3) texture at ~H*W directions.
XLA's gather forward is fine (~3 ms at 544x320/R=1024 on v5e) but the
autodiff backward is a scatter-add of 4 corners x 3 channels per pixel —
XLA TPU scatter runs at ~73M scalars/s, 28 ms per step, independent of R
(ROADMAP round-1 "EnvLight" suspect, confirmed round 2).

TPU-native backward: pixels of one 32x32 image tile land in a compact
window of one (occasionally 2-3) cube face, and bilinear splatting is
SEPARABLE — the window accumulation W[v,u] = sum_p wv[p,v] wu[p,u] g[p]
is two small one-hot-weight matrices contracted on the MXU:
W_ch = wv^T @ (wu * g_ch). One grid step per (image tile, face) builds the
(WIN, WIN) window and read-modify-writes it into the gradient texture; the
TPU grid is sequential, so overlapping windows are race-free. ~5 ms at the
same operating point.

Texture layout inside this module is (6*3, R, R) (channel-major faces) so
window DMAs have full-width lanes; the public API keeps the (6, R, R, 3)
layout of models/sky.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32            # image-tile edge (matches the rasterizer's tiles)
_PIX = TILE * TILE
MAX_WIN = 256        # cube-cell window edge per (tile, face)


def faces_uv(dirs: jax.Array):
    """OpenGL cube-map face id + (u, v) in [-1, 1] for directions (..., 3).
    (models/sky.py:_cube_faces_uv semantics; shared here for the VJP.)"""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    eps = 1e-9
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x, jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az)) + eps
    u = jnp.where(
        is_x, jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y >= 0, z, -z), -y))
    return face.astype(jnp.int32), u / ma, v / ma


def _corner_coords(u, v, res: int):
    pix_u = jnp.clip((u * 0.5 + 0.5) * res - 0.5, 0.0, res - 1)
    pix_v = jnp.clip((v * 0.5 + 0.5) * res - 0.5, 0.0, res - 1)
    u0 = jnp.clip(jnp.floor(pix_u), 0, res - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(pix_v), 0, res - 2).astype(jnp.int32)
    return u0, v0, pix_u - u0, pix_v - v0


def sample(base: jax.Array, dirs: jax.Array) -> jax.Array:
    """Bilinear cube lookup; base (6, R, R, C), dirs (..., 3) normalized by
    caller or not (normalized internally). Pure-XLA, autodiff-friendly."""
    res = base.shape[1]
    c = base.shape[-1]
    d = dirs * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-18))
    face, u, v = faces_uv(d)
    u0, v0, wu, wv = _corner_coords(u, v, res)
    flat = base.reshape(6 * res * res, c)

    def corner(vi, ui):
        return flat[(face * res + vi) * res + ui]

    wu = wu[..., None]
    wv = wv[..., None]
    return (corner(v0, u0) * (1 - wv) * (1 - wu)
            + corner(v0, u0 + 1) * (1 - wv) * wu
            + corner(v0 + 1, u0) * wv * (1 - wu)
            + corner(v0 + 1, u0 + 1) * wv * wu)


# ---------------------------------------------------------------------------
# Pallas window-splat backward
# ---------------------------------------------------------------------------


def _splat_kernel(orig_u, orig_v, flags, u0_ref, v0_ref, fu_ref, fv_ref,
                  face_ref, g_ref, dz_hbm, dbase_hbm, win, tmp, sem,
                  *, res: int, win_sz: int):
    del dz_hbm  # aliased to dbase_hbm (pre-zeroed by the caller)
    t = pl.program_id(0)
    f = pl.program_id(1)
    idx = t * 6 + f

    @pl.when(flags[idx] > 0)
    def _():
        ou = orig_u[idx]
        ov = orig_v[idx]
        # pixel vectors stay in their (8, PIX/8) VMEM layout; weights are
        # built 3-D and collapsed (8, PIX/8, WIN) -> (PIX, WIN), a
        # sublane-only shape cast Mosaic supports (flattening to a (PIX,)
        # vector is an unsupported lane-dim cast)
        u0l = u0_ref[0] - ou                     # (8, PIX/8) local corner
        v0l = v0_ref[0] - ov
        onface = face_ref[0] == f
        inwin = (u0l >= 0) & (u0l < win_sz - 1) & (v0l >= 0) \
            & (v0l < win_sz - 1)
        ok = (onface & inwin).astype(jnp.float32)

        rows = _PIX // 128
        j = jax.lax.broadcasted_iota(jnp.int32, (rows, 128, win_sz), 2)
        fu = fu_ref[0][:, :, None]
        fv = fv_ref[0][:, :, None]
        u0c = u0l[:, :, None]
        v0c = v0l[:, :, None]
        okc = ok[:, :, None]
        wu = (((j == u0c) * (1.0 - fu) + (j == u0c + 1) * fu)
              * okc).reshape(_PIX, win_sz)
        wv = (((j == v0c) * (1.0 - fv) + (j == v0c + 1) * fv)
              * okc).reshape(_PIX, win_sz)

        g3 = g_ref[0]                            # (3, 8, PIX/8)
        for ch in range(3):
            gch = g3[ch][:, :, None]
            b = wu * jnp.broadcast_to(gch, (rows, 128, win_sz)).reshape(
                _PIX, win_sz)
            win[ch] = jax.lax.dot_general(
                wv, b, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)     # (WIN, WIN)

        # sequential read-modify-write of the window (grid steps execute in
        # order on a TPU core, so overlapping windows cannot race); the 3
        # channel planes are adjacent in the (18, R, R) layout -> one DMA
        region = dbase_hbm.at[pl.ds(f * 3, 3),
                              pl.ds(pl.multiple_of(ov, 8), win_sz),
                              pl.ds(pl.multiple_of(ou, 128), win_sz)]
        cp = pltpu.make_async_copy(region, tmp, sem)
        cp.start()
        cp.wait()
        tmp[...] += win[...]
        cp = pltpu.make_async_copy(tmp, region, sem)
        cp.start()
        cp.wait()


def splat_grad(face, u0, v0, fu, fv, g, res: int,
               interpret: bool = False) -> jax.Array:
    """d(base)/d(loss) for bilinear cube splats.

    face/u0/v0/fu/fv: (npix,) corner data; g: (npix, 3) pixel cotangents.
    Returns (6*3, R, R). npix is padded to a TILE*TILE multiple by caller.
    """
    npix = face.shape[0]
    assert npix % _PIX == 0
    n_tiles = npix // _PIX
    win_sz = min(MAX_WIN, res)

    def t2(x):
        return x.reshape(n_tiles, 8, _PIX // 8)

    face_t, u0_t, v0_t = t2(face), t2(u0), t2(v0)
    fu_t, fv_t = t2(fu), t2(fv)
    g_t = g.reshape(n_tiles, _PIX, 3).transpose(0, 2, 1).reshape(
        n_tiles, 3, 8, _PIX // 8)               # (T, 3, 8, PIX/8)

    # per-(tile, face) window origins + occupancy
    face_flat = face.reshape(n_tiles, _PIX)
    onf = face_flat[:, None, :] == jnp.arange(6,
                                              dtype=jnp.int32)[None, :, None]
    big = jnp.int32(1 << 29)
    u0_flat = u0.reshape(n_tiles, _PIX)
    v0_flat = v0.reshape(n_tiles, _PIX)
    o_u = jnp.min(jnp.where(onf, u0_flat[:, None, :], big), axis=2)
    o_v = jnp.min(jnp.where(onf, v0_flat[:, None, :], big), axis=2)
    # HBM window slices must start on the (8, 128) tile grid
    o_u = (o_u // 128) * 128
    o_v = (o_v // 8) * 8
    o_u = jnp.clip(o_u, 0, max(res - win_sz, 0)).astype(jnp.int32)
    o_v = jnp.clip(o_v, 0, max(res - win_sz, 0)).astype(jnp.int32)
    flags = jnp.any(onf, axis=2).astype(jnp.int32)

    # coverage guarantee: if any (tile, face)'s corner span exceeds the
    # window (possible only for pathologically incoherent directions —
    # image rays are smooth), fall back to the exact XLA scatter. Small
    # textures (res < 128) cannot form legal lane-tiled window slices and
    # are cheap for the scatter anyway.
    m_u = jnp.max(jnp.where(onf, u0_flat[:, None, :], -1), axis=2)
    m_v = jnp.max(jnp.where(onf, v0_flat[:, None, :], -1), axis=2)
    fits = (jnp.all(m_u - o_u < win_sz - 1)
            & jnp.all(m_v - o_v < win_sz - 1))

    dz = jnp.zeros((6 * 3, res, res), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, 6),
        in_specs=[
            pl.BlockSpec((1, 8, _PIX // 8), lambda t, f, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),       # u0
            pl.BlockSpec((1, 8, _PIX // 8), lambda t, f, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),       # v0
            pl.BlockSpec((1, 8, _PIX // 8), lambda t, f, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),       # fu
            pl.BlockSpec((1, 8, _PIX // 8), lambda t, f, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),       # fv
            pl.BlockSpec((1, 8, _PIX // 8), lambda t, f, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),       # face
            pl.BlockSpec((1, 3, 8, _PIX // 8),
                         lambda t, f, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),       # g
            pl.BlockSpec(memory_space=pltpu.HBM),        # dz (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((3, win_sz, win_sz), jnp.float32),  # window
            pltpu.VMEM((3, win_sz, win_sz), jnp.float32),  # rmw tmp
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    def windowed(_):
        return pl.pallas_call(
            functools.partial(_splat_kernel, res=res, win_sz=win_sz),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((6 * 3, res, res), jnp.float32),
            input_output_aliases={9: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(o_u.reshape(-1), o_v.reshape(-1), flags.reshape(-1),
          u0_t, v0_t, fu_t, fv_t, face_t, g_t, dz)

    def fallback(_):
        cell = (face * res + v0) * res + u0
        acc = jnp.zeros((6 * res * res, 3), jnp.float32)
        wu1 = fu[:, None]
        wv1 = fv[:, None]
        acc = acc.at[cell].add(g * (1 - wv1) * (1 - wu1))
        acc = acc.at[cell + 1].add(g * (1 - wv1) * wu1)
        acc = acc.at[cell + res].add(g * wv1 * (1 - wu1))
        acc = acc.at[cell + res + 1].add(g * wv1 * wu1)
        return acc.reshape(6, res, res, 3).transpose(0, 3, 1, 2).reshape(
            6 * 3, res, res)

    # res < 128 cannot form legal lane-tiled window slices (and is cheap
    # for the scatter anyway) — do not even compile the kernel branch
    if res < 128 or res % 128 != 0:
        return fallback(None)
    return jax.lax.cond(fits, windowed, fallback, None)


# ---------------------------------------------------------------------------
# custom-VJP sampler
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sample_splat_vjp(base, dirs, interpret=False):
    """`sample` with the Pallas window-splat backward. Gradient flows to
    `base` only — view directions are constants in the trainer (sky rays
    come from the batch, base.py:491)."""
    return sample(base, dirs)


def _fwd(base, dirs, interpret):
    return sample(base, dirs), (base.shape, dirs)


def _bwd(interpret, res_data, gout):
    (shape, dirs) = res_data
    res = shape[1]
    d = dirs * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-18))
    face, u, v = faces_uv(d)
    u0, v0, fu, fv = _corner_coords(u, v, res)

    # group pixels into 32x32 SPATIAL image tiles (smooth rays -> compact
    # cube windows); row-major 1024-runs would span the full image width.
    # Non-image-shaped direction sets fall back to run grouping, where the
    # span check routes to the XLA scatter.
    if dirs.ndim == 3:
        h, w = dirs.shape[:2]
        ph, pw = (-h) % TILE, (-w) % TILE
        ty, tx = (h + ph) // TILE, (w + pw) // TILE

        def spatial(x, fill):
            x = jnp.pad(x, ((0, ph), (0, pw)), constant_values=fill)
            return x.reshape(ty, TILE, tx, TILE).transpose(0, 2, 1, 3) \
                .reshape(ty * tx * _PIX)

        def spatial3(x):
            x = jnp.pad(x, ((0, ph), (0, pw), (0, 0)))
            return x.reshape(ty, TILE, tx, TILE, 3).transpose(
                0, 2, 1, 3, 4).reshape(ty * tx * _PIX, 3)

        # padded pixels get face -1: they match no window and scatter 0
        args = (spatial(face, -1), spatial(u0, 0), spatial(v0, 0),
                spatial(fu.astype(jnp.float32), 0.0),
                spatial(fv.astype(jnp.float32), 0.0), spatial3(gout))
    else:
        npix = int(np.prod(face.shape))
        pad = (-npix) % _PIX
        flat = lambda x, f: jnp.pad(x.reshape(-1), (0, pad),
                                    constant_values=f)
        args = (flat(face, -1), flat(u0, 0), flat(v0, 0),
                flat(fu.astype(jnp.float32), 0.0),
                flat(fv.astype(jnp.float32), 0.0),
                jnp.pad(gout.reshape(-1, 3), ((0, pad), (0, 0))))
    dz = splat_grad(*args, res, interpret=interpret)
    dbase = dz.reshape(6, 3, res, res).transpose(0, 2, 3, 1)
    return dbase, jnp.zeros_like(dirs)


sample_splat_vjp.defvjp(_fwd, _bwd)
