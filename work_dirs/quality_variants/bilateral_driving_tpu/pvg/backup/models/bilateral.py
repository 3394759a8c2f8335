"""Bilateral-grid appearance transforms — the paper's core contribution.

Functional JAX re-design of the reference's bilateral subsystem:
  * `BilateralGrid` semantics (project/bilateral/lib_bilagrid.py:256-368):
    per-image grids of 3x4 color affines, shape (N, 12, L, H, W), identity
    init, sliced trilinearly at (x, y, gray(rgb)) with torch
    `F.grid_sample(align_corners=True, padding_mode="border")` semantics.
  * multi-scale pyramid (project/models/modules.py:422-593): per-level
    downsampled guidance, low-res affine maps bilinearly upsampled and
    composed sequentially on the rendered RGB
    (project/models/trainers/scene_graph.py:112-117).
  * TV loss (lib_bilagrid.py:152-168), per-level weight 0.5*sqrt(X*Y*W)
    (modules.py:445), cycle-consistency `inverse_loss` (modules.py:474-492),
    test-time neighbor-train-frame averaging (modules.py:523-547).
  * `color_correct` eval-time least-squares matching (lib_bilagrid.py:56-122).

TPU-native slicing: the shipped grids are tiny (2x2x1 .. 8x8x4 cells), so the
trilinear slice is expressed as a dense interpolation-weights matrix times the
flattened grid — one (npix, cells) @ (cells, 12) MXU matmul instead of 8
serial gathers; big grids (single-scale 16x16x8 variant) fall back to
row-gathers. Both are exact `grid_sample` matches and autodiff cleanly.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# numpy, not jnp: a module-level device array initializes the XLA backend
# at import, forbidding a later jax.distributed.initialize()
RGB2GRAY = np.array([0.299, 0.587, 0.114], np.float32)  # BT601, lib_bilagrid.py:297

ONE_HOT_MAX_CELLS = 1024  # slice via dense weights matmul up to this size


def init_grid(num_images: int, grid_x: int, grid_y: int, grid_w: int,
              dtype=jnp.float32) -> jax.Array:
    """(N, 12, L, H, W) identity-affine grids (lib_bilagrid.py:291-311)."""
    ident = jnp.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], dtype)
    return jnp.broadcast_to(
        ident[None, :, None, None, None],
        (num_images, 12, grid_w, grid_y, grid_x),
    ).astype(dtype)


def rgb_to_gray(rgb: jax.Array) -> jax.Array:
    """Guidance in [-1, 1] for rgb in [0, 1] (lib_bilagrid.py:296-299)."""
    return (rgb @ RGB2GRAY) * 2.0 - 1.0


def _sample_coords(coord: jax.Array, size: int):
    """align_corners=True + border padding: [-1,1] -> pixel index + lerp w."""
    pix = jnp.clip((coord + 1.0) * 0.5 * (size - 1), 0.0, size - 1)
    i0 = jnp.clip(jnp.floor(pix), 0, max(size - 2, 0)).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, size - 1)
    w = pix - i0.astype(coord.dtype)
    return i0, i1, w


def grid_sample_3d(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """Trilinear sample of vol (C, D, H, W) at coords (..., 3) = (x, y, z) in
    [-1, 1]; x indexes W, y indexes H, z indexes D — exactly torch
    `F.grid_sample(..., mode='bilinear', align_corners=True,
    padding_mode='border')` on 5-D input. Returns (..., C)."""
    C, D, H, W = vol.shape
    batch_shape = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    x0, x1, wx = _sample_coords(c[:, 0], W)
    y0, y1, wy = _sample_coords(c[:, 1], H)
    z0, z1, wz = _sample_coords(c[:, 2], D)

    cells = D * H * W
    flat = vol.reshape(C, cells).T                    # (cells, C)

    def corner_idx(zi, yi, xi):
        return (zi * H + yi) * W + xi

    corners = [
        (corner_idx(z0, y0, x0), (1 - wz) * (1 - wy) * (1 - wx)),
        (corner_idx(z0, y0, x1), (1 - wz) * (1 - wy) * wx),
        (corner_idx(z0, y1, x0), (1 - wz) * wy * (1 - wx)),
        (corner_idx(z0, y1, x1), (1 - wz) * wy * wx),
        (corner_idx(z1, y0, x0), wz * (1 - wy) * (1 - wx)),
        (corner_idx(z1, y0, x1), wz * (1 - wy) * wx),
        (corner_idx(z1, y1, x0), wz * wy * (1 - wx)),
        (corner_idx(z1, y1, x1), wz * wy * wx),
    ]
    if cells <= ONE_HOT_MAX_CELLS:
        # dense interpolation-weights matrix -> one MXU matmul
        weights = sum(
            jax.nn.one_hot(idx, cells, dtype=vol.dtype) * w[:, None]
            for idx, w in corners
        )
        out = weights @ flat                          # (npix, C)
    else:
        out = sum(flat[idx] * w[:, None] for idx, w in corners)
    return out.reshape(*batch_shape, C)


def slice_affines(grid: jax.Array, xy: jax.Array, rgb: jax.Array) -> jax.Array:
    """Slice one image's grid (12, L, H, W) at pixel coords xy in [0,1] and
    guidance gray(rgb): returns (..., 3, 4) affines (lib_bilagrid `slice`)."""
    coords = jnp.concatenate(
        [xy * 2.0 - 1.0, rgb_to_gray(rgb)[..., None]], axis=-1)
    mats = grid_sample_3d(grid, coords)
    return mats.reshape(*mats.shape[:-1], 3, 4)


def apply_affine(mats: jax.Array, rgb: jax.Array) -> jax.Array:
    """color_affine_transform (lib_bilagrid.py:135-145)."""
    return jnp.einsum("...ij,...j->...i", mats[..., :3], rgb) + mats[..., 3]


def total_variation_loss(grids: jax.Array) -> jax.Array:
    """Mean-squared neighbor difference per spatial dim
    (lib_bilagrid.py:148-168): grids (B, C, ...)."""
    b = grids.shape[0]
    tv = 0.0
    for axis in range(2, grids.ndim):
        n = grids.shape[axis]
        if n < 2:
            continue
        d = jnp.diff(grids, axis=axis)
        count = d[0].size
        tv = tv + jnp.sum(d * d) / count
    return tv / b


def uv_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """(h, w, 2) pixel-center xy in [0, 1] via linspace, matching
    modules.py:315-320 / 500-507 (torch.linspace(0, 1, H))."""
    ys = jnp.linspace(0.0, 1.0, h, dtype=dtype)
    xs = jnp.linspace(0.0, 1.0, w, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def resize_bilinear(img: jax.Array, h: int, w: int) -> jax.Array:
    """F.interpolate(mode='bilinear', align_corners=False) equivalent for
    (..., H, W, C)."""
    return jax.image.resize(img, (*img.shape[:-3], h, w, img.shape[-1]),
                            method="linear")


# --------------------------------------------------------------------------
# single-scale bilateral affine (reference BilateralAffineTransform)
# --------------------------------------------------------------------------


def init_bilateral(key, num_images: int, grid_x=16, grid_y=16, grid_w=8):
    del key
    return {"grids": init_grid(num_images, grid_x, grid_y, grid_w)}


def bilateral_affines(params, rgb: jax.Array, img_idx,
                      neighbor_idx: jax.Array | None = None) -> jax.Array:
    """Per-pixel (H, W, 3, 4) affines for one image. At test time the
    reference averages affines sliced from neighboring train images
    (modules.py:336-346): pass `neighbor_idx` (K,) to do that."""
    h, w, _ = rgb.shape
    xy = uv_grid(h, w, rgb.dtype)
    if neighbor_idx is None:
        return slice_affines(params["grids"][img_idx], xy, rgb)
    mats = jax.vmap(lambda i: slice_affines(params["grids"][i], xy, rgb))(
        neighbor_idx)
    return jnp.mean(mats, axis=0)


def bilateral_tv_loss(params) -> jax.Array:
    return total_variation_loss(params["grids"])


# --------------------------------------------------------------------------
# multi-scale bilateral affine (reference MultiScaleBilateralAffineTransform)
# --------------------------------------------------------------------------

DEFAULT_MS_GRID = ((2, 2, 1), (4, 4, 2), (8, 8, 4))  # omnire_ms_bilateral.yaml:249
DEFAULT_GUIDANCE_FACTOR = (4, 4, 2)                   # modules.py:505


def init_multiscale(key, num_images: int,
                    grid_sizes: Sequence[Sequence[int]] = DEFAULT_MS_GRID):
    del key
    return {
        "levels": [
            {"grids": init_grid(num_images, gx, gy, gw)}
            for gx, gy, gw in grid_sizes
        ]
    }


def multiscale_affines(params, rgb: jax.Array, img_idx,
                       guidance_factor: Sequence[int] = DEFAULT_GUIDANCE_FACTOR,
                       neighbor_idx: jax.Array | None = None) -> list:
    """Per-level full-res (H, W, 3, 4) affine maps (modules.py:505-560):
    slice each level at `factor`-downsampled guidance, then bilinearly
    upsample the affine map back to (H, W)."""
    h, w, _ = rgb.shape
    mats_list = []
    for level, factor in zip(params["levels"], guidance_factor):
        hd, wd = h // factor, w // factor
        rgb_low = resize_bilinear(rgb, hd, wd) if factor != 1 else rgb
        xy = uv_grid(hd, wd, rgb.dtype)
        if neighbor_idx is None:
            mats = slice_affines(level["grids"][img_idx], xy, rgb_low)
        else:
            mats = jnp.mean(
                jax.vmap(lambda i, g=level["grids"]: slice_affines(
                    g[i], xy, rgb_low))(neighbor_idx),
                axis=0,
            )
        if (hd, wd) != (h, w):
            flat = mats.reshape(hd, wd, 12)
            mats = resize_bilinear(flat, h, w).reshape(h, w, 3, 4)
        mats_list.append(mats)
    return mats_list


def compose_affines(mats_list, rgb: jax.Array) -> jax.Array:
    """Sequential application (scene_graph.py:112-117)."""
    out = rgb
    for mats in mats_list:
        out = apply_affine(mats, out)
    return out


def multiscale_tv_loss(params, grid_sizes=DEFAULT_MS_GRID) -> jax.Array:
    """Per-level TV with weight 0.5*sqrt(X*Y*W) (modules.py:445,470-473)."""
    loss = 0.0
    for level, (gx, gy, gw) in zip(params["levels"], grid_sizes):
        loss = loss + total_variation_loss(level["grids"]) * (
            0.5 * (gx * gy * gw) ** 0.5)
    return loss


def inverse_loss(mats_list, gt_rgb: jax.Array, pre_affine_rgb: jax.Array):
    """Cycle consistency (modules.py:474-492): invert the composed
    homogeneous affine, apply to GT, L1 against the pre-affine render."""
    h, w = gt_rgb.shape[:2]
    mat = jnp.broadcast_to(jnp.eye(4, dtype=gt_rgb.dtype), (h, w, 4, 4))
    for mats in mats_list:
        hom = jnp.zeros((h, w, 4, 4), gt_rgb.dtype)
        hom = hom.at[..., :3, :].set(mats)
        hom = hom.at[..., 3, 3].set(1.0)
        mat = hom @ mat
    inv = jnp.linalg.inv(mat.reshape(-1, 4, 4)).reshape(h, w, 4, 4)
    inv_aff = inv[..., :3, :]
    gt_t = apply_affine(inv_aff, gt_rgb)
    return jnp.mean(jnp.abs(gt_t - pre_affine_rgb))


# --------------------------------------------------------------------------
# neural bilateral grids (reference NeuralBilateralGrid + MLP head)
# --------------------------------------------------------------------------


def init_neural_bilateral(key, num_images: int, grid_x: int, grid_y: int,
                          grid_w: int, feature_dim: int, hidden_dim: int):
    """Feature grids (zero-init, lib_bilagrid.py:370-461) + shared MLP head
    mapping sliced features -> 3x4 affine (modules.py:615-621)."""
    from . import encoders

    return {
        "grids": jnp.zeros((num_images, feature_dim, grid_w, grid_y, grid_x)),
        "head": encoders.mlp_init(key, feature_dim, 12, 2, hidden_dim,
                                  zero_init_last=True),
    }


def neural_bilateral_affines(params, rgb: jax.Array, img_idx,
                             neighbor_idx: jax.Array | None = None):
    """(H, W, 3, 4) affines from sliced features through the MLP head; the
    trainer applies these *residually* (scene_graph.py:99-106)."""
    from . import encoders

    h, w, _ = rgb.shape
    xy = uv_grid(h, w, rgb.dtype)
    coords = jnp.concatenate(
        [xy * 2.0 - 1.0, rgb_to_gray(rgb)[..., None]], axis=-1)
    if neighbor_idx is None:
        feats = grid_sample_3d(params["grids"][img_idx], coords)
    else:
        feats = jnp.mean(
            jax.vmap(lambda i: grid_sample_3d(params["grids"][i], coords))(
                neighbor_idx),
            axis=0,
        )
    mats = encoders.mlp_apply(params["head"], feats)
    return mats.reshape(h, w, 3, 4)


def init_multiscale_neural(key, num_images: int,
                           grid_sizes: Sequence[Sequence[int]] = DEFAULT_MS_GRID,
                           feature_dim: int = 8, hidden_dim: int = 64):
    """MultiScaleNeuralBilateralAffineTransform (modules.py:690-820): a
    feature-grid pyramid with one shared zero-init MLP head per level."""
    from . import encoders

    keys = jax.random.split(key, len(grid_sizes))
    return {
        "levels": [
            {
                "grids": jnp.zeros((num_images, feature_dim, gw, gy, gx)),
                "head": encoders.mlp_init(k, feature_dim, 12, 2, hidden_dim,
                                          zero_init_last=True),
            }
            for k, (gx, gy, gw) in zip(keys, grid_sizes)
        ]
    }


def multiscale_neural_affines(params, rgb: jax.Array, img_idx,
                              guidance_factor=DEFAULT_GUIDANCE_FACTOR,
                              neighbor_idx=None) -> jax.Array:
    """Summed per-level affines from sliced features through each level's
    head; applied residually by the trainer (scene_graph.py:99-106)."""
    from . import encoders

    h, w, _ = rgb.shape
    total = jnp.zeros((h, w, 3, 4), rgb.dtype)
    for level, factor in zip(params["levels"], guidance_factor):
        hd, wd = h // factor, w // factor
        rgb_low = resize_bilinear(rgb, hd, wd) if factor != 1 else rgb
        xy = uv_grid(hd, wd, rgb.dtype)
        coords = jnp.concatenate(
            [xy * 2.0 - 1.0, rgb_to_gray(rgb_low)[..., None]], axis=-1)
        if neighbor_idx is None:
            feats = grid_sample_3d(level["grids"][img_idx], coords)
        else:
            feats = jnp.mean(jax.vmap(
                lambda i, g=level["grids"]: grid_sample_3d(g[i], coords))(
                    neighbor_idx), axis=0)
        mats = encoders.mlp_apply(level["head"], feats).reshape(hd, wd, 12)
        if (hd, wd) != (h, w):
            mats = resize_bilinear(mats, h, w)
        total = total + mats.reshape(h, w, 3, 4)
    return total


def multiscale_neural_tv_loss(params, grid_sizes=DEFAULT_MS_GRID):
    loss = 0.0
    for level, (gx, gy, gw) in zip(params["levels"], grid_sizes):
        loss = loss + total_variation_loss(level["grids"]) * (
            0.5 * (gx * gy * gw) ** 0.5)
    return loss


# --------------------------------------------------------------------------
# low-rank CP-decomposed 4D bilateral grid (lib_bilagrid.py:497-664)
# --------------------------------------------------------------------------


def init_cp4d(key, rank: int = 5, grid_x: int = 16, grid_y: int = 16,
              grid_z: int = 16, grid_w: int = 8, out_dim: int = 12):
    """BilateralGridCP4D: a rank-R CP factorization over (x, y, z, gray) —
    four 1-D factor banks instead of a dense 4-D grid. The reference
    initializes via tensorly parafac of an identity grid; an equivalent
    closed form: factors that sum to the identity affine at every sample
    (rank-1 identity component + noise-seeded spare ranks)."""
    ks = jax.random.split(key, 4)
    ident = jnp.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], jnp.float32)

    def factor(k, size):
        f = jnp.zeros((rank, size, out_dim))
        f = f.at[0].set(1.0)
        noise = 1e-3 * jax.random.normal(k, (rank - 1, size, out_dim))
        return f.at[1:].add(noise)

    fx = factor(ks[0], grid_x)
    fy = factor(ks[1], grid_y)
    fz = factor(ks[2], grid_z)
    fw = factor(ks[3], grid_w)
    # rank 0 carries the identity: fx0=fy0=fz0=1, fw0=ident -> product = ident
    fw = fw.at[0].set(ident[None, :])
    return {"fx": fx, "fy": fy, "fz": fz, "fw": fw}


def _lerp_1d(bank: jax.Array, coord: jax.Array) -> jax.Array:
    """bank (R, S, D) sampled at coord (...,) in [-1, 1], align-corners.
    Returns (..., R, D)."""
    s = bank.shape[1]
    pix = jnp.clip((coord + 1.0) * 0.5 * (s - 1), 0.0, s - 1)
    i0 = jnp.clip(jnp.floor(pix), 0, max(s - 2, 0)).astype(jnp.int32)
    w = (pix - i0)[..., None, None]
    lo = jnp.moveaxis(bank[:, i0], 0, -2)        # (..., R, D)
    hi = jnp.moveaxis(bank[:, jnp.clip(i0 + 1, 0, s - 1)], 0, -2)
    return lo * (1 - w) + hi * w


def cp4d_affines(params, xyz: jax.Array, rgb: jax.Array) -> jax.Array:
    """Slice the CP grid at world xyz (normalized to [-1,1]) and gray
    guidance: (..., 3, 4) affines = sum over ranks of the factor products."""
    gray = rgb_to_gray(rgb)
    vx = _lerp_1d(params["fx"], xyz[..., 0])
    vy = _lerp_1d(params["fy"], xyz[..., 1])
    vz = _lerp_1d(params["fz"], xyz[..., 2])
    vw = _lerp_1d(params["fw"], gray)
    mats = jnp.sum(vx * vy * vz * vw, axis=-2)
    return mats.reshape(*xyz.shape[:-1], 3, 4)


def cp4d_tv_loss(params):
    tv = 0.0
    for k in ("fx", "fy", "fz", "fw"):
        d = jnp.diff(params[k], axis=1)
        tv = tv + jnp.mean(d * d)
    return tv


# --------------------------------------------------------------------------
# eval-time color correction (lib_bilagrid.py:56-122)
# --------------------------------------------------------------------------


def color_correct(img: jax.Array, ref: jax.Array, num_iters: int = 5,
                  eps: float = 0.5 / 255.0) -> jax.Array:
    """Per-channel quadratic least-squares color matching of `img` to `ref`
    with iterative outlier-aware clipping, as used by the color-corrected
    eval variant (video_utils_color_correction.py:201)."""
    img_f = img.reshape(-1, 3)
    ref_f = ref.reshape(-1, 3)
    num_pix = img_f.shape[0]
    # quadratic expansion: [r, g, b, rg, rb, gb, r^2, g^2, b^2, 1]
    r, g, b = img_f[:, 0], img_f[:, 1], img_f[:, 2]
    A = jnp.stack([r, g, b, r * g, r * b, g * b, r * r, g * g, b * b,
                   jnp.ones(num_pix, img.dtype)], axis=-1)
    out = []
    for c in range(3):
        y = ref_f[:, c]
        mask = jnp.ones(num_pix, img.dtype)
        x = jnp.zeros((A.shape[1],), img.dtype)
        for _ in range(num_iters):
            Am = A * mask[:, None]
            ym = y * mask
            x = jnp.linalg.lstsq(Am, ym)[0]
            pred = A @ x
            mask = ((pred >= -eps) & (pred <= 1.0 + eps)).astype(img.dtype)
        out.append(jnp.clip(A @ x, 0.0, 1.0))
    return jnp.stack(out, axis=-1).reshape(img.shape)
