"""Pure-jnp reference rasterizer (test oracle, O(N·H·W)).

Implements exactly the compositing semantics of the Pallas tile rasterizer
(ops/rasterize_pallas.py) — same alpha formula, clamping, 1/255 threshold, and
per-Gaussian tile-span support cutoff — but as a dense all-pairs computation
that is obviously correct and fully autodiff'd by JAX. Used by tests/ to check
the Pallas forward and custom VJP (SURVEY.md §4 oracle strategy), standing in
for golden gsplat outputs (CUDA gsplat cannot run here).

Only viable for tiny scenes (N ≲ 5k, images ≲ 256²).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .binning import TILE

ALPHA_THRESH = 1.0 / 255.0
MAX_ALPHA = 0.999


def rasterize_reference(
    means2d: jax.Array,
    conics: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    valid: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    width: int,
    height: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (accum[H, W, C], alpha[H, W]); colors is (N, C) (rgb + depth)."""
    order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
    means2d = means2d[order]
    conics = conics[order]
    radii = radii[order]
    valid = valid[order]
    opacities = opacities[order]
    colors = colors[order]

    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
    dx = px[None] - means2d[:, 0, None, None]      # (N, H, W)
    dy = py[None] - means2d[:, 1, None, None]
    a, b, c = conics[:, 0, None, None], conics[:, 1, None, None], conics[:, 2, None, None]
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    alpha = opacities[:, None, None] * jnp.exp(-sigma)
    alpha = jnp.minimum(alpha, MAX_ALPHA)

    # tile-span support: a pixel only sees Gaussians whose binned tile span
    # covers its tile (identical cutoff to the tiled path / gsplat)
    r = radii.astype(jnp.float32)
    tx0 = jnp.floor((means2d[:, 0] - r) / TILE)
    tx1 = jnp.ceil((means2d[:, 0] + r) / TILE)
    ty0 = jnp.floor((means2d[:, 1] - r) / TILE)
    ty1 = jnp.ceil((means2d[:, 1] + r) / TILE)
    ptx = jnp.floor((px - 0.5) / TILE)             # (1, W)
    pty = jnp.floor((py - 0.5) / TILE)             # (H, 1)
    in_span = (
        (ptx[None] >= tx0[:, None, None]) & (ptx[None] < tx1[:, None, None])
        & (pty[None] >= ty0[:, None, None]) & (pty[None] < ty1[:, None, None])
    )
    live = in_span & valid[:, None, None] & (radii[:, None, None] > 0)
    alpha = jnp.where(live & (alpha >= ALPHA_THRESH), alpha, 0.0)

    trans = jnp.cumprod(1.0 - alpha, axis=0)
    trans_excl = jnp.concatenate([jnp.ones_like(trans[:1]), trans[:-1]], axis=0)
    w = alpha * trans_excl                          # (N, H, W)
    accum = jnp.einsum("nhw,nc->hwc", w, colors)
    alpha_im = jnp.sum(w, axis=0)
    return accum, alpha_im
