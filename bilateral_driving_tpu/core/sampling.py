"""Point sampling helpers (reference: project/utils/geometry.py:67-81).

Used for background initialization: the reference seeds the static background
with lidar points plus `num_near_pts` / `num_far_pts` random sphere samples
(omnire_ms_bilateral.yaml:75-80, driving_dataset.py init path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_sample_sphere(key: jax.Array, n: int, radius_min: float,
                          radius_max: float) -> jax.Array:
    """Uniformly sample points in a spherical shell [radius_min, radius_max)."""
    k_dir, k_r = jax.random.split(key)
    dirs = jax.random.normal(k_dir, (n, 3))
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    # uniform in volume: r ~ (u * (rmax^3 - rmin^3) + rmin^3)^(1/3)
    u = jax.random.uniform(k_r, (n, 1))
    r = (u * (radius_max ** 3 - radius_min ** 3) + radius_min ** 3) ** (1.0 / 3.0)
    return dirs * r


def knn_mean_distance(points: jax.Array, k: int = 3,
                      chunk: int = 2048) -> jax.Array:
    """Mean distance to the k nearest neighbors of each point.

    Replaces sklearn `k_nearest_sklearn` (reference: basics.py:208-224) used
    for scale initialization. Tiled brute force: O(N^2) distances computed in
    (chunk x N) blocks so XLA keeps the working set on-chip; driving-scene
    inits are <= ~1M points which is fine as a one-time setup cost.
    """
    n = points.shape[0]
    pad = (-n) % chunk
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))
    sq = jnp.sum(points * points, axis=-1)

    def body(q):
        d2 = (
            jnp.sum(q * q, axis=-1, keepdims=True)
            - 2.0 * q @ points.T
            + sq[None, :]
        )
        # k+1 smallest (self-distance included), drop the closest (self).
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        d = jnp.sqrt(jnp.maximum(-neg_top[:, 1:], 0.0))
        return jnp.mean(d, axis=-1)

    out = jax.lax.map(body, pts_pad.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]
