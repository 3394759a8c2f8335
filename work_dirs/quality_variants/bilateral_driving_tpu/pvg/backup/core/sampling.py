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
    dirs = dirs * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-16))
    # uniform in volume: r ~ (u * (rmax^3 - rmin^3) + rmin^3)^(1/3)
    u = jax.random.uniform(k_r, (n, 1))
    r = (u * (radius_max ** 3 - radius_min ** 3) + radius_min ** 3) ** (1.0 / 3.0)
    return dirs * r


def knn_mean_distance(points: jax.Array, k: int = 3, chunk: int = 1024,
                      ref_block: int = 4096,
                      max_reference: int = 100_000) -> jax.Array:
    """Mean distance to the k nearest neighbors of each point.

    Replaces sklearn `k_nearest_sklearn` (reference: basics.py:208-224) used
    for scale initialization. Streaming blocked top-k: query chunks against
    reference blocks with a running k-best merge. Never calls `top_k` over
    more than `ref_block + k + 1` lanes — `lax.top_k` across a 10^5-wide
    dimension hard-crashes the TPU worker ("kernel fault"). Above
    `max_reference` points the neighbor reference set is a uniform subsample
    (scale init only needs the local density scale).
    """
    n = points.shape[0]
    if n > max_reference:
        stride = -(-n // max_reference)
        ref = points[::stride]
    else:
        ref = points
    r = ref.shape[0]
    rpad = (-r) % ref_block
    ref_p = jnp.pad(ref, ((0, rpad), (0, 0)), constant_values=jnp.inf)
    ref_blocks = ref_p.reshape(-1, ref_block, 3)
    sq_blocks = jnp.where(
        jnp.isfinite(ref_blocks).all(-1),
        jnp.sum(ref_blocks * ref_blocks, axis=-1), jnp.inf)

    pad = (-n) % chunk
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))

    def query_chunk(q):
        qsq = jnp.sum(q * q, axis=-1, keepdims=True)

        def merge(best, rb):
            rpts, rsq = rb
            d2 = qsq - 2.0 * q @ jnp.where(jnp.isfinite(rpts), rpts, 0.0).T \
                + rsq[None, :]
            cand, _ = jax.lax.top_k(-d2, k + 1)
            best, _ = jax.lax.top_k(
                jnp.concatenate([best, cand], axis=1), k + 1)
            return best, None

        best0 = jnp.full((q.shape[0], k + 1), -jnp.inf)
        best, _ = jax.lax.scan(merge, best0, (ref_blocks, sq_blocks))
        # k+1 smallest (self-distance possibly included), drop the closest
        d = jnp.sqrt(jnp.maximum(-best[:, 1:], 0.0))
        return jnp.mean(d, axis=-1)

    out = jax.lax.map(query_chunk, pts_pad.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]
