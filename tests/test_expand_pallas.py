"""Fused Pallas expansion kernel vs the XLA reference path.

The kernel (ops/expand_pallas.py) must reproduce the pre-round-3 XLA
expansion exactly: same keys, same per-entry features, same rendering and
gradients through the full pipeline. Runs in interpret mode on the CPU
mesh (conftest pins JAX_PLATFORMS=cpu)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilateral_driving_tpu.core import gaussians as G
from bilateral_driving_tpu.ops import binning, expand_pallas, pipeline


def _table(key, n, width, height, cap, zero_frac=0.0):
    """Random per-Gaussian table + offsets like rasterize builds them."""
    ks = jax.random.split(key, 8)
    ntx, nty = binning.num_tiles(width, height)
    tx0 = jax.random.randint(ks[0], (n,), 0, ntx, jnp.int32)
    ty0 = jax.random.randint(ks[1], (n,), 0, nty, jnp.int32)
    sw = jax.random.randint(ks[2], (n,), 1, 4, jnp.int32)
    sh = jax.random.randint(ks[3], (n,), 1, 4, jnp.int32)
    sw = jnp.minimum(sw, ntx - tx0)
    sh = jnp.minimum(sh, nty - ty0)
    counts = sw * sh
    if zero_frac:
        dead = jax.random.uniform(ks[4], (n,)) < zero_frac
        counts = jnp.where(dead, 0, counts)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts).astype(jnp.int32)])
    num_isects = offsets[-1]
    offsets = jnp.minimum(offsets, cap)
    feats = jax.random.normal(ks[5], (10, n))
    depths = jax.random.uniform(ks[6], (n,), minval=0.5, maxval=50.0)
    feats = feats.at[9].set(depths)
    table_T = jnp.concatenate([
        jnp.stack([tx0.astype(jnp.float32), ty0.astype(jnp.float32),
                   sw.astype(jnp.float32),
                   offsets[:-1].astype(jnp.float32)]),
        feats,
        jnp.stack([jnp.arange(n, dtype=jnp.float32),
                   jnp.zeros((n,), jnp.float32)]),
    ], axis=0)
    return table_T, offsets, num_isects, ntx, ntx * nty


@pytest.mark.parametrize("zero_frac,cap", [(0.0, 2048), (0.3, 2048),
                                           (0.0, 128)])
def test_kernel_matches_xla(zero_frac, cap):
    key = jax.random.key(0)
    table_T, offsets, ni, ntx, n_tiles = _table(key, 300, 544, 320, cap,
                                                zero_frac)
    run = functools.partial(expand_pallas.expand_gather, cap=cap, ntx=ntx,
                            n_tiles=n_tiles, n_orig=300, interpret=True)
    k1, g1, f1 = jax.jit(run)(table_T, offsets, ni)
    k2, g2, f2 = jax.jit(functools.partial(
        expand_pallas.expand_gather_xla, cap=cap, ntx=ntx, n_tiles=n_tiles,
        n_orig=300))(expand_pallas.pad_table(
            table_T, expand_pallas._block_lw(cap)[1]), offsets, ni)
    m = int(min(ni, cap))
    np.testing.assert_array_equal(np.asarray(k1)[:m], np.asarray(k2)[:m])
    np.testing.assert_array_equal(np.asarray(g1)[:m], np.asarray(g2)[:m])
    np.testing.assert_array_equal(np.asarray(f1)[:, :m],
                                  np.asarray(f2)[:, :m])
    # invalid tail: sentinel key everywhere
    np.testing.assert_array_equal(np.asarray(k1)[m:],
                                  np.full(cap - m, expand_pallas.INT_MAX))


def test_sparse_table_falls_back():
    """95% dead rows violate the window contract -> XLA fallback, same
    results."""
    key = jax.random.key(1)
    cap = 2048
    table_T, offsets, ni, ntx, n_tiles = _table(key, 4000, 544, 320, cap,
                                                zero_frac=0.95)
    block, lw = expand_pallas._block_lw(cap)
    tab = expand_pallas.pad_table(table_T, lw)
    edges = expand_pallas.chunk_edges(offsets, cap, tab.shape[1], lw)
    assert bool(expand_pallas.window_violation(edges, ni, block, lw))
    run = functools.partial(expand_pallas.expand_gather, cap=cap, ntx=ntx,
                            n_tiles=n_tiles, n_orig=4000, interpret=True)
    k1, g1, f1 = jax.jit(run)(table_T, offsets, ni)
    k2, g2, f2 = expand_pallas.expand_gather_xla(tab, offsets, ni, cap, ntx,
                                                 n_tiles, 4000)
    m = int(min(ni, cap))
    np.testing.assert_array_equal(np.asarray(k1)[:m], np.asarray(k2)[:m])
    np.testing.assert_array_equal(np.asarray(f1)[:, :m],
                                  np.asarray(f2)[:, :m])


def _scene(key, n=200, w=96, h=64):
    ks = jax.random.split(key, 6)
    means = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-1.5, maxval=1.5),
        jax.random.uniform(ks[1], (n, 1), minval=2.0, maxval=20.0)], axis=1)
    quats = G.random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-4.0,
                                        maxval=-2.0))
    opac = jax.random.uniform(ks[4], (n,), minval=0.3, maxval=0.9)
    colors = jax.random.uniform(ks[5], (n, 3))
    f = 0.9 * w
    K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    return means, quats, scales, opac, colors, jnp.eye(4), K


def test_pipeline_parity_and_grads():
    """Full rasterize with pallas_expand on vs off: identical image; equal
    gradients up to f32 summation order (the pallas path's VJP segment-sums
    in gid-sort order, the XLA path in expansion order — same math,
    different reduction order)."""
    key = jax.random.key(2)
    means, quats, scales, opac, colors, view, K = _scene(key)
    w, h = 96, 64
    cfgs = {
        on: pipeline.RasterizeConfig(isect_capacity=2048, interpret=True,
                                     pallas_expand=on)
        for on in (True, False)
    }

    def loss(means, colors, on):
        out = pipeline.rasterize(means, quats, scales, opac, colors, view,
                                 K, w, h, cfgs[on])
        return (jnp.sum(out["rgb"] ** 2) + jnp.sum(out["depth"])
                + jnp.sum(out["alpha"])), out

    (l1, o1), g1 = jax.value_and_grad(loss, argnums=(0, 1),
                                      has_aux=True)(means, colors, True)
    (l2, o2), g2 = jax.value_and_grad(loss, argnums=(0, 1),
                                      has_aux=True)(means, colors, False)
    np.testing.assert_allclose(np.asarray(o1["rgb"]), np.asarray(o2["rgb"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1["depth"]),
                               np.asarray(o2["depth"]), atol=1e-5)
    assert int(o1["info"]["num_isects"]) == int(o2["info"]["num_isects"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=2e-3)


def test_overflow_semantics():
    """num_isects > capacity: truncated, overflow flagged, no crash."""
    key = jax.random.key(3)
    means, quats, scales, opac, colors, view, K = _scene(key, n=400)
    cfg = pipeline.RasterizeConfig(isect_capacity=128, interpret=True,
                                   pallas_expand=True)
    out = pipeline.rasterize(means, quats, scales, opac, colors, view, K,
                             96, 64, cfg)
    assert bool(out["info"]["overflow"])
    assert np.isfinite(np.asarray(out["rgb"])).all()
