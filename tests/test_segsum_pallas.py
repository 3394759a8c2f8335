"""Pallas ragged segment-sum (ops/segsum_pallas.py): the masked-matmul
reduce must match a dense numpy reference over ragged segment layouts, and
the pipeline backward that uses it must keep its gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilateral_driving_tpu.ops import segsum_pallas as sp


def _ref(data, offsets):
    n = len(offsets) - 1
    return np.stack([data[:, offsets[g]:offsets[g + 1]].sum(1)
                     for g in range(n)], 1)


@pytest.mark.parametrize("n,cap,maxc", [
    (300, 4096, 7),      # typical: ~2.6 entries per gaussian
    (513, 8192, 3),      # block boundary straddles (G_BLK=512)
    (1, 512, 400),       # single gaussian
    (1025, 2048, 2),     # more gaussians than entries; many empties
])
def test_matches_dense_reference(n, cap, maxc):
    rng = np.random.RandomState(n)
    counts = rng.randint(0, maxc + 1, n)
    offsets = np.minimum(np.concatenate([[0], np.cumsum(counts)]),
                         cap).astype(np.int32)
    data = rng.randn(16, cap).astype(np.float32)
    out = sp.segment_sum(jnp.asarray(data), jnp.asarray(offsets),
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(data, offsets),
                               atol=1e-4)


@pytest.mark.parametrize("n,cap,maxc,row0", [
    (300, 4096, 7, 4),       # d_table placement (FEAT0=4)
    (513, 8192, 3, 0),       # block boundary straddles (G_BLK=512)
    (1025, 2048, 2, 6),      # many empties, max row offset for 10 rows
])
def test_split_rows_matches_dense_reference(n, cap, maxc, row0):
    """segment_sum_rows consumes R separate 1-D arrays (the lax.sort
    outputs) and must place per-segment sums at rows row0..row0+R with
    zeros elsewhere."""
    rng = np.random.RandomState(n)
    counts = rng.randint(0, maxc + 1, n)
    offsets = np.minimum(np.concatenate([[0], np.cumsum(counts)]),
                         cap).astype(np.int32)
    nr = 10
    data = rng.randn(nr, cap).astype(np.float32)
    rows = tuple(jnp.asarray(data[j]) for j in range(nr))
    out = np.asarray(sp.segment_sum_rows(rows, jnp.asarray(offsets),
                                         row0=row0, interpret=True))
    ref = _ref(data, offsets)
    np.testing.assert_allclose(out[row0:row0 + nr], ref, atol=1e-4)
    assert np.all(out[:row0] == 0.0)
    assert np.all(out[row0 + nr:] == 0.0)


def test_huge_segment_spans_many_tiles():
    """One gaussian whose window covers many TILE_L tiles (the dynamic
    fori_loop path), mixed with empty and tiny segments."""
    rng = np.random.RandomState(1)
    offsets = np.array([0, 0, 3000, 3001, 3001, 4096], np.int32)
    data = rng.randn(16, 4096).astype(np.float32)
    out = sp.segment_sum(jnp.asarray(data), jnp.asarray(offsets),
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(data, offsets),
                               rtol=1e-5, atol=1e-4)


def test_limb_precision_vs_highest():
    """3-limb bf16 decomposition must agree with a float64 reference to
    f32-level accuracy even with adversarial magnitudes."""
    rng = np.random.RandomState(2)
    data = (rng.randn(16, 1024) * 10.0 ** rng.randint(-4, 4, (16, 1024))
            ).astype(np.float32)
    counts = rng.randint(0, 9, 200)
    offsets = np.minimum(np.concatenate([[0], np.cumsum(counts)]),
                         1024).astype(np.int32)
    out = np.asarray(sp.segment_sum(jnp.asarray(data),
                                    jnp.asarray(offsets), interpret=True))
    ref64 = _ref(data.astype(np.float64), offsets)
    denom = np.maximum(np.abs(ref64), 1e-3)
    # 3 bf16 limbs carry ~24 mantissa bits; with 10^+-4 adversarial
    # magnitude spread the worst segment lands at ~1.3e-5 relative —
    # f32-summation-equivalent for gradient accumulation
    assert (np.abs(out - ref64) / denom).max() < 3e-5


def test_pipeline_bwd_uses_kernel_and_matches_xla(monkeypatch):
    """The pipeline backward's per-Gaussian gradient sums must be identical
    (to f32 reordering noise) between the Pallas reduce and the round-3
    XLA cumsum+gather path."""
    from bilateral_driving_tpu.core import gaussians as G
    from bilateral_driving_tpu.ops import pipeline

    key = jax.random.key(0)
    n = 400
    ks = jax.random.split(key, 6)
    means = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-1.0, maxval=1.0),
        jax.random.uniform(ks[1], (n, 1), minval=2.0, maxval=8.0)], axis=1)
    quats = G.random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-4.0,
                                        maxval=-2.5))
    opac = jax.random.uniform(ks[4], (n,), minval=0.4, maxval=0.9)
    colors = jax.random.uniform(ks[5], (n, 3))
    W, H = 80, 56
    K = jnp.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1.0]])
    view = jnp.eye(4)
    cfg = pipeline.RasterizeConfig(isect_capacity=4096, interpret=True)

    def loss(m):
        out = pipeline.rasterize(m, quats, scales, opac, colors, view, K,
                                 W, H, cfg)
        return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["alpha"])

    g_kernel = jax.grad(loss)(means)

    monkeypatch.setattr(sp, "_MODE", "xla")
    g_xla = jax.grad(loss)(means)
    a = np.asarray(g_kernel, np.float64)
    b = np.asarray(g_xla, np.float64)
    assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12) < 1e-5
