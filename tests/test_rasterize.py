"""Pallas tile rasterizer vs. pure-jnp oracle (BASELINE config 1: tiny scene,
forward+backward, interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilateral_driving_tpu.core import gaussians as G
from bilateral_driving_tpu.ops import binning, pipeline, projection
from bilateral_driving_tpu.ops.rasterize_ref import rasterize_reference

WIDTH, HEIGHT = 96, 64


def make_scene(key, n=300, width=WIDTH, height=HEIGHT):
    ks = jax.random.split(key, 6)
    means = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (n, 2), minval=-1.2, maxval=1.2),
            jax.random.uniform(ks[1], (n, 1), minval=2.0, maxval=8.0),
        ],
        axis=1,
    )
    quats = G.random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-3.5, maxval=-1.5))
    opac = jax.random.uniform(ks[4], (n,), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(ks[5], (n, 3))
    viewmat = jnp.eye(4)
    f = 0.8 * width
    K = jnp.array([[f, 0.0, width / 2], [0.0, f, height / 2], [0.0, 0.0, 1.0]])
    return means, quats, scales, opac, colors, viewmat, K


CFG = pipeline.RasterizeConfig(isect_capacity=2 ** 14, interpret=True)


def pallas_render(params):
    means, quats, scales, opac, colors, viewmat, K = params
    return pipeline.rasterize(means, quats, scales, opac, colors, viewmat, K,
                              WIDTH, HEIGHT, CFG)


def oracle_render(params):
    means, quats, scales, opac, colors, viewmat, K = params
    proj = projection.project(means, quats, scales, viewmat, K, WIDTH, HEIGHT)
    op_eff = opac * proj.compensations * proj.valid
    rgbd = jnp.concatenate([colors, proj.depths[:, None]], axis=1)
    ntx, nty = binning.num_tiles(WIDTH, HEIGHT)
    # composite in the same (quantized) depth order as the tiled sort key
    depth_order = binning.quantize_depth_like_sort(proj.depths, ntx * nty)
    accum, alpha = rasterize_reference(
        proj.means2d, proj.conics, depth_order, proj.radii, proj.valid,
        op_eff, rgbd, WIDTH, HEIGHT)
    return accum, alpha


class TestForwardParity:
    def test_matches_oracle(self):
        params = make_scene(jax.random.key(0))
        out = pallas_render(params)
        accum_ref, alpha_ref = oracle_render(params)
        np.testing.assert_allclose(out["rgb"], accum_ref[..., :3],
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(out["alpha"][..., 0], alpha_ref, atol=2e-4)
        depth_ref = accum_ref[..., 3] / np.clip(alpha_ref, 1e-10, None)
        np.testing.assert_allclose(out["depth"][..., 0], depth_ref,
                                   atol=1e-3, rtol=1e-4)
        # scene actually renders something
        assert float(jnp.max(out["alpha"])) > 0.5
        assert not bool(out["info"]["overflow"])

    def test_empty_scene(self):
        params = make_scene(jax.random.key(1), n=8)
        # push everything behind the camera
        means = params[0].at[:, 2].set(-5.0)
        out = pallas_render((means,) + params[1:])
        assert float(jnp.max(out["alpha"])) == 0.0
        assert float(jnp.max(jnp.abs(out["rgb"]))) == 0.0

    def test_depth_ordering(self):
        # two big gaussians dead center: near one dominates the pixel
        means = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 6.0]])
        quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
        scales = jnp.full((2, 3), 0.3)
        opac = jnp.array([0.9, 0.9])
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        viewmat = jnp.eye(4)
        f = 0.8 * WIDTH
        K = jnp.array([[f, 0, WIDTH / 2], [0, f, HEIGHT / 2], [0, 0, 1.0]])
        out = pipeline.rasterize(means, quats, scales, opac, colors, viewmat,
                                 K, WIDTH, HEIGHT, CFG)
        center = out["rgb"][HEIGHT // 2, WIDTH // 2]
        assert float(center[0]) > 0.85          # red in front
        assert float(center[1]) < 0.1


class TestBackward:
    def test_grads_match_oracle(self):
        params = make_scene(jax.random.key(2), n=200)
        target = jax.random.uniform(jax.random.key(3), (HEIGHT, WIDTH, 3))

        def loss_pallas(means, quats, scales, opac, colors):
            out = pallas_render((means, quats, scales, opac, colors,
                                 params[5], params[6]))
            return jnp.sum((out["rgb"] - target) ** 2) + jnp.sum(
                out["alpha"]) * 0.1

        def loss_oracle(means, quats, scales, opac, colors):
            accum, alpha = oracle_render((means, quats, scales, opac, colors,
                                          params[5], params[6]))
            return jnp.sum((accum[..., :3] - target) ** 2) + jnp.sum(alpha) * 0.1

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*params[:5])
        go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*params[:5])
        names = ["means", "quats", "scales", "opac", "colors"]
        for name, a, b in zip(names, gp, go):
            scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4,
                err_msg=f"gradient mismatch for {name}")

    def test_finite_difference(self):
        # spot-check d(loss)/d(means) with central differences
        params = make_scene(jax.random.key(4), n=40)

        def loss(means):
            out = pallas_render((means,) + params[1:])
            return jnp.sum(out["rgb"] ** 2)

        g = jax.grad(loss)(params[0])
        assert np.isfinite(np.asarray(g)).all()
        # directional FD (f32 loss quantization makes per-coordinate FD too
        # noisy — the oracle autodiff shows the same deviation): compare the
        # derivative along a random direction at loose tolerance.
        v = jax.random.normal(jax.random.key(0), params[0].shape)
        v = v / jnp.linalg.norm(v)
        eps = 3e-3
        fd = (loss(params[0] + eps * v) - loss(params[0] - eps * v)) / (2 * eps)
        analytic = jnp.vdot(g, v)
        np.testing.assert_allclose(analytic, fd, rtol=0.2, atol=5e-2)

    def test_absgrad_sink(self):
        params = make_scene(jax.random.key(5), n=64)
        n = params[0].shape[0]
        m_al = pipeline.isect_buffer_size(WIDTH, HEIGHT, CFG.isect_capacity)
        sink = jnp.zeros((m_al, 2))

        def loss(sink):
            means, quats, scales, opac, colors, viewmat, K = params
            out = pipeline.rasterize(means, quats, scales, opac, colors,
                                     viewmat, K, WIDTH, HEIGHT, CFG,
                                     mean2d_sink=sink)
            return jnp.sum(out["rgb"] ** 2)

        d_sink = jax.grad(loss)(sink)
        out = pallas_render(params)
        absgrad = pipeline.absgrad_from_sink(d_sink, out["info"]["gauss_ids"], n)
        assert absgrad.shape == (n, 2)
        assert np.isfinite(np.asarray(absgrad)).all()
        # visible gaussians should have nonzero accumulated |grad|
        vis = np.asarray(out["info"]["radii"]) > 0
        assert np.asarray(absgrad).sum() > 0
        assert (np.abs(np.asarray(absgrad)[~vis]).sum()) == 0


class TestBinning:
    def test_counts_consistent(self):
        params = make_scene(jax.random.key(6), n=500)
        means, quats, scales, opac, colors, viewmat, K = params
        proj = projection.project(means, quats, scales, viewmat, K, WIDTH,
                                  HEIGHT)
        isect = binning.bin_gaussians(proj.means2d, proj.radii, proj.depths,
                                      proj.valid, WIDTH, HEIGHT, 2 ** 14)
        ntx, nty = binning.num_tiles(WIDTH, HEIGHT)
        assert int(isect.tile_counts.sum()) == int(isect.num_isects)
        assert not bool(isect.overflow)
        # every real entry's gaussian actually overlaps the tile it's filed under
        gids = np.asarray(isect.gauss_ids)
        tiles = np.asarray(isect.isect_tile)
        starts = np.asarray(isect.tile_starts)
        counts = np.asarray(isect.tile_counts)
        m2d = np.asarray(proj.means2d)
        r = np.asarray(proj.radii)
        n = means.shape[0]
        for t in range(ntx * nty):
            seg = gids[starts[t]: starts[t] + counts[t]]
            assert (seg < n).all()
            tx, ty = t % ntx, t // ntx
            for gid in seg[:50]:
                assert m2d[gid, 0] + r[gid] >= tx * binning.TILE
                assert m2d[gid, 0] - r[gid] <= (tx + 1) * binning.TILE
            # depth-sorted within tile
            d = np.asarray(proj.depths)[seg]
            assert (np.diff(d) >= -1e-6).all()


def _mxu_case_grads():
    params = make_scene(jax.random.key(7), n=150)
    target = jax.random.uniform(jax.random.key(8), (HEIGHT, WIDTH, 3))

    def loss(means, opac, colors):
        out = pallas_render((means, params[1], params[2], opac, colors,
                             params[5], params[6]))
        return (jnp.sum((out["rgb"] - target) ** 2)
                + 0.1 * jnp.sum(out["alpha"]))

    return jax.value_and_grad(loss, argnums=(0, 1, 2))(
        params[0], params[3], params[4])


@pytest.fixture(scope="module")
def scan_scan_baseline():
    """Baseline gradients under the default scan/scan modes, computed ONCE
    per module — interpret-mode reruns per parametrization roughly doubled
    an already-slow test three times over (round-3 advisor)."""
    from bilateral_driving_tpu.ops import rasterize_pallas as rp
    assert rp.SUF_MODE == "scan" and rp.TRI_MODE == "scan"
    return _mxu_case_grads()


class TestMXULimbModes:
    """The backward suffix-sum and the transmittance prefix have MXU
    alternatives (rasterize_pallas.SUF_MODE / TRI_MODE = "mxuK"): the 0/1
    triangular matrix is exact in bf16, so tri @ x splits into K one-pass
    bf16 matmuls with f32 accumulation (K=3 ~ f32 accuracy). Parity vs the
    exact VPU scan must hold to float tolerance. (These run in interpret
    mode; the ON-HARDWARE bf16 semantics are verified by tools/ab_modes.py,
    which compares images and gradients against the scan/scan reference on
    the chip — round-4 A/B recorded in ROADMAP.md.)"""

    @pytest.mark.parametrize("suf,tri", [("mxu3", "scan"), ("mxu2", "scan"),
                                         ("scan", "mxu3")])
    def test_mxu_modes_match_scan(self, monkeypatch, scan_scan_baseline,
                                  suf, tri):
        from bilateral_driving_tpu.ops import rasterize_pallas as rp
        v0, g0 = scan_scan_baseline
        monkeypatch.setattr(rp, "SUF_MODE", suf)
        monkeypatch.setattr(rp, "TRI_MODE", tri)
        v1, g1 = _mxu_case_grads()
        np.testing.assert_allclose(v0, v1, rtol=1e-4)
        tol = 2e-3 if (suf == "mxu2") else 5e-4
        for a, b in zip(g0, g1):
            scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-3)
            np.testing.assert_allclose(np.asarray(b) / scale,
                                       np.asarray(a) / scale, atol=tol)


def test_grads_finite_with_behind_camera_gaussian():
    """A gaussian at camera-space z ~ 0 must not poison gradients: the
    unclamped Jacobian overflowed a*c to inf, det = inf - inf = NaN, and
    `where(det <= 0, 1, det)`'s VJP propagates NaN even at zero cotangent
    (found by a real-chip training run NaN'ing at step 1)."""
    import jax

    from bilateral_driving_tpu.ops import pipeline

    n = 50
    key = jax.random.key(11)
    means = jnp.concatenate([
        jax.random.uniform(key, (n, 2), minval=-1.0, maxval=1.0),
        jax.random.uniform(jax.random.fold_in(key, 1), (n, 1),
                           minval=2.0, maxval=6.0)], axis=1)
    # one gaussian exactly on the camera plane, one behind
    means = means.at[7, 2].set(1e-9).at[19, 2].set(-3.0)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.05)
    opac = jnp.full((n,), 0.5)
    colors = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    K = jnp.array([[70.0, 0, 40], [0, 70.0, 28], [0, 0, 1.0]])
    cfg = pipeline.RasterizeConfig(isect_capacity=2 ** 12, interpret=True)

    def loss(m, q, s, o, c):
        out = pipeline.rasterize(m, q, s, o, c, jnp.eye(4), K, 80, 56, cfg)
        return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["alpha"])

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, quats, scales, opac, colors)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g))), "non-finite gradient"
