"""Honest kernel-only profile at the TRAINING operating point.

Extracts the real sorted feature buffer (low init opacity 0.1, the synthetic
batch camera) and times rasterize_fwd / rasterize_bwd in-program. Round-2
finding: early termination almost never fires at training opacities, so the
kernel cost here — not the high-opacity bench — is what the trainer pays.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_loop(make_body, iters=8, trials=3):
    """Marginal per-iteration time: runs the loop at `iters` and `2*iters`
    trip counts and divides the difference — the tunnel charges a fixed
    ~24 ms per program execution (ROADMAP finding #2), which this cancels.
    make_body(i) must return a scalar depending on i (no hoisting/CSE)."""

    def build(n):
        @jax.jit
        def loop():
            def body(i, acc):
                return acc + make_body(i)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return loop

    lo, hi = build(iters), build(2 * iters)
    jax.block_until_ready((lo(), hi()))
    best_lo = best_hi = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(lo())
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(hi())
        best_hi = min(best_hi, time.perf_counter() - t0)
    return max(best_hi - best_lo, 1e-9) / iters


def main():
    from bilateral_driving_tpu.core import gaussians as G
    from bilateral_driving_tpu.data import synthetic
    from bilateral_driving_tpu.ops import binning, pipeline
    from bilateral_driving_tpu.ops import rasterize_pallas as rp

    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
    del junk

    W, H = 544, 320
    n = 400_000
    cap = 2 ** 20
    key = jax.random.key(0)
    scene = synthetic.make_scene(key, num_bg=256, num_frames=8, width=W,
                                 height=H)
    kb = jax.random.split(key, 5)
    means = jnp.concatenate([
        jax.random.uniform(kb[0], (n, 2), minval=-2.0, maxval=2.0),
        jax.random.uniform(kb[1], (n, 1), minval=1.5, maxval=40.0)], axis=1)
    log_scales = jax.random.uniform(kb[2], (n, 3), minval=-5.5, maxval=-3.0)
    quats = G.random_quats(kb[3], n)
    colors = jax.random.uniform(kb[4], (n, 3))
    opac = jnp.full((n,), 0.1)
    batch = synthetic.make_batch(scene, 1, jnp.zeros((H, W, 3)))
    c2w = batch["camera_to_world"]
    K = batch["intrinsics"]
    R, tr = c2w[:3, :3], c2w[:3, 3]
    view = jnp.eye(4).at[:3, :3].set(R.T).at[:3, 3].set(-R.T @ tr)
    cfg = pipeline.RasterizeConfig(isect_capacity=cap, near_plane=0.1)

    # run the pipeline once to get the REAL sorted feats/starts/counts
    from bilateral_driving_tpu.ops.projection import project

    @jax.jit
    def prep(means):
        proj = project(means, quats, jnp.exp(log_scales), view, K, W, H,
                       near_plane=0.1)
        sg = jax.lax.stop_gradient
        ntx, nty = binning.num_tiles(W, H)
        sp = binning.spans(proj.means2d, proj.radii, proj.valid, W, H)
        exp = binning.expand(sp.counts, cap)
        logop = jnp.log(jnp.maximum(
            opac * proj.compensations * proj.valid.astype(jnp.float32),
            1e-12))
        table = jnp.concatenate([
            sp.tx0.astype(jnp.float32)[:, None],
            sp.ty0.astype(jnp.float32)[:, None],
            sp.span_w.astype(jnp.float32)[:, None],
            exp.offsets[:-1].astype(jnp.float32)[:, None],
            proj.means2d, proj.conics, logop[:, None], colors,
            proj.depths[:, None]], axis=1)
        dummy = jnp.zeros((1, table.shape[1])).at[0, 9].set(-30.0)
        table = jnp.concatenate([table, dummy])
        (key_s, gid_s, feats_s), _ = pipeline._expand_sort_do(
            table, exp, ntx, ntx * nty)
        tile_s = binning.tiles_of_keys(key_s, ntx * nty)
        starts, counts = binning.tile_ranges(tile_s, exp.num_isects,
                                             ntx * nty, cap)
        feats16 = jnp.concatenate(
            [feats_s, jnp.zeros((rp.FEAT - feats_s.shape[0], cap))], axis=0)
        return feats16, starts, counts, exp.num_isects

    feats16, starts, counts, num = jax.block_until_ready(prep(means))
    print(f"num_isects={int(num)}  live_chunks~{int(num) // 128}",
          flush=True)

    def kfwd(i):
        img, tc, side, nl = rp.rasterize_fwd(
            feats16.at[0].add(i * 1e-6), starts, counts, W, H)
        return jnp.sum(img)

    dt = time_loop(kfwd)
    print(f"kernel fwd:      {dt * 1e3:8.2f} ms", flush=True)

    def kboth(i):
        ft = feats16.at[0].add(i * 1e-6)
        img, tc, side, nl = rp.rasterize_fwd(ft, starts, counts, W, H)
        g = jnp.ones_like(img)
        d = rp.rasterize_bwd(ft, starts, counts, nl, tc, side, g, W, H)
        return jnp.sum(img) + jnp.sum(d)

    dt2 = time_loop(kboth)
    print(f"kernel fwd+bwd:  {dt2 * 1e3:8.2f} ms  (bwd ~{(dt2 - dt) * 1e3:.2f})",
          flush=True)


if __name__ == "__main__":
    main()
