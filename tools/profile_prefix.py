"""Cumulative-prefix profile of the rasterization pipeline (in-jit loops).

Times pipeline prefixes P1..P5 inside one program each (tools/
profile_stages.py method); successive differences attribute time to stages
*in their real fusion context*, which standalone stage benches cannot
(XLA fuses across stage boundaries).

Usage: python tools/profile_prefix.py [--n 400000] [--cap 20] [--iters 6]
"""
import argparse
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
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--cap", type=int, default=20)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    from bilateral_driving_tpu.core import gaussians as G
    from bilateral_driving_tpu.ops import binning, pipeline, projection

    # flip the tunnel out of its fast mode, whose block_until_ready returns
    # before execution completes (ROADMAP round-2 finding #2)
    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
    del junk

    W, H = 544, 320
    n, cap, it = args.n, 2 ** args.cap, args.iters
    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    means = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-2.0, maxval=2.0),
        jax.random.uniform(ks[1], (n, 1), minval=1.5, maxval=40.0),
    ], axis=1)
    quats = G.random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-5.5,
                                        maxval=-3.0))
    opac = jax.random.uniform(ks[4], (n,), minval=0.3, maxval=0.9)
    colors = jax.random.uniform(ks[5], (n, 3))
    f = 0.8 * W
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    view = jnp.eye(4)
    cfg = pipeline.RasterizeConfig(isect_capacity=cap)
    ntx, nty = binning.num_tiles(W, H)
    n_tiles = ntx * nty
    sg = jax.lax.stop_gradient

    def upto(i, stage: int, want_grad: bool = False):
        """Reimplements pipeline.rasterize as a prefix up to `stage`."""
        m = means + i * 1e-5

        def run(m):
            proj = projection.project(m, quats, scales, view, K, W, H)
            if stage == 1:
                return (jnp.sum(proj.means2d) + jnp.sum(proj.conics)
                        + jnp.sum(proj.depths))
            sp = binning.spans(sg(proj.means2d), sg(proj.radii),
                               sg(proj.valid), W, H)
            exp = binning.expand_light(sp.counts, cap)
            op_eff = opac * proj.compensations * proj.valid.astype(
                jnp.float32)
            logop = jnp.log(jnp.maximum(op_eff, 1e-12))
            from bilateral_driving_tpu.ops import expand_pallas
            table_T = jnp.stack([
                sg(sp.tx0.astype(jnp.float32)),
                sg(sp.ty0.astype(jnp.float32)),
                sg(sp.span_w.astype(jnp.float32)),
                sg(exp.offsets[:-1].astype(jnp.float32)),
                proj.means2d[:, 0], proj.means2d[:, 1],
                proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
                logop, colors[:, 0], colors[:, 1], colors[:, 2],
                proj.depths, sg(jnp.arange(n, dtype=jnp.float32)),
                jnp.zeros((n,), jnp.float32)], axis=0)
            if stage == 2:
                key_u, gid_u, feats_u = expand_pallas.expand_gather(
                    table_T, exp.offsets, exp.num_isects, cap, ntx,
                    n_tiles, n)
                return (jnp.sum(feats_u) + jnp.sum(gid_u)
                        + jnp.sum(key_u)).astype(jnp.float32)
            key_s, gid_s, feats_s = pipeline._expand_sort_pallas(
                table_T, exp.offsets, exp.num_isects, cap, ntx, n_tiles,
                n, False)
            if stage == 3:
                return jnp.sum(feats_s) + jnp.sum(gid_s).astype(jnp.float32)
            tile_s = binning.tiles_of_keys(sg(key_s), n_tiles)
            starts, counts = binning.tile_ranges(tile_s, sg(exp.num_isects),
                                                 n_tiles, cap)
            if stage == 4:
                return (jnp.sum(starts) + jnp.sum(counts)).astype(
                    jnp.float32) + jnp.sum(feats_s)
            out = pipeline.rasterize(m, quats, scales, opac, colors, view,
                                     K, W, H, cfg)
            return (jnp.sum(out["rgb"]) + jnp.sum(out["alpha"])
                    + jnp.sum(out["depth"]))

        if want_grad:
            l, g = jax.value_and_grad(run)(m)
            return l + jnp.sum(g)
        return run(m)

    names = ["P1 projection", "P2 +spans/table/expand-krnl",
             "P3 +sortpayload", "P4 +tile_ranges", "P5 full fwd"]
    prev = 0.0
    for s, name in enumerate(names, start=1):
        dt = time_loop(lambda i, s=s: upto(i, s), iters=it)
        print(f"{name:28s} {dt * 1e3:8.2f} ms   (+{(dt - prev) * 1e3:.2f})",
              flush=True)
        prev = dt

    dt = time_loop(lambda i: upto(i, 5, want_grad=True), iters=it)
    print(f"{'P6 full fwd+bwd (vjp)':28s} {dt * 1e3:8.2f} ms", flush=True)
    dt = time_loop(lambda i: upto(i, 3, want_grad=True), iters=it)
    print(f"{'P3 fwd+bwd (sort vjp)':28s} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
