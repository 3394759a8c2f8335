"""Per-stage rasterization profile at bench scale — in-program loops.

ROUND-2 LESSON (supersedes the round-1 harness): the axon tunnel flips into
a slow mode (~28 ms per sync round trip, ~6 ms per pipelined dispatch) after
the first big-data program executes, and never recovers. Any *small* op timed
by dispatch loops then reads as ~6 ms regardless of its true cost — the
round-1 per-stage numbers (gather "6.5 ms", fill "6.7 ms", cumsum "6.2 ms")
were pure dispatch overhead; the real XLA costs are ~0.1 ms. The only honest
measurement runs K iterations *inside one jitted program* (lax.fori_loop with
per-iteration input perturbation so nothing hoists) and divides.

Usage: python tools/profile_stages.py [--n 400000] [--cap 20] [--iters 8]
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


def scalarize(tree):
    leaves = [x.astype(jnp.float32).sum() if x.dtype != jnp.bool_
              else x.sum().astype(jnp.float32)
              for x in jax.tree.leaves(tree)]
    return sum(leaves)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--cap", type=int, default=20, help="log2 isect capacity")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from bilateral_driving_tpu.core import gaussians as G
    from bilateral_driving_tpu.ops import binning, pipeline, projection
    from bilateral_driving_tpu.ops import rasterize_pallas as rp

    # flip the tunnel out of its fast mode, whose block_until_ready returns
    # before execution completes (ROADMAP round-2 finding #2)
    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
    del junk

    W, H = 544, 320
    n = args.n
    cap = 2 ** args.cap
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
    it = args.iters

    def report(name, dt):
        print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)

    def loss(m, c, o):
        out = pipeline.rasterize(m, quats, scales, o, c, view, K, W, H, cfg)
        return (jnp.sum(out["rgb"]) + jnp.sum(out["alpha"])
                + jnp.sum(out["depth"]))

    report("full fwd+bwd", time_loop(
        lambda i: loss(means + i * 1e-5, colors, opac)
        + scalarize(jax.grad(loss, argnums=(0, 1, 2))(
            means + i * 1e-5, colors, opac)),
        iters=it))

    report("full fwd only", time_loop(
        lambda i: loss(means + i * 1e-5, colors, opac), iters=it))

    report("projection fwd", time_loop(
        lambda i: scalarize(projection.project(
            means + i * 1e-5, quats, scales, view, K, W, H)), iters=it))

    def proj_grad(i):
        def f(m):
            pr = projection.project(m, quats, scales, view, K, W, H)
            return (jnp.sum(pr.means2d) + jnp.sum(pr.conics)
                    + jnp.sum(pr.depths) + jnp.sum(pr.compensations))
        return f(means + i * 1e-5) + scalarize(
            jax.grad(f)(means + i * 1e-5))

    report("projection fwd+bwd", time_loop(proj_grad, iters=it))

    proj = jax.jit(lambda m: projection.project(m, quats, scales, view, K,
                                                W, H))(means)
    proj = jax.block_until_ready(proj)

    report("bin_gaussians (no payloads)", time_loop(
        lambda i: scalarize(binning.bin_gaussians(
            proj.means2d + i * 1e-4, proj.radii, proj.depths, proj.valid,
            W, H, cap)), iters=it))

    isect = jax.jit(lambda m2d: binning.bin_gaussians(
        m2d, proj.radii, proj.depths, proj.valid, W, H, cap))(proj.means2d)
    isect = jax.block_until_ready(isect)
    print(f"  num_isects={int(isect.num_isects)}  "
          f"overflow={bool(isect.overflow)}")
    ntx, nty = binning.num_tiles(W, H)
    n_tiles = ntx * nty

    # ---- binning sub-stages (in-program loops) ----
    report("  spans+expand", time_loop(
        lambda i: scalarize(binning.expand(binning.spans(
            proj.means2d + i * 1e-4, proj.radii, proj.valid, W, H).counts,
            cap)), iters=it))

    sp = jax.jit(lambda m: binning.spans(m, proj.radii, proj.valid, W, H))(
        proj.means2d)
    ex = jax.jit(lambda c: binning.expand(c, cap))(sp.counts)
    sp, ex = jax.block_until_ready((sp, ex))

    table5 = jnp.stack([proj.means2d[:, 0], proj.means2d[:, 1],
                        proj.depths, proj.depths, proj.depths], 1)

    report("  row gather (N,5)[g]", time_loop(
        lambda i: jnp.sum(jnp.minimum(table5[jnp.minimum(
            ex.g + i, n - 1)], 1e6)), iters=it))

    tbl14 = jnp.concatenate([table5, table5, table5[:, :4]], axis=1)
    report("  row gather (N,14)[g]", time_loop(
        lambda i: jnp.sum(jnp.minimum(tbl14[jnp.minimum(
            ex.g + i, n - 1)], 1e6)), iters=it))

    keyv = jax.random.randint(jax.random.key(3), (cap,), 0, 2 ** 30)
    pay8 = [jnp.full((cap,), 0.5, jnp.float32)] * 8

    report("  sort cap (1key+2pay int)", time_loop(
        lambda i: jnp.sum(jax.lax.sort(
            ((keyv + i) % (2 ** 30), keyv, keyv), dimension=0, num_keys=1,
            is_stable=False)[1]).astype(jnp.float32), iters=it))

    report("  sort cap (1key+2int+10f32)", time_loop(
        lambda i: scalarize(jax.lax.sort(
            ((keyv + i) % (2 ** 30), keyv, keyv, *pay8, pay8[0], pay8[1]),
            dimension=0, num_keys=1, is_stable=False)[1:]), iters=it))

    from bilateral_driving_tpu.ops import scan_utils
    d10 = jnp.ones((10, cap), jnp.float32)
    report("  cumsum_rows (10,cap) XLA", time_loop(
        lambda i: jnp.sum(scan_utils.cumsum_rows(d10 + i * 1e-6)), iters=it))

    offs = jnp.sort(jax.random.randint(jax.random.key(5), (n + 1,), 0, cap))
    cs10 = jnp.ones((10, cap), jnp.float32)
    report("  seg gather (10,N+1) from (10,cap)", time_loop(
        lambda i: jnp.sum(cs10[:, jnp.minimum(offs + i, cap - 1)]), iters=it))

    # ---- pallas kernel fwd / bwd via pipeline-internal entry ----
    feats16 = jnp.zeros((rp.FEAT, cap), jnp.float32)
    feats16 = feats16.at[5].set(-2.0).at[2].set(0.05).at[4].set(0.05)
    starts, counts = jax.block_until_ready(jax.jit(
        lambda t: binning.tile_ranges(t, isect.num_isects, n_tiles, cap))(
            isect.isect_tile))

    def kfwd(i):
        img, tc, side, nl = rp.rasterize_fwd(
            feats16.at[0].add(i * 1e-5), starts, counts, W, H)
        return jnp.sum(img)

    report("kernel fwd", time_loop(kfwd, iters=it))

    def kfwdbwd(i):
        def f(ft):
            img, tc, side, nl = rp.rasterize_fwd(ft, starts, counts, W, H)
            return jnp.sum(img)
        ft = feats16.at[0].add(i * 1e-5)
        img, tc, side, nl = rp.rasterize_fwd(ft, starts, counts, W, H)
        g = jnp.ones_like(img)
        d = rp.rasterize_bwd(ft, starts, counts, nl, tc, side, g, W, H)
        return jnp.sum(img) + jnp.sum(d)

    report("kernel fwd+bwd", time_loop(kfwdbwd, iters=it))


if __name__ == "__main__":
    main()
