"""Headline benchmark: rasterize forward+backward throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the training hot loop at nuScenes scale (BASELINE.md: 900x1600
loaded at 1/3 => 300x533; background init ~1M points of which a few hundred
thousand survive culling): N Gaussians rendered + differentiated through the
full Pallas pipeline on one chip. `vs_baseline` is measured Mpix/s divided by
a 25 Mpix/s reference point for gsplat fwd+bwd on an A100 at comparable
scene complexity (no numbers are published in the reference repo —
BASELINE.json carries "published": {} — so this anchor is an estimate from
gsplat's own benchmarks; the honest comparison is wall-clock parity on real
scenes, tracked separately).
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from bilateral_driving_tpu.core import gaussians as G
    from bilateral_driving_tpu.ops import pipeline

    on_tpu = jax.default_backend() in ("tpu", "axon")
    # nuScenes 1/3-res frame; modest N on CPU fallback
    W, H = 544, 320
    n = 400_000 if on_tpu else 2_000
    if not on_tpu:
        W, H = 96, 64

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
    # capacity autotuned from measured occupancy (pipeline.autotune_capacity):
    # a real training run picks the bucket the same way
    if on_tpu:
        n_isects = pipeline.probe_num_isects(means, quats, scales, view, K,
                                             W, H)
        cap = pipeline.autotune_capacity(n_isects, margin=1.1)
    else:
        cap = 2 ** 13
    cfg = pipeline.RasterizeConfig(isect_capacity=cap, interpret=not on_tpu)

    def loss(m, c, o):
        out = pipeline.rasterize(m, quats, scales, o, c, view, K, W, H,
                                 cfg)
        return (jnp.sum(out["rgb"]) + jnp.sum(out["alpha"])
                + jnp.sum(out["depth"]))

    # iterations run INSIDE one program (lax.fori_loop, inputs perturbed per
    # iteration so XLA cannot hoist): the axon tunnel pays ~6 ms per
    # dispatch and ~28 ms per sync round trip once any big program has run,
    # so dispatch-loop timing over-reports; in-program looping measures the
    # chip (ROADMAP round-2 finding).
    iters = 10 if on_tpu else 1

    def build(n):
        @jax.jit
        def loop(means, colors, opac):
            def body(i, acc):
                l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    means + i * 1e-5, colors, opac)
                return acc + l + sum(jnp.sum(x) for x in g)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return loop

    lo, hi = build(iters), build(2 * iters)
    if on_tpu:
        # flip the tunnel out of its fast mode, whose block_until_ready
        # returns before execution completes (only big MEMORY ops flip it —
        # compute-heavy programs alone do not); timing then uses the
        # MARGINAL cost between 2N- and N-iteration programs, cancelling
        # the tunnel's fixed ~24 ms per-program charge
        junk = jnp.ones((64, 2 ** 20), jnp.float32)
        jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
        del junk
    jax.block_until_ready((lo(means, colors, opac),
                           hi(means, colors, opac)))
    # flush: the first execution after compile pays a one-time program
    # upload (~0.5 s), which would corrupt the first marginal
    jax.block_until_ready(lo(means + 7e-7, colors, opac))
    dt = float("inf")
    for trial in range(3 if on_tpu else 1):
        # trial+1 and distinct lo/hi offsets: identical executions are
        # served from the tunnel's cache and would time as ~0
        t0 = time.time()
        jax.block_until_ready(lo(means + (trial + 1) * 1e-6, colors, opac))
        t_lo = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(hi(means + (trial + 1) * 2e-6, colors, opac))
        marginal = (time.time() - t0 - t_lo) / iters
        if marginal > 0:
            dt = min(dt, marginal)
    mpix_s = W * H / dt / 1e6
    baseline_a100 = 25.0
    # v5e roofline ceiling for this algorithm at this operating point:
    # ~13.4 ms fwd+bwd floor => ~13 Mpix/s (ROADMAP round-4 per-stage
    # table; BASELINE.md "hardware context" projects the same pipeline to
    # the v5p target where the A100 anchor applies)
    v5e_ceiling = 13.0
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_throughput",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / baseline_a100, 4),
        "vs_v5e_roofline": round(mpix_s / v5e_ceiling, 4),
        "bench_chip": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
