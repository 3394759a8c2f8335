"""On-chip A/B of the rasterizer scan implementations (TRI_MODE/SUF_MODE).

Runs ONE mode combo per process (the modes are read from the environment at
module import) on the bench scene, reporting:
  * marginal fwd and fwd+bwd time (tools/profile_prefix.py method — the axon
    tunnel charges a fixed ~24 ms per program, cancelled by differencing an
    N- and a 2N-iteration program);
  * max |rel diff| of all parameter gradients vs a saved reference npz
    (produced by the scan/scan run with --save-ref), so the MXU bf16
    limb-matmul semantics are verified ON HARDWARE, not just in interpret
    mode (round-3 advisor ask).

Usage:
  BILATERAL_TRI_MODE=scan  BILATERAL_SUF_MODE=scan  \
      python tools/ab_modes.py --save-ref /tmp/ab_ref.npz
  BILATERAL_TRI_MODE=mxu3 BILATERAL_SUF_MODE=mxu3 \
      python tools/ab_modes.py --ref /tmp/ab_ref.npz
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_loop(make_body, iters=6, trials=3):
    def build(n):
        @jax.jit
        def loop():
            def body(i, acc):
                return acc + make_body(i)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return loop

    lo, hi = build(iters), build(2 * iters)
    jax.block_until_ready((lo(), hi()))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(lo())
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(hi())
        t_hi = time.perf_counter() - t0
        if t_hi - t_lo > 0:
            best = min(best, (t_hi - t_lo) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save-ref", default=None)
    p.add_argument("--ref", default=None)
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    from bilateral_driving_tpu.core import gaussians as G
    from bilateral_driving_tpu.ops import pipeline

    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
    del junk

    W, H = 544, 320
    n = args.n
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
    n_isects = pipeline.probe_num_isects(means, quats, scales, view, K, W, H)
    cap = pipeline.autotune_capacity(n_isects, margin=1.1)
    cfg = pipeline.RasterizeConfig(isect_capacity=cap)

    def loss(m, c, o):
        out = pipeline.rasterize(m, quats, scales, o, c, view, K, W, H, cfg)
        return (jnp.sum(out["rgb"]) + jnp.sum(out["alpha"])
                + jnp.sum(out["depth"]))

    # gradient snapshot for cross-process hardware parity comparison
    gm, gc, go = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        means, colors, opac)
    img = jax.jit(lambda: pipeline.rasterize(
        means, quats, scales, opac, colors, view, K, W, H, cfg)["rgb"])()
    snap = {"gm": np.asarray(gm), "gc": np.asarray(gc),
            "go": np.asarray(go), "img": np.asarray(img)}

    diffs = {}
    if args.ref:
        ref = np.load(args.ref)
        for k, v in snap.items():
            denom = np.maximum(np.abs(ref[k]), 1e-6)
            diffs[f"maxrel_{k}"] = float(
                np.max(np.abs(v - ref[k]) / denom))
    if args.save_ref:
        np.savez(args.save_ref, **snap)

    def fwd(i):
        out = pipeline.rasterize(means + i * 1e-5, quats, scales, opac,
                                 colors, view, K, W, H, cfg)
        return (jnp.sum(out["rgb"]) + jnp.sum(out["alpha"])
                + jnp.sum(out["depth"]))

    def fwdbwd(i):
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            means + i * 1e-5, colors, opac)
        return l + sum(jnp.sum(x) for x in g)

    t_fwd = time_loop(fwd, iters=args.iters)
    t_fb = time_loop(fwdbwd, iters=args.iters)
    print(json.dumps({
        "tri": os.environ.get("BILATERAL_TRI_MODE", "scan"),
        "suf": os.environ.get("BILATERAL_SUF_MODE", "scan"),
        "cap": cap,
        "fwd_ms": round(t_fwd * 1e3, 2),
        "fwd_bwd_ms": round(t_fb * 1e3, 2),
        **{k: round(v, 7) for k, v in diffs.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
