"""Bisect the trainer's backward overhead vs the raw rasterize pipeline.

profile_trainer.py found minimal-config grads cost 95.7 ms where the raw
pipeline fwd+bwd is 52.3 ms — this script attributes the ~43 ms gap by
growing the differentiated computation one trainer feature at a time
(in-program loops; slow-mode preamble first).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_loop(make_body, iters=4, trials=2):
    @jax.jit
    def loop():
        def body(i, acc):
            return acc + make_body(i)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    jax.block_until_ready(loop())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(loop())
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    from bilateral_driving_tpu.data import synthetic
    from bilateral_driving_tpu.train import density, losses, setup, trainer

    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
    del junk

    W, H = 544, 320
    n = 400_000
    key = jax.random.key(0)
    cfg = trainer.TrainerConfig(
        background_model="vanilla", sky_model="none", affine_model="none",
        isect_capacity=2 ** 20, num_images=8, num_frames=8, sh_degree=0,
        w_ssim=0.0, w_depth=0.0,
        density=density.DensityConfig(refine_interval=100))
    scene = synthetic.make_scene(key, num_bg=256, num_frames=8, width=W,
                                 height=H)
    params = setup.build_models(key, cfg)
    bg, mask = setup.build_background(key, n, scene.bg_means, scene.bg_colors,
                                      sh_degree=0)
    kb = jax.random.split(key, 4)
    bg = dict(bg)
    bg["means"] = jnp.concatenate([
        jax.random.uniform(kb[0], (n, 2), minval=-2.0, maxval=2.0),
        jax.random.uniform(kb[1], (n, 1), minval=1.5, maxval=40.0)], axis=1)
    bg["log_scales"] = jax.random.uniform(kb[2], (n, 3), minval=-5.5,
                                          maxval=-3.0)
    mask = jnp.ones((n,), bool)
    params["Background"] = bg
    masks = {"Background": mask}
    statics = {"Background": {}}
    state = trainer.init_state(key, cfg, params, masks,
                               {"Background": {}})
    full = trainer.merge_statics(statics, state.aux)
    batch = synthetic.make_batch(scene, 1,
                                 jax.random.uniform(kb[3], (H, W, 3)))

    def report(name, dt):
        print(f"{name:44s} {dt * 1e3:8.1f} ms", flush=True)

    def fwd_out(params, dummy, i):
        b = dict(batch)
        b["pixels"] = batch["pixels"] + i * 1e-5
        return trainer.forward(cfg, params, full, masks, b, state.step,
                               means2d_dummy=dummy), b

    def g1(i):
        def f(p):
            out, _ = fwd_out(p, None, i)
            return (jnp.sum(out["rgb"]) + jnp.sum(out["depth"])
                    + jnp.sum(out["opacity"]))
        l, g = jax.value_and_grad(f)(state.params)
        return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    report("g1 collect+rasterize grads (no dummy)", time_loop(g1))

    n_total = n

    def g2(i):
        def f(p, d):
            out, _ = fwd_out(p, d, i)
            return (jnp.sum(out["rgb"]) + jnp.sum(out["depth"])
                    + jnp.sum(out["opacity"]))
        l, g = jax.value_and_grad(f, argnums=(0, 1))(
            state.params, jnp.zeros((n_total, 2)))
        return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    report("g2 + means2d_dummy", time_loop(g2))

    def g3(i):
        def f(p):
            out, b = fwd_out(p, None, i)
            return losses.l1(b["pixels"], out["rgb"])
        l, g = jax.value_and_grad(f)(state.params)
        return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    report("g3 + L1 loss (no dummy)", time_loop(g3))

    def g4(i):
        b = dict(batch)
        b["pixels"] = batch["pixels"] + i * 1e-5
        total, loss_dict, outputs, gp, gd = trainer.compute_grads(
            cfg, statics, state, b)
        return total + sum(jnp.sum(x) for x in jax.tree.leaves(gp)) \
            + jnp.sum(gd)

    report("g4 full compute_grads (losses+dummy)", time_loop(g4))


if __name__ == "__main__":
    main()
