"""Honest (in-program loop) profile of the FULL trainer step at bench scale.

Measures the flagship `omnire_ms_bilateral`-style configuration (sh3 +
EnvLight-1024 + multi-scale bilateral + SSIM + depth + sky BCE) and ablations
toggled one at a time, each as a lax.fori_loop of train steps inside one
program — the only timing method the axon tunnel does not distort
(tools/profile_stages.py docstring).

Usage: python tools/profile_trainer.py [--iters 4] [--num_bg 400000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--num_bg", type=int, default=400_000)
    p.add_argument("--cap", type=int, default=20)
    p.add_argument("--width", type=int, default=544)
    p.add_argument("--height", type=int, default=320)
    args = p.parse_args()

    from bilateral_driving_tpu.data import synthetic
    from bilateral_driving_tpu.train import density, setup, trainer

    W, H = args.width, args.height
    key = jax.random.key(0)

    # the tunnel's initial fast mode returns from block_until_ready BEFORE
    # execution finishes (timings read ~0); running one big-data program
    # flips it into the honest (slow) mode permanently — do that first
    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
    del junk

    def build(name, **kw):
        cfg = trainer.TrainerConfig(
            background_model="vanilla", sky_model=kw.get("sky", "envlight"),
            affine_model=kw.get("affine", "multiscale_bilateral"),
            envlight_resolution=kw.get("envres", 1024),
            isect_capacity=2 ** args.cap, num_images=8, num_frames=8,
            sh_degree=kw.get("sh", 3),
            w_ssim=kw.get("w_ssim", 0.2), w_depth=kw.get("w_depth", 0.01),
            density=density.DensityConfig(refine_interval=100))
        scene = synthetic.make_scene(key, num_bg=256, num_frames=8,
                                     width=W, height=H)
        params = setup.build_models(key, cfg)
        bg, mask = setup.build_background(
            key, args.num_bg, scene.bg_means, scene.bg_colors,
            sh_degree=cfg.sh_degree)
        # fill capacity with random live gaussians at bench scale
        kb = jax.random.split(key, 4)
        n = args.num_bg
        bg = dict(bg)
        bg["means"] = jnp.concatenate([
            jax.random.uniform(kb[0], (n, 2), minval=-2.0, maxval=2.0),
            jax.random.uniform(kb[1], (n, 1), minval=1.5, maxval=40.0)],
            axis=1)
        bg["log_scales"] = jax.random.uniform(kb[2], (n, 3), minval=-5.5,
                                              maxval=-3.0)
        mask = jnp.ones((n,), bool)
        params["Background"] = bg
        masks = {"Background": mask}
        aux = {"Background": {}}
        statics = {"Background": {}}
        batch = synthetic.make_batch(
            scene, 1, jax.random.uniform(kb[3], (H, W, 3)))
        state = trainer.init_state(key, cfg, params, masks, aux)
        return name, cfg, statics, state, batch

    def time_steps(cfg, statics, state, batch, iters):
        def body(i, st):
            b = dict(batch)
            b["pixels"] = batch["pixels"] + i * 1e-5
            st2, _ = trainer.train_step(cfg, statics, st, b)
            return st2

        @jax.jit
        def loop(state):
            return jax.lax.fori_loop(0, iters, body, state)

        out = jax.block_until_ready(loop(state))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(state))
            best = min(best, time.perf_counter() - t0)
        del out
        return best / iters

    variants = [
        build("flagship (sh3+env1024+msbilateral+ssim+depth)"),
        build("sh0", sh=0),
        build("sky none", sky="none"),
        build("affine none", affine="none"),
        build("no ssim", w_ssim=0.0),
        build("minimal (sh0, none, none, no ssim/depth)", sh=0, sky="none",
              affine="none", w_ssim=0.0, w_depth=0.0),
    ]
    base = None
    for name, cfg, statics, state, batch in variants:
        dt = time_steps(cfg, statics, state, batch, args.iters)
        note = ""
        if base is None:
            base = dt
        else:
            note = f"  (delta vs flagship {1e3 * (dt - base):+.1f})"
        print(f"{name:48s} {dt * 1e3:8.1f} ms{note}", flush=True)

    # ---- decompose the minimal step: where does non-render time go? ----
    name, cfg, statics, state, batch = variants[-1]

    def sub(tag, body):
        @jax.jit
        def loop(state):
            def it(i, acc):
                b = dict(batch)
                b["pixels"] = batch["pixels"] + i * 1e-5
                return acc + body(state, b)
            return jax.lax.fori_loop(0, args.iters, it, 0.0)

        jax.block_until_ready(loop(state))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(state))
            best = min(best, time.perf_counter() - t0)
        print(f"  {tag:46s} {best / args.iters * 1e3:8.1f} ms", flush=True)

    full = trainer.merge_statics(statics, state.aux)

    def fwd_loss(st, b):
        outputs = trainer.forward(cfg, st.params, full, st.masks, b, st.step)
        loss = trainer.compute_losses(cfg, st.params, full, st.masks,
                                      outputs, b, st.step)
        return sum(loss.values())

    sub("fwd+loss only", fwd_loss)
    sub("grads (no update)", lambda st, b: sum(
        jnp.sum(x) for x in jax.tree.leaves(
            trainer.compute_grads(cfg, statics, st, b)[3])))

    def full_step(st, b):
        st2, m = trainer.train_step(cfg, statics, st, b)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(st2.params["Background"]))

    sub("full step (scalarized state)", full_step)


if __name__ == "__main__":
    main()
