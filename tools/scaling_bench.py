"""Data-parallel scaling measurement over a device mesh.

On real multi-chip hardware this measures images/s vs devices; on the CPU
fake mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) the devices
share the same cores, so the table demonstrates *mechanical* scaling (the
collectives + sharded step execute correctly at every width) rather than
speedup — run on a real slice for the perf table (VERDICT round-1 item 6).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize pins jax_platforms before env vars are honored;
# re-pin when the caller asked for CPU (same dance as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from bilateral_driving_tpu.data import synthetic
    from bilateral_driving_tpu.parallel import data_parallel
    from bilateral_driving_tpu.train import density, setup, trainer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    W, H = (544, 320) if on_tpu else (64, 48)
    num_bg = 100_000 if on_tpu else 300
    cap = 2 ** 19 if on_tpu else 2 ** 12
    steps = 5 if on_tpu else 2

    key = jax.random.key(0)
    cfg = trainer.TrainerConfig(
        background_model="vanilla", sky_model="none", affine_model="none",
        isect_capacity=cap, interpret=not on_tpu, num_images=8, num_frames=8,
        sh_degree=0, w_ssim=0.0, w_depth=0.0,
        density=density.DensityConfig(refine_interval=10 ** 6))
    scene = synthetic.make_scene(key, num_bg=min(num_bg, 4096), num_frames=8,
                                 width=W, height=H)
    params = setup.build_models(key, cfg)
    bg, mask = setup.build_background(key, num_bg, scene.bg_means,
                                      scene.bg_colors, sh_degree=0)
    params["Background"] = bg
    masks = {"Background": mask}
    statics = {"Background": {}}
    state = trainer.init_state(key, cfg, params, masks, {"Background": {}})

    n_dev_all = len(jax.devices())
    widths = [d for d in (1, 2, 4, 8, 16) if d <= n_dev_all]
    print(f"devices available: {n_dev_all}  image {W}x{H}  N={num_bg}")
    base = None
    for nd in widths:
        mesh = data_parallel.make_mesh(nd)
        step = data_parallel.parallel_train_step(cfg, statics, mesh)
        batches = [synthetic.make_batch(
            scene, f % scene.num_frames,
            jax.random.uniform(jax.random.fold_in(key, f), (H, W, 3)))
            for f in range(nd)]
        stacked = data_parallel.shard_batch(
            data_parallel.stack_batches(batches), mesh)
        st, _ = jax.block_until_ready(step(state, stacked))
        t0 = time.perf_counter()
        for _ in range(steps):
            st, metrics = step(st, stacked)
        jax.block_until_ready(metrics["loss"])
        dt = (time.perf_counter() - t0) / steps
        pix_s = nd * W * H / dt
        if base is None:
            base = pix_s
        print(f"  {nd} device(s): {dt * 1e3:8.1f} ms/step  "
              f"{pix_s / 1e6:7.2f} Mpix/s  scaling x{pix_s / base:.2f}")


if __name__ == "__main__":
    main()
