"""Delivered wall-clock: the train CLI must deliver the profiled step.

Round-3 found a hole between profiler numbers and what the training loop
actually delivered (per-step host syncs, VERDICT r3 weak #2). This harness
measures the REAL CLI at the flagship operating point (544x320, 400k live
background gaussians, sh3 + EnvLight-1024 + ms-bilateral + ssim) and
compares against the in-program-loop step time from the same build
(tools/profile_trainer.py's method):

  * runs `bilateral_driving_tpu.tools.train` on the synthetic scene with
    400k background points for --steps steps;
  * steady-state ms/step = median of the per-log-window rates ("win
    X.Xms/it" in the log) excluding the first window (compile);
  * in-program baseline = a lax.fori_loop of train_steps on the same
    TrainerConfig/shapes, timed marginally (N vs 2N iterations);
  * asserts CLI steady-state <= ratio_max x in-program step;
  * writes WALLCLOCK_r05.json with both numbers and the 30k-step/scene
    extrapolation.

Run on the real chip from the repo root:
    python tools/wallclock.py [--steps 400] [--out WALLCLOCK_r05.json]
"""
import argparse
import json
import os
import pathlib
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

W, H, NUM_BG = 544, 320, 400_000
# the synthetic 400k scene measures ~945k isects (ground plane + blobs have
# more overlap than the bench cloud) -> the 2^20 bucket, no mid-run rebucket
CAP = 2 ** 20
RATIO_MAX = 1.3


def cli_overrides(steps, spd=1):
    return [
        f"trainer.steps_per_dispatch={spd}",
        "data.synthetic=true", f"data.width={W}", f"data.height={H}",
        f"data.num_bg={NUM_BG}", f"data.bg_capacity={NUM_BG}",
        "data.num_frames=4",
        f"trainer.max_steps={steps}",
        "trainer.use_rigid=false",   # Background-only: mirrors the
        #                              in-program baseline build exactly
        "trainer.sh_degree=3", "trainer.envlight_resolution=1024",
        f"render.isect_capacity={CAP}",
        # steady state: no refinement-driven shape changes mid-measurement
        "density.refine_interval=1000000", "density.warmup_steps=1000000",
        "res_schedule.double_steps=0",
        "logging.log_every=50", "logging.metrics_flush_every=50",
        "logging.ckpt_every=10000000", "logging.vis_freq=0",
    ]


def run_cli(steps, workdir, spd=1):
    cmd = [sys.executable, "-m", "bilateral_driving_tpu.tools.train",
           "--config_file",
           os.path.join(REPO, "bilateral_driving_tpu", "configs",
                        "synthetic.yaml"),
           "--output_root", workdir, "--run_name", f"wc{steps}x{spd}"
           ] + cli_overrides(steps, spd)
    t0 = time.time()
    env = dict(os.environ)
    # flip the tunnel out of fast mode INSIDE the CLI process, so its
    # window timings measure device throughput, not dispatch rate
    env["BILATERAL_TUNNEL_SLOW_MODE"] = "1"
    proc = subprocess.run(cmd, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-4000:]
    log = (pathlib.Path(workdir) / "bilateral_driving_tpu"
           / f"wc{steps}x{spd}" / "log.txt").read_text()
    wins = [float(m) for m in re.findall(r"win ([0-9.]+)ms/it", log)]
    return wall, wins


def inprogram_step_ms():
    """The same operating point as a lax.fori_loop inside one program
    (profile_trainer.py's flagship build, marginal N vs 2N timing)."""
    import jax
    import jax.numpy as jnp

    from bilateral_driving_tpu.data import synthetic
    from bilateral_driving_tpu.train import density, setup, trainer

    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
    del junk

    key = jax.random.key(0)
    cfg = trainer.TrainerConfig(
        background_model="vanilla", sky_model="envlight",
        affine_model="multiscale_bilateral", envlight_resolution=1024,
        isect_capacity=CAP, num_images=8, num_frames=8, sh_degree=3,
        w_ssim=0.2, w_depth=0.01,
        density=density.DensityConfig(refine_interval=10 ** 9))
    # the SAME scene build as the CLI's synthetic path (tools/common.py
    # build_synthetic_scene): capacity == num_bg, knn-initialized scales
    scene = synthetic.make_scene(key, num_bg=NUM_BG, num_frames=4,
                                 width=W, height=H)
    params = setup.build_models(key, cfg)
    bg, bg_mask = setup.build_background(key, NUM_BG, scene.bg_means,
                                         scene.bg_colors,
                                         sh_degree=cfg.sh_degree)
    kb = jax.random.split(key, 4)
    params["Background"] = bg
    masks = {"Background": bg_mask}
    aux = {"Background": {}}
    statics = {"Background": {}}
    batch = synthetic.make_batch(scene, 1,
                                 jax.random.uniform(kb[3], (H, W, 3)))
    state = trainer.init_state(key, cfg, params, masks, aux)

    def time_loop(iters):
        def body(i, st):
            b = dict(batch)
            b["pixels"] = batch["pixels"] + i * 1e-5
            st2, _ = trainer.train_step(cfg, statics, st, b)
            return st2

        @jax.jit
        def loop(state):
            return jax.lax.fori_loop(0, iters, body, state)

        jax.block_until_ready(loop(state))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(state))
            best = min(best, time.perf_counter() - t0)
        return best

    it = 4
    t_lo, t_hi = time_loop(it), time_loop(2 * it)
    return max(t_hi - t_lo, 1e-9) / it * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--out", default=os.path.join(REPO, "WALLCLOCK_r05.json"))
    p.add_argument("--workdir", default=None)
    p.add_argument("--skip-inprogram", action="store_true")
    args = p.parse_args()
    workdir = args.workdir or os.path.join(REPO, "work_dirs", "wallclock")

    wall1, wins1 = run_cli(args.steps, workdir, spd=1)
    wall8, wins8 = run_cli(args.steps, workdir, spd=8)

    def steady(wins):
        assert len(wins) >= 3, f"not enough log windows: {wins}"
        return sorted(wins[1:])[len(wins[1:]) // 2]   # median, no compile

    steady1, steady8 = steady(wins1), steady(wins8)
    prof_ms = None if args.skip_inprogram else inprogram_step_ms()
    # the delivered configuration is whichever dispatch mode wins at this
    # scale: at 544x320 the async loop alone already overlaps dispatch
    # with device compute (spd=1 typically wins); multi-step scan pays off
    # on dispatch-bound small-image runs (the quality smoke)
    best = min(steady1, steady8)
    best_mode = "spd1" if steady1 <= steady8 else "spd8"
    ratio = None if prof_ms is None else best / prof_ms

    artifact = {
        "config": "flagship sh3+env1024+ms_bilateral+ssim @ 544x320, "
                  f"{NUM_BG} live gaussians, cap {CAP}",
        "cli_steps": args.steps,
        "cli_total_wall_s": {"spd1": round(wall1, 1),
                             "spd8": round(wall8, 1)},
        "cli_window_ms_spd1": [round(w, 1) for w in wins1],
        "cli_window_ms_spd8": [round(w, 1) for w in wins8],
        "cli_steady_ms_per_step_spd1": round(steady1, 1),
        "cli_steady_ms_per_step_spd8": round(steady8, 1),
        "cli_steady_ms_per_step": round(best, 1),
        "delivered_mode": best_mode,
        "inprogram_ms_per_step": None if prof_ms is None
        else round(prof_ms, 1),
        "cli_over_inprogram_ratio": None if ratio is None
        else round(ratio, 3),
        "ratio_max": RATIO_MAX,
        "extrapolated_30k_steps_min": round(best * 30_000 / 60e3, 1),
        "backend": os.environ.get("JAX_PLATFORMS", "default"),
    }
    json.dump(artifact, open(args.out, "w"), indent=2)
    print(json.dumps(artifact))
    if ratio is not None:
        assert ratio <= RATIO_MAX, \
            f"CLI {best:.1f} ms/step vs in-program {prof_ms:.1f} " \
            f"(ratio {ratio:.2f} > {RATIO_MAX}): the loop is not " \
            f"delivering the profiled step"
    print("WALLCLOCK OK")


if __name__ == "__main__":
    main()
