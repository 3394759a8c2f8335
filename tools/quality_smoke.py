"""Long training smoke with asserted quality floors (VERDICT r2 item 4).

Trains the flagship config (omnire_ms_bilateral + SMPL) for >= 2000 steps on
the committed converted fixture scene (tests/fixtures/mini_scene_nuscenes:
background + rigid car + SMPL pedestrian, lidar depth, sky masks), with
densification firing and the coarse-to-fine schedule crossing a boundary,
then evals the held-out test split and asserts PSNR/SSIM floors. Records
wall-clock and steps/s to QUALITY_r03.json.

Run on the real chip (default backend) from the repo root:
    python tools/quality_smoke.py [--steps 2000] [--out QUALITY_r03.json]

This is the fixture-scale stand-in for the unrunnable 30k-step nuScenes
protocol (reference scripts/train.sh:10-35): real data is absent from this
environment, so the asserted floors pin end-to-end convergence of the full
scene graph rather than paper-number parity.
"""
import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, "tests", "fixtures", "mini_scene_nuscenes")

# The 3-frame fixture forces the held-out frame (frame 2) to be an
# EXTRAPOLATION beyond the last trained timestep — much harder than the
# reference protocol's interior held-out frames. Floors calibrated to the
# measured 2k-step run (test 14.8 PSNR / 0.40 SSIM; full 20.5 / 0.76).
PSNR_FLOOR = 13.5
SSIM_FLOOR = 0.35
FULL_PSNR_FLOOR = 19.0
FULL_SSIM_FLOOR = 0.70


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--out", default=os.path.join(REPO, "QUALITY_r03.json"))
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    workdir = args.workdir or os.path.join(REPO, "work_dirs", "quality_smoke")
    run_name = f"q{args.steps}"
    overrides = [
        f"data.scene_dir={SCENE}",
        "data.num_cams=2", "data.cameras=[0,1]", "data.test_image_stride=2",
        "data.downscale=1",
        f"trainer.max_steps={args.steps}",
        "trainer.use_smpl=true",              # cover the SMPL branch too
        "smpl.model_path=synthetic",          # gated asset stand-in
        "trainer.sh_degree=2",
        "trainer.sh_degree_interval=300",
        "trainer.envlight_resolution=64",
        "render.isect_capacity=131072",
        "background_init.capacity=16384",
        "background_init.num_lidar_samples=4000",
        "background_init.num_near_pts=2000",
        "background_init.num_far_pts=2000",
        "rigid_capacity=2048",
        # densification active over most of the run
        "density.warmup_steps=200", "density.refine_interval=150",
        "density.stop_split_at=1500",
        # coarse-to-fine crosses a boundary mid-run
        "res_schedule.double_steps=400", "res_schedule.downscale_times=1",
        "logging.ckpt_every=100000", "logging.vis_freq=0",
        "logging.log_every=100",
    ]
    env = dict(os.environ)
    t0 = time.time()
    train = subprocess.run(
        [sys.executable, "-m", "bilateral_driving_tpu.tools.train",
         "--config_file",
         os.path.join(REPO, "bilateral_driving_tpu", "configs",
                      "omnire_ms_bilateral.yaml"),
         "--output_root", workdir, "--run_name", run_name] + overrides,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    sys.stdout.write(train.stdout[-3000:])
    sys.stderr.write(train.stderr[-3000:])
    assert train.returncode == 0, "train CLI failed"

    run_dir = pathlib.Path(workdir) / "bilateral_driving_tpu" / run_name
    ev = subprocess.run(
        [sys.executable, "-m", "bilateral_driving_tpu.tools.eval",
         "--log_dir", str(run_dir)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    sys.stdout.write(ev.stdout[-2000:])
    sys.stderr.write(ev.stderr[-2000:])
    assert ev.returncode == 0, "eval CLI failed"

    metrics = json.load(open(run_dir / "metrics_test.json"))
    full = json.load(open(run_dir / "metrics_full.json"))
    psnr, ssim = metrics["psnr"], metrics["ssim"]
    # densification actually fired: training metrics JSONL carries the
    # refine accounting
    lines = [json.loads(x) for x in
             (run_dir / "metrics.json").read_text().strip().splitlines()]
    assert any("refine_dropped" in m for m in lines)

    artifact = {
        "scene": "mini_scene_nuscenes (converted fixture, 64x48, 2 cams x 3 frames, frame 2 held out)",
        "config": "omnire_ms_bilateral + use_smpl",
        "steps": args.steps,
        "wallclock_s": round(wall, 1),
        "steps_per_s": round(args.steps / wall, 2),
        "test_psnr": round(float(psnr), 3),
        "test_ssim": round(float(ssim), 4),
        "full_psnr": round(float(full["psnr"]), 3),
        "full_ssim": round(float(full["ssim"]), 4),
        "floors": {"psnr": PSNR_FLOOR, "ssim": SSIM_FLOOR,
                   "full_psnr": FULL_PSNR_FLOOR,
                   "full_ssim": FULL_SSIM_FLOOR},
        "backend": os.environ.get("JAX_PLATFORMS", "default"),
    }
    json.dump(artifact, open(args.out, "w"), indent=2)
    print(json.dumps(artifact))
    assert psnr >= PSNR_FLOOR, f"test PSNR {psnr} < floor {PSNR_FLOOR}"
    assert ssim >= SSIM_FLOOR, f"test SSIM {ssim} < floor {SSIM_FLOOR}"
    assert full["psnr"] >= FULL_PSNR_FLOOR, full
    assert full["ssim"] >= FULL_SSIM_FLOOR, full
    print("QUALITY SMOKE OK")


if __name__ == "__main__":
    main()
