"""On-chip convergence evidence for the non-flagship model families.

The flagship (omnire_ms_bilateral + SMPL) has an asserted quality harness
(tools/quality_smoke.py). The PVG and DeformableGS background families were
only ever unit-tested — this runs each for --steps on the proto fixture
(interior stride-10 holdout, like the flagship) and records test/full
metrics to QUALITY_r05_variants.json. Informational (no asserted floors
beyond finiteness): these single-class variants model the scene's dynamics
through temporal vibration / a deform net rather than explicit nodes, so
their fixture-scale numbers sit below the flagship's by design.

Run on the real chip: python tools/quality_variants.py [--steps 2000]
"""
import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, "tests", "fixtures", "proto_scene")

COMMON = [
    f"data.scene_dir={SCENE}",
    "data.num_cams=2", "data.cameras=[0,1]", "data.test_image_stride=10",
    "data.downscale=1",
    "trainer.steps_per_dispatch=8",
    "trainer.sh_degree=2", "trainer.sh_degree_interval=500",
    "trainer.envlight_resolution=64",
    "render.isect_capacity=262144", "render.capacity_policy=rebucket",
    "background_init.capacity=32768",
    "background_init.num_lidar_samples=12000",
    "background_init.num_near_pts=4000", "background_init.num_far_pts=4000",
    "density.warmup_steps=300", "density.refine_interval=200",
    # the method configs carry the 30k-step protocol's coarse-to-fine
    # (1/8 res, doubling every 5000) — at fixture length that would never
    # leave 12x8 px; use the flagship smoke's schedule instead
    "res_schedule.double_steps=400", "res_schedule.downscale_times=1",
    "logging.ckpt_every=1000000", "logging.vis_freq=0",
    "logging.log_every=240", "logging.metrics_flush_every=240",
]


def run_variant(name, cfg_file, steps, workdir):
    env = dict(os.environ)
    env["BILATERAL_TUNNEL_SLOW_MODE"] = "1"
    t0 = time.time()
    train = subprocess.run(
        [sys.executable, "-m", "bilateral_driving_tpu.tools.train",
         "--config_file",
         os.path.join(REPO, "bilateral_driving_tpu", "configs", cfg_file),
         "--output_root", workdir, "--run_name", name,
         f"trainer.max_steps={steps}"] + COMMON,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    sys.stdout.write(train.stdout[-1500:])
    sys.stderr.write(train.stderr[-1500:])
    assert train.returncode == 0, f"{name} train failed"
    run_dir = pathlib.Path(workdir) / "bilateral_driving_tpu" / name
    ev = subprocess.run(
        [sys.executable, "-m", "bilateral_driving_tpu.tools.eval",
         "--log_dir", str(run_dir)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    assert ev.returncode == 0, f"{name} eval failed: {ev.stderr[-2000:]}"
    test = json.load(open(run_dir / "metrics_test.json"))
    full = json.load(open(run_dir / "metrics_full.json"))
    return {
        "config": cfg_file,
        "steps": steps,
        "wallclock_s": round(wall, 1),
        "test_psnr": round(float(test["psnr"]), 3),
        "test_ssim": round(float(test["ssim"]), 4),
        "full_psnr": round(float(full["psnr"]), 3),
        "full_ssim": round(float(full["ssim"]), 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--out",
                   default=os.path.join(REPO, "QUALITY_r05_variants.json"))
    p.add_argument("--workdir", default=None)
    args = p.parse_args()
    workdir = args.workdir or os.path.join(REPO, "work_dirs",
                                           "quality_variants")
    results = {}
    for name, cfg in [("pvg", "pvg.yaml"),
                      ("deformgs", "deformablegs.yaml")]:
        results[name] = run_variant(name, cfg, args.steps, workdir)
        print(name, json.dumps(results[name]), flush=True)
        assert results[name]["test_psnr"] > 14.0, \
            f"{name} failed to converge at all"
    artifact = {
        "scene": "proto_scene (raycast fixture, 96x64, 2 cams x 30 frames, "
                 "interior frames 10 & 20 held out)",
        "note": "single-class background families (no explicit "
                "rigid/SMPL nodes): dynamics modeled by temporal "
                "vibration (pvg) / deform net (deformgs); informational "
                "convergence evidence, floors asserted only on finiteness "
                "+ a loose >14 dB sanity bound",
        **results,
        "backend": os.environ.get("JAX_PLATFORMS", "default"),
    }
    json.dump(artifact, open(args.out, "w"), indent=2)
    print(json.dumps(artifact))
    print("VARIANTS OK")


if __name__ == "__main__":
    main()
