"""End-to-end train-CLI smoke over a real (converted-fixture) scene:
coarse-to-fine resolution schedule crosses a boundary (two static shapes,
one re-jit each — reference base.py:142-146), checkpoints, metrics JSON.
VERDICT round-1 item 5."""
import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_cli_res_schedule(tmp_path):
    # build raw fixture + convert (reuses the preprocess test fixture)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import test_preprocess as tp

    from bilateral_driving_tpu.preprocess import nuscenes as nsc

    raw = tp.raw_scene.__wrapped__(tmp_path)
    out_root = str(tmp_path / "processed")
    scene_dir = nsc.NuScenesConverter(raw, out_root,
                                      cameras=["CAM_FRONT"]).convert_scene(0)

    log_root = str(tmp_path / "runs")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "-m", "bilateral_driving_tpu.tools.train",
        "--config_file",
        os.path.join(REPO, "bilateral_driving_tpu", "configs",
                     "omnire_bilateral.yaml"),
        "--output_root", log_root, "--run_name", "ressched",
        f"data.scene_dir={scene_dir}",
        "data.num_cams=1", "data.cameras=[0]", "data.test_image_stride=3",
        "trainer.max_steps=3", "render.isect_capacity=4096",
        "trainer.sh_degree=0", "trainer.envlight_resolution=16",
        "background_init.capacity=2048",
        "background_init.num_lidar_samples=500",
        "background_init.num_near_pts=100",
        "background_init.num_far_pts=100",
        "rigid_capacity=256",
        "res_schedule.double_steps=2", "res_schedule.downscale_times=1",
        "logging.ckpt_every=100000", "logging.vis_freq=0",
        "logging.log_every=1",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=1500, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-4000:] + proc.stdout[-2000:]

    run_dir = pathlib.Path(log_root) / "bilateral_driving_tpu" / "ressched"
    # final checkpoint written
    assert (run_dir / "checkpoints" / "checkpoint_3").is_dir()
    # metrics JSONL has entries; per-run config + source backup exist
    lines = (run_dir / "metrics.json").read_text().strip().splitlines()
    assert len(lines) >= 2
    assert json.loads(lines[0])
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "backup").is_dir()
    # the schedule crossed a resolution boundary: steps 0-1 at 1/2 res,
    # step 2 at full res (two distinct compiles happened without crashing)
    assert "step 2/3" in proc.stdout or "step 2/3" in proc.stderr


@pytest.mark.slow
def test_train_cli_capacity_selfheal(tmp_path):
    """An undersized isect capacity must not silently drop intersections
    for the rest of the run: after `rebucket_after` overflowing flush
    windows the CLI re-buckets the capacity (one recompile) and training
    continues overflow-free (VERDICT round-3 item 5)."""
    log_root = str(tmp_path / "runs")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        sys.executable, "-m", "bilateral_driving_tpu.tools.train",
        "--config_file",
        os.path.join(REPO, "bilateral_driving_tpu", "configs",
                     "synthetic.yaml"),
        "--output_root", log_root,
    ]
    opts = [
        "data.width=64", "data.height=48", "data.num_bg=300",
        "data.bg_capacity=512", "trainer.max_steps=8",
        "trainer.sh_degree=0", "trainer.envlight_resolution=16",
        "render.isect_capacity=512", "render.capacity_floor=512",
        "render.capacity_margin=1.25", "render.rebucket_after=2",
        "logging.log_every=1", "logging.metrics_flush_every=1",
        "logging.ckpt_every=100000",
    ]
    proc = subprocess.run(flags + ["--run_name", "heal"] + opts,
                          capture_output=True, text=True, env=env,
                          timeout=1500, cwd=REPO)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "re-bucketing capacity 512 ->" in out
    run_dir = pathlib.Path(log_root) / "bilateral_driving_tpu" / "heal"
    lines = [json.loads(l) for l in
             (run_dir / "metrics.json").read_text().strip().splitlines()]
    assert lines[0]["isect_overflow"] > 0        # started starved
    assert lines[-1]["isect_overflow"] == 0      # healed
    assert lines[-1]["num_isects"] > 512

    # error policy: fail loudly on the first overflowing window instead
    proc = subprocess.run(
        flags + ["--run_name", "err"] + opts
        + ["render.capacity_policy=error"],
        capture_output=True, text=True, env=env, timeout=1500, cwd=REPO)
    assert proc.returncode != 0
    assert "overflowed" in proc.stdout + proc.stderr
