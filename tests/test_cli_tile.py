"""Train-CLI hybrid data x tile mesh: the capacity self-heal must work when
the overflowing step is a hybrid-mesh step (VERDICT round-4 item 6) — the
rebucket rebuilds tile_parallel.tile_train_step, not just the single-device
or data-parallel step."""
import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_cli_tile_mesh_capacity_selfheal(tmp_path):
    """2 x 4 hybrid mesh on 8 virtual CPU devices with a starved PER-BAND
    isect capacity: after `rebucket_after` overflowing flush windows the CLI
    must re-bucket and finish overflow-free."""
    log_root = str(tmp_path / "runs")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    flags = [
        sys.executable, "-m", "bilateral_driving_tpu.tools.train",
        "--config_file",
        os.path.join(REPO, "bilateral_driving_tpu", "configs",
                     "synthetic.yaml"),
        "--output_root", log_root,
        "--run_name", "tileheal",
        "--data_parallel", "2", "--tile_parallel", "4",
    ]
    opts = [
        "data.width=64", "data.height=64", "data.num_bg=300",
        "data.bg_capacity=512", "trainer.max_steps=6",
        "trainer.sh_degree=0", "trainer.envlight_resolution=16",
        # per-BAND capacity: 64x64 image over 4 bands -> starved at 128
        "render.isect_capacity=128", "render.capacity_floor=128",
        "render.capacity_margin=1.25", "render.rebucket_after=2",
        "logging.log_every=1", "logging.metrics_flush_every=1",
        "logging.ckpt_every=100000",
    ]
    proc = subprocess.run(flags + opts, capture_output=True, text=True,
                          env=env, timeout=2400, cwd=REPO)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "hybrid data x tile over" in out
    assert "re-bucketing capacity 128 ->" in out
    run_dir = pathlib.Path(log_root) / "bilateral_driving_tpu" / "tileheal"
    lines = [json.loads(l) for l in
             (run_dir / "metrics.json").read_text().strip().splitlines()]
    assert lines[0]["isect_overflow"] > 0        # a band started starved
    assert lines[-1]["isect_overflow"] == 0      # healed after rebucket
