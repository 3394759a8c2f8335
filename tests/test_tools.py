"""Config system, eval metrics, trajectories, checkpoint round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilateral_driving_tpu.data import synthetic
from bilateral_driving_tpu.eval import metrics, render_loop
from bilateral_driving_tpu.train import checkpoint, density, setup, trainer
from bilateral_driving_tpu.utils import config as config_lib, trajectory


class TestConfig:
    def test_load_merge_override(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("a: 1\nb:\n  c: 2\n  d: [1, 2]\n")
        over = tmp_path / "over.yaml"
        over.write_text("b:\n  c: 5\ne: hi\n")
        cfg = config_lib.load_config(str(base), str(over),
                                     ["b.d=[9]", "f.g=2.5", "a=false"])
        assert cfg.a is False
        assert cfg.b.c == 5
        assert cfg.b.d == [9]
        assert cfg.e == "hi"
        assert cfg.f.g == 2.5
        assert cfg.get_path("b.c") == 5
        assert cfg.get_path("nope.x", "dflt") == "dflt"

    def test_save_roundtrip(self, tmp_path):
        cfg = config_lib._wrap({"x": {"y": [1, 2]}, "z": "s"})
        p = tmp_path / "out.yaml"
        config_lib.save_config(cfg, str(p))
        cfg2 = config_lib.load_yaml(str(p))
        assert cfg2 == cfg

    def test_shipped_configs_parse(self):
        root = os.path.join(os.path.dirname(__file__), "..",
                            "bilateral_driving_tpu", "configs")
        for f in os.listdir(root):
            if not f.endswith(".yaml"):
                continue
            cfg = config_lib.load_yaml(os.path.join(root, f))
            assert "trainer" in cfg, f


class TestMetrics:
    def test_psnr_ssim(self):
        img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
        assert metrics.psnr(img, img) > 100
        assert metrics.ssim(img, img) > 0.999
        mask = np.zeros((32, 32), np.float32)
        mask[:16] = 1
        noisy = img.copy()
        noisy[16:] = 0  # corrupt only the unmasked half
        assert metrics.psnr(noisy, img, mask) > 100
        assert metrics.psnr(noisy, img) < 30

    def test_chamfer(self):
        rng = np.random.RandomState(0)
        a = rng.rand(500, 3)
        assert metrics.chamfer_distance(a, a) < 1e-6
        b = a + np.array([0.1, 0, 0])
        d = metrics.chamfer_distance(a, b)
        assert 0.01 < d < 0.25
        assert metrics.chamfer_distance(a, b, percentile=95) <= d + 1e-6

    def test_depth_metrics_and_backproject(self):
        depth = np.full((16, 16), 5.0, np.float32)
        K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])
        pts = metrics.depth_to_points(depth, K, np.eye(4))
        assert pts.shape == (256, 3)
        np.testing.assert_allclose(pts[:, 2], 5.0, atol=1e-5)
        m = metrics.depth_metrics(depth + 1.0, depth)
        np.testing.assert_allclose(m["depth_rmse"], 1.0, atol=1e-5)

    def test_image_metrics_masked(self):
        rng = np.random.RandomState(1)
        gt = rng.rand(24, 24, 3).astype(np.float32)
        sky = np.zeros((24, 24), np.float32)
        dyn = np.ones((24, 24), np.float32)
        out = metrics.image_metrics(gt, gt, sky_mask=sky, dynamic_mask=dyn)
        assert out["psnr"] > 100 and out["non_sky_psnr"] > 100
        assert out["dynamic_psnr"] > 100


class TestTrajectory:
    def _poses(self, n=12):
        poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        poses[:, 0, 3] = np.arange(n)
        return poses

    def test_interpolate_endpoints(self):
        keys = self._poses(3)
        out = trajectory.interpolate_poses(keys, 10)
        assert out.shape == (10, 4, 4)
        np.testing.assert_allclose(out[0], keys[0], atol=1e-5)
        np.testing.assert_allclose(out[-1], keys[-1], atol=1e-4)
        # monotone x
        assert (np.diff(out[:, 0, 3]) >= -1e-5).all()

    def test_generators(self):
        per_cam = {0: self._poses(), 1: self._poses(), 2: self._poses()}
        for name in trajectory.TRAJECTORY_GENERATORS:
            out = trajectory.get_novel_trajectory(per_cam, name, 20)
            assert out.shape == (20, 4, 4)
            # valid rotations
            R = out[:, :3, :3]
            np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                                       np.broadcast_to(np.eye(3), R.shape),
                                       atol=1e-4)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        key = jax.random.key(0)
        scene = synthetic.make_scene(key, num_bg=100, width=32, height=32)
        cfg = trainer.TrainerConfig(
            background_model="vanilla", sky_model="none", affine_model="none",
            isect_capacity=2 ** 10, interpret=True, num_images=2,
            num_frames=2, sh_degree=0,
            density=density.DensityConfig(refine_interval=10000))
        params = setup.build_models(key, cfg)
        bg, m = setup.build_background(key, 128, scene.bg_means,
                                       scene.bg_colors, sh_degree=0)
        params["Background"] = bg
        state = trainer.init_state(key, cfg, params,
                                   {"Background": m}, {"Background": {}})
        path = checkpoint.save_checkpoint(str(tmp_path / "ckpts"), state)
        assert checkpoint.latest_checkpoint(str(tmp_path / "ckpts")) == path

        template = trainer.init_state(jax.random.key(9), cfg, params,
                                      {"Background": m}, {"Background": {}})
        restored = checkpoint.restore_checkpoint(path, template)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)


class TestRenderLoop:
    def test_aggregate(self):
        ms = [{"psnr": 20.0, "ssim": 0.8}, {"psnr": 30.0, "ssim": 0.9,
                                            "chamfer": float("nan")}]
        agg = render_loop.aggregate_metrics(ms)
        assert agg["psnr"] == 25.0
        assert "chamfer" not in agg


def test_angular_subsample_beam_pattern():
    """Dense shell -> one return per angular cell; `every` drops beams
    (generate_lidar_from_depth.py pto_ang_map semantics)."""
    from bilateral_driving_tpu.utils.export import angular_subsample
    rng = np.random.RandomState(0)
    az = rng.uniform(-0.7, 0.7, 20000)
    el = rng.uniform(-0.4, 0.03, 20000)
    d = rng.uniform(5, 40, 20000)
    pts = np.stack([d * np.cos(el) * np.cos(az), d * np.cos(el) * np.sin(az),
                    d * np.sin(el)], 1)
    sub = angular_subsample(pts, num_beams=32, azimuth_bins=128)
    assert 0 < sub.shape[0] <= 32 * 128
    sub2 = angular_subsample(pts, num_beams=32, azimuth_bins=128, every=2)
    assert sub2.shape[0] < sub.shape[0]
    # subsampled points are a subset of the originals
    assert ({tuple(np.round(p, 6)) for p in sub2}
            <= {tuple(np.round(p, 6)) for p in pts})


def test_export_box_corners(tmp_path):
    from bilateral_driving_tpu.utils.export import export_box_corners
    o2w = np.eye(4); o2w[:3, 3] = [10.0, 2.0, 0.5]
    info = {"0": {"class_name": "vehicle.car", "frame_annotations": {
        "frame_idx": [0, 1], "obj_to_world": [o2w.tolist()] * 2,
        "box_size": [[4.0, 2.0, 1.5]] * 2}}}
    frames = {"0": [0], "1": [0], "2": []}
    w2s = np.eye(4); w2s[:3, 3] = [-10.0, 0.0, 0.0]
    out = export_box_corners(1, info, frames, w2s, output_path=str(tmp_path))
    c = np.asarray(out["0"]["bbox"])
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c.mean(0), [0.0, 2.0, 0.5], atol=1e-9)
    np.testing.assert_allclose(c.max(0) - c.min(0), [4.0, 2.0, 1.5])
    # exact reference corner ORDER (get_corners, visual_bbox_lidar.py:18-22):
    # top-face ring then bottom-face ring — consumers index edges by position
    local = c - np.array([0.0, 2.0, 0.5])
    np.testing.assert_allclose(local, np.array([
        [-2, -2, 2, 2, -2, -2, 2, 2],
        [1, -1, -1, 1, 1, -1, -1, 1],
        [0.75] * 4 + [-0.75] * 4,
    ]).T, atol=1e-9)
    import json, os
    assert json.load(open(os.path.join(tmp_path, "001.json")))["0"][
        "class_name"] == "vehicle.car"
    assert export_box_corners(2, info, frames, w2s) == {}
