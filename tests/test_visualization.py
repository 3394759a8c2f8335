"""Visualization grids, error maps, TB adapter (reference
utils/visualization.py layouts + tools/train.py vis loop)."""
import os

import numpy as np

from bilateral_driving_tpu.utils import tb as tb_lib
from bilateral_driving_tpu.utils import visualization as vis


class TestTileCameras:
    def test_nuscenes_grid(self):
        names = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
                 "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]
        imgs = [np.full((10, 16, 3), i / 6.0, np.float32)
                for i in range(6)]
        out = vis.tile_cameras(imgs, names, "nuscenes")
        assert out.shape == (20, 48, 3)
        # CAM_FRONT (value 1/6) sits top middle; CAM_BACK (4/6) bottom middle
        assert np.allclose(out[:10, 16:32], 1 / 6.0)
        assert np.allclose(out[10:, 16:32], 4 / 6.0)

    def test_waymo_side_cam_bottom_aligned(self):
        names = ["left_camera", "front_left_camera", "front_camera",
                 "front_right_camera", "right_camera"]
        imgs = [np.ones((6, 16, 3), np.float32),    # short side cam
                np.ones((10, 16, 3), np.float32),
                np.ones((10, 16, 3), np.float32),
                np.ones((10, 16, 3), np.float32),
                np.ones((6, 16, 3), np.float32)]
        out = vis.tile_cameras(imgs, names, "waymo")
        assert out.shape == (10, 80, 3)
        assert np.allclose(out[:4, :16], 0.0)       # empty above side cam
        assert np.allclose(out[4:, :16], 1.0)       # bottom-aligned

    def test_unknown_dataset_falls_back_to_row(self):
        out = vis.tile_cameras([np.ones((4, 4, 3))] * 3,
                               ["a", "b", "c"], None)
        assert out.shape == (4, 12, 3)


def test_error_map_shape_and_range():
    pred = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    em = vis.error_map(pred, np.zeros_like(pred))
    assert em.shape == (8, 8, 3)
    assert em.min() >= 0 and em.max() <= 1


def test_snapshot_grid_and_png(tmp_path):
    h, w = 8, 12
    r = {"gt_rgbs": [np.random.rand(h, w, 3).astype(np.float32)] * 2,
         "rgbs": [np.random.rand(h, w, 3).astype(np.float32)] * 2,
         "depths": [np.random.rand(h, w).astype(np.float32) * 50] * 2}
    grid = vis.snapshot_grid(r, ["cam_left", "cam_right"], "kitti")
    assert grid.shape == (4 * h, 2 * w, 3)          # gt/rgb/depth/error rows
    path = os.path.join(tmp_path, "snap.png")
    vis.save_png(grid, path)
    assert os.path.getsize(path) > 0


def test_tb_writer(tmp_path):
    w = tb_lib.TBWriter(str(tmp_path))
    w.scalars({"loss": 1.0, "psnr": 20.0}, 0)
    w.image("img", np.random.rand(4, 4, 3), 0)
    w.close()
    if w.active:   # tensorboard installed in this env
        assert any(f.startswith("events") for f in os.listdir(tmp_path))
    # no-op writer never raises
    w2 = tb_lib.TBWriter(None)
    w2.scalars({"x": 1}, 0)
    w2.close()


def test_draw_boxes_overlay():
    """3-D wireframe box projection + behind-camera clipping
    (reference utils/visualization.py bbox drawing)."""
    import numpy as np

    from bilateral_driving_tpu.utils import visualization as vz

    img = np.zeros((60, 80, 3), np.float32)
    K = np.array([[60.0, 0, 40], [0, 60.0, 30], [0, 0, 1]])
    o2w = np.eye(4)
    o2w[:3, 3] = [0, 0, 6]
    out = vz.draw_boxes(img, [o2w], [[2.0, 1.5, 1.2]], np.eye(4), K)
    assert (out.sum(-1) > 0).sum() > 50          # wireframe painted
    assert img.sum() == 0                         # input untouched
    # fully behind the camera -> nothing drawn, no crash
    o2w_back = np.eye(4)
    o2w_back[:3, 3] = [0, 0, -6]
    out2 = vz.draw_boxes(img, [o2w_back], [[2.0, 1.5, 1.2]], np.eye(4), K)
    assert out2.sum() == 0
