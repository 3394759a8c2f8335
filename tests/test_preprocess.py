"""Offline preprocessing: raw nuScenes tables -> drivestudio layout -> loader.

Builds a minimal raw nuScenes scene (tables + jpg + pcd.bin) on disk, runs
the devkit-free converter, and loads the result through data/scene.py —
end-to-end ingestion including box interpolation, dynamic masks, and the
lidar path (reference pipeline: nuscenes_preprocess.py convert_one_interp)."""
import json
import os

import numpy as np
import pytest

from bilateral_driving_tpu.preprocess import nuscenes as nsc


def _quat_wxyz_z(theta):
    return [float(np.cos(theta / 2)), 0.0, 0.0, float(np.sin(theta / 2))]


def _quat_from_mat(R):
    """wxyz quaternion of a rotation matrix (w > 0 branch is enough here)."""
    w = np.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12)) / 2
    return [float(w), float((R[2, 1] - R[1, 2]) / (4 * w)),
            float((R[0, 2] - R[2, 0]) / (4 * w)),
            float((R[1, 0] - R[0, 1]) / (4 * w))]


# OpenCV camera (x right, y down, z forward) looking along ego +x:
# cam z -> ego x, cam x -> ego -y, cam y -> ego -z
FRONT_CAM_R = np.array([[0.0, 0.0, 1.0],
                        [-1.0, 0.0, 0.0],
                        [0.0, -1.0, 0.0]])


@pytest.fixture
def raw_scene(tmp_path):
    """2 keyframes (0.5 s apart), CAM_FRONT + LIDAR_TOP with sweeps, one car
    annotated at both keyframes."""
    from PIL import Image

    root = tmp_path / "raw"
    tab = root / "v1.0-mini"
    tab.mkdir(parents=True)
    (root / "samples" / "CAM_FRONT").mkdir(parents=True)
    (root / "sweeps" / "CAM_FRONT").mkdir(parents=True)
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)
    (root / "sweeps" / "LIDAR_TOP").mkdir(parents=True)

    t0 = 1_000_000
    key_ts = [t0, t0 + 500_000]

    scene = [{"token": "sc0", "name": "scene-0001",
              "first_sample_token": "sa0", "last_sample_token": "sa1"}]
    sample = [
        {"token": "sa0", "timestamp": key_ts[0], "scene_token": "sc0",
         "prev": "", "next": "sa1"},
        {"token": "sa1", "timestamp": key_ts[1], "scene_token": "sc0",
         "prev": "sa0", "next": ""},
    ]
    sensor = [
        {"token": "se_cam", "channel": "CAM_FRONT", "modality": "camera"},
        {"token": "se_lid", "channel": "LIDAR_TOP", "modality": "lidar"},
    ]
    calibrated_sensor = [
        {"token": "cs_cam", "sensor_token": "se_cam",
         "translation": [1.5, 0.0, 1.6],
         "rotation": _quat_from_mat(FRONT_CAM_R),
         "camera_intrinsic": [[100.0, 0, 80], [0, 100.0, 45], [0, 0, 1]]},
        {"token": "cs_lid", "sensor_token": "se_lid",
         "translation": [1.0, 0.0, 1.8], "rotation": [1, 0, 0, 0],
         "camera_intrinsic": []},
    ]

    ego_pose, sample_data = [], []
    cam_stamps = np.arange(t0, key_ts[1] + 1, 100_000)  # 10 Hz sweeps
    for i, ts in enumerate(cam_stamps):
        ep = {"token": f"ep_c{i}", "timestamp": int(ts),
              "translation": [float(ts - t0) * 1e-5, 0.0, 0.0],
              "rotation": [1, 0, 0, 0]}
        ego_pose.append(ep)
        fn = (f"samples/CAM_FRONT/img{i}.jpg" if ts in key_ts
              else f"sweeps/CAM_FRONT/img{i}.jpg")
        img = np.full((90, 160, 3), (i * 30) % 255, np.uint8)
        Image.fromarray(img).save(str(root / fn))
        sample_data.append({
            "token": f"sd_c{i}",
            "sample_token": "sa0" if ts < key_ts[1] else "sa1",
            "ego_pose_token": ep["token"],
            "calibrated_sensor_token": "cs_cam",
            "timestamp": int(ts), "fileformat": "jpg",
            "is_key_frame": bool(ts in key_ts), "filename": fn,
            "height": 90, "width": 160, "prev": "", "next": ""})
    for i, ts in enumerate(cam_stamps):
        ep = {"token": f"ep_l{i}", "timestamp": int(ts),
              "translation": [float(ts - t0) * 1e-5, 0.0, 0.0],
              "rotation": [1, 0, 0, 0]}
        ego_pose.append(ep)
        fn = (f"samples/LIDAR_TOP/pc{i}.pcd.bin" if ts in key_ts
              else f"sweeps/LIDAR_TOP/pc{i}.pcd.bin")
        pts = np.random.RandomState(i).rand(50, 5).astype(np.float32) * 10
        pts.tofile(str(root / fn))
        sample_data.append({
            "token": f"sd_l{i}",
            "sample_token": "sa0" if ts < key_ts[1] else "sa1",
            "ego_pose_token": ep["token"],
            "calibrated_sensor_token": "cs_lid",
            "timestamp": int(ts), "fileformat": "pcd",
            "is_key_frame": bool(ts in key_ts), "filename": fn,
            "prev": "", "next": ""})

    category = [{"token": "cat_car", "name": "vehicle.car"}]
    instance = [{"token": "in0", "category_token": "cat_car",
                 "nbr_annotations": 2}]
    sample_annotation = [
        {"token": "an0", "sample_token": "sa0", "instance_token": "in0",
         "translation": [10.0, 2.0, 0.5], "rotation": _quat_wxyz_z(0.0),
         "size": [2.0, 4.5, 1.6], "prev": "", "next": "an1"},
        {"token": "an1", "sample_token": "sa1", "instance_token": "in0",
         "translation": [10.0, 7.0, 0.5],
         "rotation": _quat_wxyz_z(np.pi / 4),
         "size": [2.0, 4.5, 1.6], "prev": "an0", "next": ""},
    ]

    for name, rows in [("scene", scene), ("sample", sample),
                       ("sample_data", sample_data),
                       ("ego_pose", ego_pose),
                       ("calibrated_sensor", calibrated_sensor),
                       ("sensor", sensor),
                       ("sample_annotation", sample_annotation),
                       ("instance", instance), ("category", category)]:
        with open(tab / f"{name}.json", "w") as f:
            json.dump(rows, f)
    return str(root)


def test_convert_and_load(raw_scene, tmp_path):
    out_root = str(tmp_path / "processed")
    conv = nsc.NuScenesConverter(raw_scene, out_root,
                                 cameras=["CAM_FRONT"])
    out = conv.convert_scene(0)

    # layout exists: 6 interpolated frames (5 per interval + final keyframe)
    n_frames = 6
    for t in range(n_frames):
        assert os.path.exists(os.path.join(out, "images", f"{t:03d}_0.jpg"))
        assert os.path.exists(os.path.join(out, "extrinsics",
                                           f"{t:03d}_0.txt"))
        assert os.path.exists(os.path.join(out, "lidar", f"{t:03d}.bin"))
        assert os.path.exists(os.path.join(out, "lidar_pose",
                                           f"{t:03d}.txt"))
        for sub in ("all", "human", "vehicle"):
            assert os.path.exists(os.path.join(
                out, "dynamic_masks", sub, f"{t:03d}_0.png"))
    intr = np.loadtxt(os.path.join(out, "intrinsics", "0.txt"))
    np.testing.assert_allclose(intr, [100.0, 100.0, 80.0, 45.0])

    # extrinsics: ego translated along x, camera offset applied
    e0 = np.loadtxt(os.path.join(out, "extrinsics", "000_0.txt"))
    np.testing.assert_allclose(e0[:3, 3], [1.5, 0.0, 1.6], atol=1e-6)

    # lidar bins are (N, 4)
    pts = np.fromfile(os.path.join(out, "lidar", "000.bin"),
                      np.float32).reshape(-1, 4)
    assert pts.shape == (50, 4)

    # instances: one car with interpolated track covering all frames
    with open(os.path.join(out, "instances", "instances_info.json")) as f:
        info = json.load(f)
    assert len(info) == 1
    (meta,) = info.values()
    assert meta["class_name"] == "vehicle.car"
    ann = meta["frame_annotations"]
    assert ann["frame_idx"] == list(range(n_frames))
    y0 = ann["obj_to_world"][0][1][3]
    y_mid = ann["obj_to_world"][3][1][3]
    y1 = ann["obj_to_world"][5][1][3]
    assert y0 == pytest.approx(2.0, abs=1e-6)
    assert y1 == pytest.approx(7.0, abs=1e-6)
    assert y0 < y_mid < y1          # interpolation is monotone
    # box_size converted (w, l, h) -> (l, w, h)
    np.testing.assert_allclose(ann["box_size"][0], [4.5, 2.0, 1.6])

    # dynamic mask of the car is non-empty in at least one frame
    from PIL import Image
    total = 0
    for t in range(n_frames):
        m = np.asarray(Image.open(os.path.join(
            out, "dynamic_masks", "vehicle", f"{t:03d}_0.png")))
        total += int((m > 0).sum())
    assert total > 0

    # loads through the data layer end to end
    from bilateral_driving_tpu.data import scene as scene_lib

    data = scene_lib.load_scene(out, cameras=(0,), dataset=None,
                                compute_depth_maps=True)
    assert data.num_frames == n_frames
    assert data.num_cams == 1
    assert data.images.shape[0] == n_frames
    assert data.instances is not None
    assert data.instances.node_types == ["RigidNodes"]
    assert data.instances.frame_valid.all()
    assert (data.lidar_depth_maps >= 0).all()


def test_interpolated_timestamps():
    ts = nsc.interpolated_timestamps([0, 500, 1000], n=5)
    assert len(ts) == 11
    assert ts[0] == 0 and ts[-1] == 1000
    assert np.all(np.diff(ts) == 100)


def test_convex_hull_and_fill():
    sq = np.array([[1.0, 1.0], [5.0, 1.0], [5.0, 5.0], [1.0, 5.0],
                   [3.0, 3.0]])  # interior point must drop
    hull = nsc._convex_hull(sq)
    assert hull.shape[0] == 4
    m = nsc._fill_convex(hull, 8, 8)
    assert m[3, 3] and not m[0, 0] and not m[7, 7]
    assert 12 <= m.sum() <= 20


def test_tfrecord_framing(tmp_path):
    """Pure-python TFRecord reader round-trips records."""
    import struct

    from bilateral_driving_tpu.preprocess import waymo

    path = tmp_path / "x.tfrecord"
    recs = [b"hello", b"world" * 100]
    with open(path, "wb") as f:
        for r in recs:
            f.write(struct.pack("<Q", len(r)))
            f.write(b"\x00" * 4)
            f.write(r)
            f.write(b"\x00" * 4)
    assert list(waymo.read_tfrecord(str(path))) == recs


class TestWaymoLidarMath:
    """Devkit-free range-image math (preprocess/waymo_lidar.py) against
    analytically-known geometry (reference waymo_utils.py:59-217 semantics)."""

    def test_extract_point_cloud_identity_extrinsic(self):
        from bilateral_driving_tpu.preprocess import waymo_lidar as wl

        H, W = 4, 8
        rng = np.full((H, W), 10.0)
        incl = np.linspace(-0.3, 0.3, H)          # row 0 = lowest? pass as-is
        pts, origins = wl.extract_point_cloud(rng, np.eye(4), incl)
        # every point at range 10 from the origin
        np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 10.0,
                                   rtol=1e-12)
        np.testing.assert_allclose(origins, 0.0)
        # z = r*sin(incl) per row
        np.testing.assert_allclose(
            pts[..., 2], np.broadcast_to(10.0 * np.sin(incl)[:, None],
                                         (H, W)), rtol=1e-12)
        # column 0 is azimuth just under +pi (x ~ -r*cos(incl), y ~ +eps),
        # the devkit's right-to-left sweep
        assert pts[1, 0, 0] < 0 and pts[1, 0, 1] > 0
        # azimuth decreases with column index
        az = np.arctan2(pts[1, :, 1], pts[1, :, 0])
        assert np.all(np.diff(az) < 0)

    def test_extrinsic_translation_and_yaw_correction(self):
        from bilateral_driving_tpu.preprocess import waymo_lidar as wl

        H, W = 2, 360
        rng = np.ones((H, W))
        incl = np.zeros(H)
        yaw = 0.7
        ext = np.eye(4)
        c, s = np.cos(yaw), np.sin(yaw)
        ext[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        ext[:3, 3] = [1.0, 2.0, 3.0]
        pts, origins = wl.extract_point_cloud(rng, ext, incl)
        np.testing.assert_allclose(origins[0, 0], [1.0, 2.0, 3.0])
        # azimuth correction cancels the extrinsic yaw: the set of world
        # directions is the same ring regardless of sensor yaw
        d = pts - origins
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0,
                                   rtol=1e-12)
        ang = np.sort(np.arctan2(d[0, :, 1], d[0, :, 0]))
        np.testing.assert_allclose(np.diff(ang), 2 * np.pi / W, rtol=1e-6)

    def test_pixel_pose_identity_matches_plain(self):
        from bilateral_driving_tpu.preprocess import waymo_lidar as wl

        H, W = 4, 16
        rng = np.random.RandomState(0).uniform(1, 50, (H, W))
        incl = np.linspace(-0.3, 0.2, H)
        ext = np.eye(4)
        plain, _ = wl.extract_point_cloud(rng, ext, incl)
        # pixel pose = frame pose = some rigid transform -> same vehicle pts
        fp = wl.poses_from_6dof(np.array([0.1, -0.2, 0.3, 5.0, -1.0, 2.0]))
        pp = np.broadcast_to(fp, (H, W, 4, 4))
        with_pose, _ = wl.extract_point_cloud(rng, ext, incl,
                                              pixel_pose=pp, frame_pose=fp)
        np.testing.assert_allclose(with_pose, plain, atol=1e-9)

    def test_poses_from_6dof_matches_euler(self):
        from bilateral_driving_tpu.preprocess import waymo_lidar as wl

        r, p, y = 0.3, -0.2, 1.1
        T = wl.poses_from_6dof(np.array([r, p, y, 1, 2, 3]))
        Rx = np.array([[1, 0, 0], [0, np.cos(r), -np.sin(r)],
                       [0, np.sin(r), np.cos(r)]])
        Ry = np.array([[np.cos(p), 0, np.sin(p)], [0, 1, 0],
                       [-np.sin(p), 0, np.cos(p)]])
        Rz = np.array([[np.cos(y), -np.sin(y), 0],
                       [np.sin(y), np.cos(y), 0], [0, 0, 1]])
        np.testing.assert_allclose(T[:3, :3], Rz @ Ry @ Rx, atol=1e-12)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3])

    def test_ground_mask_plane(self):
        from bilateral_driving_tpu.preprocess import waymo_lidar as wl

        rs = np.random.RandomState(1)
        ground = np.column_stack([rs.uniform(-50, 50, 500),
                                  rs.uniform(-50, 50, 500),
                                  rs.normal(0, 0.05, 500)])
        objects = np.column_stack([rs.uniform(-50, 50, 100),
                                   rs.uniform(-50, 50, 100),
                                   rs.uniform(1.0, 3.0, 100)])
        pts = np.vstack([ground, objects])
        m = wl.ground_mask(pts)[:, 0]
        assert m[:500].mean() > 0.98          # ground found
        assert m[500:].mean() < 0.02          # objects kept

    def test_project_to_image_pinhole(self):
        from bilateral_driving_tpu.preprocess import waymo_lidar as wl

        # camera at vehicle origin, x forward (waymo cam axes), no distortion
        intr = np.array([100.0, 100.0, 320.0, 240.0, 0, 0, 0, 0, 0])
        cam2v = np.eye(4)
        pts = np.array([[10.0, 0.0, 0.0],     # on axis -> principal point
                        [10.0, -1.0, 0.0],    # right of axis (y left)
                        [10.0, 0.0, 1.0],     # above axis (z up) -> smaller v
                        [-5.0, 0.0, 0.0]])    # behind
        uvo = wl.project_to_image(pts, cam2v, intr, 640, 480)
        np.testing.assert_allclose(uvo[0, :2], [320.0, 240.0], atol=1e-9)
        assert uvo[1, 0] > 320.0 and abs(uvo[1, 1] - 240) < 1e-9
        assert uvo[2, 1] < 240.0
        assert uvo[3, 2] == 0.0 and uvo[0, 2] == 1.0

    def test_project_radial_distortion_direction(self):
        from bilateral_driving_tpu.preprocess import waymo_lidar as wl

        intr = np.array([100.0, 100.0, 320.0, 240.0, 0.1, 0, 0, 0, 0])
        base = np.array([100.0, 100.0, 320.0, 240.0, 0, 0, 0, 0, 0])
        p = np.array([[10.0, -3.0, 2.0]])
        u0 = wl.project_to_image(p, np.eye(4), base, 640, 480)[0]
        u1 = wl.project_to_image(p, np.eye(4), intr, 640, 480)[0]
        # positive k1 pushes points outward from the principal point
        r0 = np.hypot(u0[0] - 320, u0[1] - 240)
        r1 = np.hypot(u1[0] - 320, u1[1] - 240)
        assert r1 > r0

    def test_box_corners_and_speed_mask(self):
        from bilateral_driving_tpu.preprocess import waymo_lidar as wl

        corners = wl.box_corners_3d([10.0, 0.0, 0.0], [4.0, 2.0, 1.5],
                                    np.pi / 2)
        # heading pi/2 swaps l<->w in x/y extents
        assert np.isclose(corners[:, 0].max() - corners[:, 0].min(), 2.0)
        assert np.isclose(corners[:, 1].max() - corners[:, 1].min(), 4.0)
        assert np.isclose(corners[:, 2].max() - corners[:, 2].min(), 1.5)

        intr = np.array([100.0, 100.0, 320.0, 240.0, 0, 0, 0, 0, 0])
        mask = np.zeros((480, 640), np.float32)
        wl.draw_speed_mask(mask, [(corners, 5.0)], np.eye(4), intr)
        assert mask.max() == 5.0
        assert (mask > 0).sum() > 100
        # behind-camera box skipped entirely
        behind = wl.box_corners_3d([-10.0, 0.0, 0.0], [4.0, 2.0, 1.5], 0.0)
        m2 = np.zeros((480, 640), np.float32)
        wl.draw_speed_mask(m2, [(behind, 5.0)], np.eye(4), intr)
        assert m2.max() == 0.0
