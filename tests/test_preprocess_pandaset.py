"""PandaSet -> drivestudio-layout converter on a synthetic raw fixture
(preprocess/pandaset.py; reference pandaset_preprocess.py semantics) plus
the per-frame-calib data-layer round-trip (VERDICT r2 item 9)."""
import json
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from bilateral_driving_tpu.preprocess import pandaset as pp

SEQ = "011"
N_FRAMES = 3
W, H = 96, 64
FX, CX, CY = 100.0, 48.0, 32.0

# ego/world axes: x east, y north, z up; front camera looks +y (north):
# cam x -> world x, cam y -> world -z, cam z -> world +y
CAM_HEADING = {"w": np.sqrt(0.5), "x": -np.sqrt(0.5), "y": 0.0, "z": 0.0}


@pytest.fixture
def raw_pandaset(tmp_path):
    root = tmp_path / "pandaset"
    seq = root / SEQ
    rng = np.random.default_rng(0)
    lidar_dir = seq / "lidar"
    ann_dir = seq / "annotations" / "cuboids"
    lidar_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)

    lidar_poses = []
    for t in range(N_FRAMES):
        ego_y = 2.0 * t                      # driving north
        lidar_poses.append({
            "position": {"x": 0.0, "y": ego_y, "z": 1.8},
            "heading": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
        })
        # world points ahead of the ego
        pts_w = np.column_stack([
            rng.uniform(-5, 5, 80), ego_y + rng.uniform(3, 30, 80),
            rng.uniform(0, 3, 80)])
        df = pd.DataFrame({
            "x": pts_w[:, 0], "y": pts_w[:, 1], "z": pts_w[:, 2],
            "i": rng.uniform(0, 255, 80), "t": np.full(80, 1.5e9),
            "d": np.zeros(80, int)})
        df.to_pickle(lidar_dir / f"{t:02d}.pkl.gz")

        # one moving car ahead (world frame), one stationary car, and a
        # pedestrian; car sibling pair to dedup
        rows = [
            {"uuid": "car-a", "label": "Car", "yaw": 0.3,
             "stationary": False, "camera_used": -1,
             "position.x": 0.0, "position.y": ego_y + 10.0 + t,
             "position.z": 0.9, "dimensions.x": 4.5, "dimensions.y": 2.0,
             "dimensions.z": 1.5, "cuboids.sensor_id": -1,
             "cuboids.sibling_id": "-"},
            {"uuid": "car-b", "label": "Car", "yaw": 0.0,
             "stationary": True, "camera_used": -1,
             "position.x": 3.0, "position.y": ego_y + 12.0,
             "position.z": 0.9, "dimensions.x": 4.0, "dimensions.y": 2.0,
             "dimensions.z": 1.5, "cuboids.sensor_id": -1,
             "cuboids.sibling_id": "-"},
            {"uuid": "ped-a", "label": "Pedestrian", "yaw": 0.0,
             "stationary": False, "camera_used": -1,
             "position.x": -2.0, "position.y": ego_y + 8.0,
             "position.z": 0.9, "dimensions.x": 0.6, "dimensions.y": 0.6,
             "dimensions.z": 1.8, "cuboids.sensor_id": -1,
             "cuboids.sibling_id": "-"},
            # front-lidar sibling duplicate of car-a with a shorter track
            {"uuid": f"car-a-front-{t}", "label": "Car", "yaw": 0.3,
             "stationary": False, "camera_used": -1,
             "position.x": 0.0, "position.y": ego_y + 10.0 + t,
             "position.z": 0.9, "dimensions.x": 4.5, "dimensions.y": 2.0,
             "dimensions.z": 1.5, "cuboids.sensor_id": 1,
             "cuboids.sibling_id": "car-a"},
        ]
        pd.DataFrame(rows).to_pickle(ann_dir / f"{t:02d}.pkl.gz")
    json.dump(lidar_poses, open(lidar_dir / "poses.json", "w"))

    for cam in pp.CAM_LIST:
        cdir = seq / "camera" / cam
        cdir.mkdir(parents=True)
        poses = []
        for t in range(N_FRAMES):
            Image.fromarray(rng.integers(0, 255, (H, W, 3),
                                         dtype=np.uint8)).save(
                cdir / f"{t:02d}.jpg")
            poses.append({
                "position": {"x": 0.0, "y": 2.0 * t + 0.5, "z": 1.6},
                "heading": dict(CAM_HEADING),
            })
        json.dump(poses, open(cdir / "poses.json", "w"))
        json.dump({"fx": FX, "fy": FX, "cx": CX, "cy": CY},
                  open(cdir / "intrinsics.json", "w"))
    return str(root)


def test_pandaset_convert_and_load(raw_pandaset, tmp_path):
    out_root = str(tmp_path / "processed")
    conv = pp.PandasetConverter(raw_pandaset, out_root)
    out = conv.convert_scene(SEQ, out_name="000")

    # per-frame cam-to-world extrinsics (per_frame calib style)
    e10 = np.loadtxt(os.path.join(out, "extrinsics", "001_0.txt"))
    np.testing.assert_allclose(e10[:3, 3], [0.0, 2.5, 1.6], atol=1e-9)
    # cam z (view dir) points +y world
    np.testing.assert_allclose(e10[:3, 2], [0, 1, 0], atol=1e-9)
    intr = np.loadtxt(os.path.join(out, "intrinsics", "0.txt"))
    np.testing.assert_allclose(intr[:4], [FX, FX, CX, CY])

    # ego pose == lidar pose
    p1 = np.loadtxt(os.path.join(out, "ego_pose", "001.txt"))
    np.testing.assert_allclose(p1[:3, 3], [0, 2.0, 1.8])

    # lidar: (N, 5), re-expressed in the ego frame (x unchanged, y shifted)
    rec = np.fromfile(os.path.join(out, "lidar", "001.bin"),
                      np.float32).reshape(-1, 5)
    assert rec.shape == (80, 5)
    assert rec[:, 1].min() > 0          # points ahead after ego-frame shift

    # objects: sibling duplicates merged into car-a, stationary car-b
    # dropped, pedestrian kept; cuboids already in world frame
    info = json.load(open(os.path.join(out, "instances",
                                       "instances_info.json")))
    names = sorted(v["class_name"] for v in info.values())
    assert names == ["Car", "Pedestrian"]
    car = next(v for v in info.values() if v["class_name"] == "Car")
    assert car["id"] == "car-a"
    ann = car["frame_annotations"]
    assert ann["frame_idx"] == [0, 1, 2]
    np.testing.assert_allclose(ann["box_size"][0], [4.5, 2.0, 1.5])
    np.testing.assert_allclose(np.array(ann["obj_to_world"][1])[:3, 3],
                               [0.0, 13.0, 0.9])
    frame_inst = json.load(open(os.path.join(out, "instances",
                                             "frame_instances.json")))
    assert all(len(v) == 2 for v in frame_inst.values())

    # dynamic masks: car ahead of the front camera -> vehicle mask nonzero;
    # stationary car-b excluded from masks entirely
    veh = np.asarray(Image.open(os.path.join(
        out, "dynamic_masks", "vehicle", "000_0.png")))
    hum = np.asarray(Image.open(os.path.join(
        out, "dynamic_masks", "human", "000_0.png")))
    assert (veh > 0).sum() > 0 and (hum > 0).sum() > 0

    # data-layer round-trip: per-frame calib + xyzil lidar + ego anchor
    from bilateral_driving_tpu.data import scene as scene_lib

    data = scene_lib.load_scene(out, cameras=(0,), dataset="pandaset",
                                compute_depth_maps=True)
    assert data.num_frames == N_FRAMES
    assert set(data.instances.node_types) == {"RigidNodes", "SMPLNodes"}
    assert (data.lidar_depth_maps > 0).sum() > 0
