"""Argoverse-2 and nuPlan converters on synthetic raw fixtures
(preprocess/argoverse.py, preprocess/nuplan.py) + loader round-trips
(VERDICT r2 items 5/9)."""
import json
import os
import sqlite3

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from bilateral_driving_tpu.preprocess import argoverse as av
from bilateral_driving_tpu.preprocess import nuplan as npl

W, H = 96, 64
FX, CX, CY = 100.0, 48.0, 32.0

# cam->ego: ego x fwd / y left / z up; camera CV frame z fwd / x right /
# y down. Front camera looks +x(ego).
R_C2E_FRONT = np.array([[0.0, 0.0, 1.0],
                        [-1.0, 0.0, 0.0],
                        [0.0, -1.0, 0.0]])


def mat_to_quat_wxyz(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return w, x, y, z


# ---------------------------------------------------------------------------
# Argoverse 2
# ---------------------------------------------------------------------------

LOG = "0abc"
N_SWEEPS = 3
LIDAR_DT = 100_000_000                     # 10 Hz in ns


@pytest.fixture
def raw_av2(tmp_path):
    root = tmp_path / "av2"
    log = root / LOG
    rng = np.random.default_rng(0)
    (log / "calibration").mkdir(parents=True)

    qf = mat_to_quat_wxyz(R_C2E_FRONT)
    intr_rows, ext_rows = [], []
    for cam in av.CAM_LIST:
        intr_rows.append({"sensor_name": cam, "fx_px": FX, "fy_px": FX,
                          "cx_px": CX, "cy_px": CY, "k1": 0.0, "k2": 0.0,
                          "k3": 0.0, "width_px": W, "height_px": H})
        ext_rows.append({"sensor_name": cam, "qw": qf[0], "qx": qf[1],
                         "qy": qf[2], "qz": qf[3], "tx_m": 1.5, "ty_m": 0.0,
                         "tz_m": 1.4})
    pd.DataFrame(intr_rows).to_feather(log / "calibration"
                                       / "intrinsics.feather")
    pd.DataFrame(ext_rows).to_feather(
        log / "calibration" / "egovehicle_SE3_sensor.feather")

    pose_rows, ann_rows = [], []
    lidar_dir = log / "sensors" / "lidar"
    lidar_dir.mkdir(parents=True)
    for t in range(N_SWEEPS):
        ts = 1_000_000_000 + t * LIDAR_DT
        # ego drives +x at 2 m per sweep; poses at lidar AND camera times
        for off in (0, LIDAR_DT // 4):
            pose_rows.append({"timestamp_ns": ts + off,
                              "qw": 1.0, "qx": 0.0, "qy": 0.0, "qz": 0.0,
                              "tx_m": 2.0 * t + off / LIDAR_DT * 2.0,
                              "ty_m": 0.0, "tz_m": 0.0})
        pts = np.column_stack([rng.uniform(3, 30, 70),
                               rng.uniform(-5, 5, 70),
                               rng.uniform(0, 3, 70),
                               rng.uniform(0, 255, 70)])
        pd.DataFrame(pts, columns=["x", "y", "z", "intensity"]).to_feather(
            lidar_dir / f"{ts}.feather")
        for uid, cat, x0, speed in (("tr-1", "REGULAR_VEHICLE", 12.0, 1.0),
                                    ("tr-2", "PEDESTRIAN", 8.0, 0.2),
                                    ("tr-3", "BOLLARD", 6.0, 0.0)):
            qw = (1.0, 0.0, 0.0, 0.0)
            ann_rows.append({
                "timestamp_ns": ts, "track_uuid": uid, "category": cat,
                "qw": qw[0], "qx": qw[1], "qy": qw[2], "qz": qw[3],
                "tx_m": x0 + speed * t, "ty_m": 0.5, "tz_m": 0.8,
                "length_m": 4.0 if cat == "REGULAR_VEHICLE" else 0.7,
                "width_m": 1.8 if cat == "REGULAR_VEHICLE" else 0.7,
                "height_m": 1.5, "num_interior_pts": 10})
        for cam in av.CAM_LIST:
            cdir = log / "sensors" / "cameras" / cam
            cdir.mkdir(parents=True, exist_ok=True)
            img_ts = ts + LIDAR_DT // 4     # 25 ms offset, within tolerance
            Image.fromarray(rng.integers(0, 255, (H, W, 3),
                                         dtype=np.uint8)).save(
                cdir / f"{img_ts}.jpg")
    pd.DataFrame(pose_rows).to_feather(log / "city_SE3_egovehicle.feather")
    pd.DataFrame(ann_rows).to_feather(log / "annotations.feather")
    return str(root)


def test_av2_convert_and_load(raw_av2, tmp_path):
    out = av.ArgoverseConverter(raw_av2, str(tmp_path / "p")).convert_scene(
        LOG, out_name="000")
    # all sweeps synchronized
    assert len(os.listdir(os.path.join(out, "ego_pose"))) == N_SWEEPS
    # static cam-to-ego extrinsics
    e0 = np.loadtxt(os.path.join(out, "extrinsics", "0.txt"))
    np.testing.assert_allclose(e0[:3, :3], R_C2E_FRONT, atol=1e-9)
    np.testing.assert_allclose(e0[:3, 3], [1.5, 0, 1.4])
    # ego advances 2 m per frame
    p0 = np.loadtxt(os.path.join(out, "ego_pose", "000.txt"))
    p2 = np.loadtxt(os.path.join(out, "ego_pose", "002.txt"))
    np.testing.assert_allclose(p2[:3, 3] - p0[:3, 3], [4, 0, 0], atol=1e-9)
    # lidar (N, 4) xyzi
    pts = np.fromfile(os.path.join(out, "lidar", "000.bin"),
                      np.float32).reshape(-1, 4)
    assert pts.shape == (70, 4)
    # objects: vehicle + pedestrian dynamic, BOLLARD excluded by class list
    info = json.load(open(os.path.join(out, "instances",
                                       "instances_info.json")))
    assert sorted(v["class_name"] for v in info.values()) == [
        "PEDESTRIAN", "REGULAR_VEHICLE"]
    veh = next(v for v in info.values()
               if v["class_name"] == "REGULAR_VEHICLE")
    np.testing.assert_allclose(veh["frame_annotations"]["box_size"][0],
                               [4.0, 1.8, 1.5])
    # world x = ego x (2t) + box x (12 + t)
    o2w1 = np.array(veh["frame_annotations"]["obj_to_world"][1])
    np.testing.assert_allclose(o2w1[0, 3], 2.0 + 13.0, atol=1e-6)
    # vehicle ahead of the front cam -> vehicle mask nonzero
    m = np.asarray(Image.open(os.path.join(out, "dynamic_masks", "vehicle",
                                           "000_0.png")))
    assert (m > 0).sum() > 0

    from bilateral_driving_tpu.data import scene as scene_lib
    data = scene_lib.load_scene(out, cameras=(0,), dataset="argoverse",
                                compute_depth_maps=True)
    assert data.num_frames == N_SWEEPS
    assert set(data.instances.node_types) == {"RigidNodes", "SMPLNodes"}
    assert (data.lidar_depth_maps > 0).sum() > 0


# ---------------------------------------------------------------------------
# nuPlan
# ---------------------------------------------------------------------------

NUPLAN_LOG = "log01"


@pytest.fixture
def raw_nuplan(tmp_path):
    root = tmp_path / "nuplan"
    split = root / "nuplan-v1.1" / "splits" / "mini"
    blobs = root / "nuplan-v1.1" / "sensor_blobs"
    split.mkdir(parents=True)
    (blobs / "img").mkdir(parents=True)
    (blobs / "pcd").mkdir(parents=True)
    rng = np.random.default_rng(1)

    con = sqlite3.connect(split / f"{NUPLAN_LOG}.db")
    con.executescript("""
    CREATE TABLE camera (token TEXT, channel TEXT, rotation TEXT,
        translation TEXT, intrinsic TEXT, distortion TEXT);
    CREATE TABLE ego_pose (token TEXT, x REAL, y REAL, z REAL, qw REAL,
        qx REAL, qy REAL, qz REAL, timestamp INTEGER);
    CREATE TABLE lidar_pc (token TEXT, ego_pose_token TEXT, filename TEXT,
        timestamp INTEGER);
    CREATE TABLE image (token TEXT, camera_token TEXT, filename_jpg TEXT,
        timestamp INTEGER);
    CREATE TABLE track (token TEXT, category_token TEXT);
    CREATE TABLE category (token TEXT, name TEXT);
    CREATE TABLE lidar_box (token TEXT, lidar_pc_token TEXT,
        track_token TEXT, x REAL, y REAL, z REAL, width REAL, length REAL,
        height REAL, yaw REAL);
    """)
    qf = mat_to_quat_wxyz(R_C2E_FRONT)
    K = [[FX, 0, CX], [0, FX, CY], [0, 0, 1]]
    for ci, ch in enumerate(npl.CAM_LIST):
        con.execute("INSERT INTO camera VALUES (?,?,?,?,?,?)",
                    (f"cam{ci}", ch, json.dumps(list(qf)),
                     json.dumps([1.5, 0.0, 1.6]), json.dumps(K),
                     json.dumps([0.01, -0.002, 0.0, 0.0, 0.0])))
    con.execute("INSERT INTO category VALUES ('catv', 'vehicle')")
    con.execute("INSERT INTO category VALUES ('catp', 'pedestrian')")
    con.execute("INSERT INTO category VALUES ('catg', 'generic_object')")
    con.execute("INSERT INTO track VALUES ('trk1', 'catv')")
    con.execute("INSERT INTO track VALUES ('trk2', 'catp')")
    con.execute("INSERT INTO track VALUES ('trk3', 'catg')")

    n_pc = 8                              # 20 Hz lidar
    for i in range(n_pc):
        ts = 1_000_000 + i * 50_000       # microseconds
        con.execute("INSERT INTO ego_pose VALUES (?,?,?,?,?,?,?,?,?)",
                    (f"ego{i}", i * 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, ts))
        pcd_name = f"pcd/{i}.pcd"
        con.execute("INSERT INTO lidar_pc VALUES (?,?,?,?)",
                    (f"pc{i}", f"ego{i}", pcd_name, ts))
        # binary PCD blob, 5 fields
        pts = np.column_stack([
            rng.uniform(3, 30, 50), rng.uniform(-5, 5, 50),
            rng.uniform(0, 3, 50), rng.uniform(0, 255, 50),
            rng.integers(0, 32, 50).astype(float)]).astype(np.float32)
        with open(blobs / pcd_name, "wb") as f:
            f.write(b"VERSION .7\nFIELDS x y z intensity ring\n"
                    b"SIZE 4 4 4 4 4\nTYPE F F F F F\nCOUNT 1 1 1 1 1\n"
                    + f"WIDTH {len(pts)}\nHEIGHT 1\n".encode()
                    + b"VIEWPOINT 0 0 0 1 0 0 0\n"
                    + f"POINTS {len(pts)}\nDATA binary\n".encode())
            f.write(pts.tobytes())
        # boxes at every lidar_pc (world frame)
        con.execute("INSERT INTO lidar_box VALUES (?,?,?,?,?,?,?,?,?,?)",
                    (f"b{i}v", f"pc{i}", "trk1", i * 1.0 + 12.0, 0.0, 0.8,
                     1.8, 4.0, 1.5, 0.0))
        con.execute("INSERT INTO lidar_box VALUES (?,?,?,?,?,?,?,?,?,?)",
                    (f"b{i}p", f"pc{i}", "trk2", i * 1.0 + 8.0, 1.0, 0.9,
                     0.7, 0.7, 1.8, 0.0))
        con.execute("INSERT INTO lidar_box VALUES (?,?,?,?,?,?,?,?,?,?)",
                    (f"b{i}g", f"pc{i}", "trk3", 5.0, -2.0, 0.5,
                     1.0, 1.0, 1.0, 0.0))
    # 10 Hz images on even lidar timestamps
    img = Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    for i in range(0, n_pc, 2):
        ts = 1_000_000 + i * 50_000
        for ci in range(len(npl.CAM_LIST)):
            name = f"img/{i}_{ci}.jpg"
            img.save(blobs / name)
            con.execute("INSERT INTO image VALUES (?,?,?,?)",
                        (f"im{i}_{ci}", f"cam{ci}", name, ts))
    con.commit()
    con.close()
    return str(root)


def test_nuplan_convert_and_load(raw_nuplan, tmp_path):
    conv = npl.NuplanConverter(raw_nuplan, str(tmp_path / "p"),
                               start_frame_idx=0, max_frames=10)
    out = conv.convert_scene(NUPLAN_LOG, out_name="000")

    # every 2nd lidar_pc, parity aligned with the 10 Hz images -> 4 frames
    n = len(os.listdir(os.path.join(out, "ego_pose")))
    assert n == 4
    # ego advances 2 m per FRAME (1 m per lidar_pc, stride 2)
    p0 = np.loadtxt(os.path.join(out, "ego_pose", "000.txt"))
    p1 = np.loadtxt(os.path.join(out, "ego_pose", "001.txt"))
    np.testing.assert_allclose(p1[:3, 3] - p0[:3, 3], [2, 0, 0])
    # distortion carried in the intrinsics 9-vector
    intr = np.loadtxt(os.path.join(out, "intrinsics", "0.txt"))
    np.testing.assert_allclose(intr[:6], [FX, FX, CX, CY, 0.01, -0.002])
    # lidar: (N, 6) after lidar_id padding
    pts = np.fromfile(os.path.join(out, "lidar", "000.bin"),
                      np.float32).reshape(-1, 6)
    assert pts.shape == (50, 6)
    # objects: vehicle + pedestrian; generic_object excluded
    info = json.load(open(os.path.join(out, "instances",
                                       "instances_info.json")))
    assert sorted(v["class_name"] for v in info.values()) == [
        "pedestrian", "vehicle"]
    veh = next(v for v in info.values() if v["class_name"] == "vehicle")
    np.testing.assert_allclose(veh["frame_annotations"]["box_size"][0],
                               [4.0, 1.8, 1.5])
    m = np.asarray(Image.open(os.path.join(out, "dynamic_masks", "vehicle",
                                           "000_0.png")))
    assert (m > 0).sum() > 0

    from bilateral_driving_tpu.data import scene as scene_lib
    data = scene_lib.load_scene(out, cameras=(0,), dataset="nuplan",
                                compute_depth_maps=True)
    assert data.num_frames == 4
    assert set(data.instances.node_types) == {"RigidNodes", "SMPLNodes"}
    assert (data.lidar_depth_maps > 0).sum() > 0


def test_pcd_roundtrip_ascii(tmp_path):
    p = tmp_path / "a.pcd"
    pts = np.arange(12, dtype=np.float32).reshape(3, 4)
    with open(p, "wb") as f:
        f.write(b"FIELDS x y z intensity\nSIZE 4 4 4 4\nPOINTS 3\n"
                b"DATA ascii\n")
        np.savetxt(f, pts)
    np.testing.assert_allclose(npl.read_pcd(str(p)), pts)
