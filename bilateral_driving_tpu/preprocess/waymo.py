"""Raw Waymo Open Dataset -> drivestudio-layout converter.

Counterpart of the reference's `WaymoProcessor`
(project/datasets/waymo/waymo_preprocess.py:54-538). Waymo ships scenes as
TFRecord files of `waymo_open_dataset.dataset_pb2.Frame` protos; the TFRecord
*framing* is parsed here in pure python (no tensorflow), but decoding the
Frame message requires the `waymo_open_dataset` protobuf schema — an external
pip package that (like the raw data itself) is not part of this image. The
converter is therefore runnable exactly when the data is: install
`waymo-open-dataset-tf-*` wherever the TFRecords live.

Output layout matches data/scene.py's waymo flavor (data/meta.py): ego_pose/
per-frame vehicle pose, per-camera static extrinsics, images keyed
{frame:03d}_{cam}.jpg with cameras ordered FRONT, FRONT_LEFT, FRONT_RIGHT,
SIDE_LEFT, SIDE_RIGHT.
"""
from __future__ import annotations

import os
import struct
from typing import Iterator, List

import numpy as np

CAMERA_ORDER = [1, 2, 3, 4, 5]   # FRONT, FRONT_LEFT, FRONT_RIGHT, SIDE_L/R
# waymo label types -> drivestudio class names (waymo_preprocess save_objects)
LABEL_TO_CLASS = {1: "Car", 2: "Pedestrian", 4: "Cyclist"}


def read_tfrecord(path: str) -> Iterator[bytes]:
    """Iterate raw records of a TFRecord file (pure python: 8-byte LE length,
    4-byte length CRC, payload, 4-byte payload CRC)."""
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                return
            (length,) = struct.unpack("<Q", hdr)
            f.read(4)                      # length crc (unchecked)
            payload = f.read(length)
            f.read(4)                      # data crc (unchecked)
            yield payload


def _require_proto():
    try:
        from waymo_open_dataset import dataset_pb2  # noqa: F401
        return dataset_pb2
    except ImportError as e:
        raise RuntimeError(
            "decoding Waymo Frame protos needs the `waymo_open_dataset` "
            "package (pip install waymo-open-dataset-tf-2-11-0); the raw "
            "TFRecords and this schema live together — run the converter "
            "in that environment") from e


def convert_scene(data_root: str, target_dir: str, scene_idx: int,
                  process_keys=("images", "calib", "lidar", "objects")
                  ) -> str:
    """Convert the scene_idx-th TFRecord under data_root."""
    dataset_pb2 = _require_proto()
    files = sorted(f for f in os.listdir(data_root)
                   if f.endswith(".tfrecord"))
    path = os.path.join(data_root, files[scene_idx])
    out = os.path.join(target_dir, f"{scene_idx:03d}")
    keys = set(process_keys)
    for sub in ("images", "extrinsics", "intrinsics", "ego_pose", "lidar",
                "instances"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)

    instances: dict = {}
    frame_instances: dict = {}
    for fi, rec in enumerate(read_tfrecord(path)):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(rec)
        v2w = np.array(frame.pose.transform, np.float64).reshape(4, 4)
        np.savetxt(os.path.join(out, "ego_pose", f"{fi:03d}.txt"), v2w)
        if "images" in keys or "calib" in keys:
            _save_frame_cameras(frame, v2w, fi, out, keys)
        if "objects" in keys:
            _collect_frame_objects(frame, v2w, fi, instances,
                                   frame_instances)

    if "objects" in keys:
        import json

        with open(os.path.join(out, "instances",
                               "instances_info.json"), "w") as f:
            json.dump(instances, f)
        with open(os.path.join(out, "instances",
                               "frame_instances.json"), "w") as f:
            json.dump(frame_instances, f)
    return out


def _save_frame_cameras(frame, v2w, fi, out, keys):
    for ci, cam_id in enumerate(CAMERA_ORDER):
        img = next((im for im in frame.images if im.name == cam_id), None)
        calib = next((c for c in frame.context.camera_calibrations
                      if c.name == cam_id), None)
        if img is None or calib is None:
            continue
        if "images" in keys:
            with open(os.path.join(out, "images",
                                   f"{fi:03d}_{ci}.jpg"), "wb") as f:
                f.write(img.image)
        if "calib" in keys:
            fx, fy, cx, cy = calib.intrinsic[0:4]
            k1, k2, p1, p2, k3 = calib.intrinsic[4:9]
            np.savetxt(os.path.join(out, "intrinsics", f"{ci}.txt"),
                       np.array([fx, fy, cx, cy, k1, k2, p1, p2, k3]))
            # waymo camera frame is x-forward; convert to OpenCV-style
            # cam-to-vehicle then store cam-to-world per frame
            cam2v = np.array(calib.extrinsic.transform,
                             np.float64).reshape(4, 4)
            opencv2cam = np.array([[0, 0, 1, 0], [-1, 0, 0, 0],
                                   [0, -1, 0, 0], [0, 0, 0, 1]], np.float64)
            np.savetxt(os.path.join(out, "extrinsics",
                                    f"{fi:03d}_{ci}.txt"),
                       v2w @ cam2v @ opencv2cam)


def _collect_frame_objects(frame, v2w, fi, instances, frame_instances):
    ids: List[str] = []
    for label in frame.laser_labels:
        if label.type not in LABEL_TO_CLASS:
            continue
        b = label.box
        heading = float(b.heading)
        o2v = np.eye(4)
        c, s = np.cos(heading), np.sin(heading)
        o2v[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        o2v[:3, 3] = [b.center_x, b.center_y, b.center_z]
        o2w = v2w @ o2v
        rec = instances.setdefault(label.id, {
            "id": label.id, "class_name": LABEL_TO_CLASS[label.type],
            "frame_annotations": {"frame_idx": [], "obj_to_world": [],
                                  "box_size": []}})
        ann = rec["frame_annotations"]
        ann["frame_idx"].append(fi)
        ann["obj_to_world"].append(o2w.tolist())
        ann["box_size"].append([b.length, b.width, b.height])
        ids.append(label.id)
    frame_instances[fi] = ids
