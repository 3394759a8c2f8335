"""Raw nuScenes -> drivestudio-layout converter (offline, host-side numpy).

Counterpart of the reference's `NuScenesProcessor`
(project/datasets/nuscenes/nuscenes_preprocess.py:72-1084) with the same
output contract — the processed directory that data/scene.py (and the
reference's own sourceloaders) consume:

    images/{t:03d}_{cam}.jpg      extrinsics/{t:03d}_{cam}.txt
    intrinsics/{cam}.txt          lidar/{t:03d}.bin   lidar_pose/{t:03d}.txt
    dynamic_masks/{all,human,vehicle}/{t:03d}_{cam}.png
    instances/{instances_info,frame_instances}.json

Unlike the reference it does NOT require the nuscenes-devkit: the raw
v1.0-* table JSONs are joined directly with numpy, so the converter runs in
any environment that has the raw data on disk. Semantics follow the
reference's *interpolated* mode (docs/NuScenes.md:46-53): keyframes are 2 Hz,
boxes/poses are lifted to 10 Hz by interpolating between keyframes and
pairing each target timestamp with the closest camera sweep / lidar sweep.

Sky masks come from the SegFormer tool (preprocess/masks.py), SMPL tracking
from an external 4D-Humans pipeline — both separate stages, as in the
reference (datasets/tools/extract_masks.py, extract_smpl.py).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List

import numpy as np

CAMERAS = ["CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT",
           "CAM_BACK_LEFT", "CAM_BACK_RIGHT", "CAM_BACK"]
LIDAR = "LIDAR_TOP"
HZ_FACTOR = 5                   # 2 Hz keyframes -> 10 Hz targets

# nuScenes category prefixes -> mask class (save_dynamic_mask class_valid)
HUMAN_PREFIXES = ("human.pedestrian",)
VEHICLE_PREFIXES = ("vehicle.car", "vehicle.truck", "vehicle.bus",
                    "vehicle.trailer", "vehicle.construction",
                    "vehicle.emergency")
DYNAMIC_PREFIXES = HUMAN_PREFIXES + VEHICLE_PREFIXES + (
    "vehicle.motorcycle", "vehicle.bicycle")


# --------------------------------------------------------------------------
# raw table access (devkit-free)
# --------------------------------------------------------------------------


class Tables:
    """The raw nuScenes relational tables, indexed by token."""

    NAMES = ["scene", "sample", "sample_data", "ego_pose",
             "calibrated_sensor", "sensor", "sample_annotation", "instance",
             "category"]

    def __init__(self, data_root: str, version: str = "v1.0-mini"):
        self.data_root = data_root
        base = os.path.join(data_root, version)
        self.by_token: Dict[str, Dict[str, dict]] = {}
        self.rows: Dict[str, List[dict]] = {}
        for name in self.NAMES:
            with open(os.path.join(base, f"{name}.json")) as f:
                rows = json.load(f)
            self.rows[name] = rows
            self.by_token[name] = {r["token"]: r for r in rows}

    def get(self, table: str, token: str) -> dict:
        return self.by_token[table][token]

    def scene_samples(self, scene: dict) -> List[dict]:
        """Ordered keyframe samples of a scene."""
        out = []
        tok = scene["first_sample_token"]
        while tok:
            s = self.get("sample", tok)
            out.append(s)
            tok = s["next"]
        return out

    def channel_sample_datas(self, scene: dict, channel: str) -> List[dict]:
        """Every sample_data (keyframes + sweeps) of one sensor channel in a
        scene, time-ordered."""
        sample_tokens = {s["token"] for s in self.scene_samples(scene)}
        out = []
        for sd in self.rows["sample_data"]:
            if sd["sample_token"] not in sample_tokens:
                continue
            sensor = self.get(
                "sensor",
                self.get("calibrated_sensor",
                         sd["calibrated_sensor_token"])["sensor_token"])
            if sensor["channel"] == channel:
                out.append(sd)
        out.sort(key=lambda r: r["timestamp"])
        return out


def _quat_to_mat(q_wxyz) -> np.ndarray:
    w, x, y, z = [float(v) for v in q_wxyz]
    n = max(np.sqrt(w * w + x * x + y * y + z * z), 1e-12)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _pose_mat(translation, rotation_wxyz) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = _quat_to_mat(rotation_wxyz)
    m[:3, 3] = np.asarray(translation, np.float64)
    return m


def _slerp(q0, q1, t: float) -> np.ndarray:
    q0 = np.asarray(q0, np.float64)
    q1 = np.asarray(q1, np.float64)
    q0 = q0 / np.linalg.norm(q0)
    q1 = q1 / np.linalg.norm(q1)
    d = float(np.dot(q0, q1))
    if d < 0:
        q1, d = -q1, -d
    if d > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def interpolated_timestamps(keyframe_ts: List[int],
                            n: int = HZ_FACTOR) -> np.ndarray:
    """2 Hz keyframe timestamps -> 10 Hz targets: n evenly spaced stamps per
    keyframe interval (reference get_interpolated_timestamps,
    nuscenes_preprocess.py:300-322)."""
    out = []
    for a, b in zip(keyframe_ts[:-1], keyframe_ts[1:]):
        out.extend(np.linspace(a, b, n, endpoint=False))
    out.append(keyframe_ts[-1])
    return np.asarray(out, np.int64)


def _closest(sds: List[dict], ts: int) -> dict:
    stamps = np.asarray([sd["timestamp"] for sd in sds], np.int64)
    return sds[int(np.argmin(np.abs(stamps - ts)))]


# --------------------------------------------------------------------------
# converter
# --------------------------------------------------------------------------


class NuScenesConverter:
    def __init__(self, data_root: str, target_dir: str,
                 version: str = "v1.0-mini",
                 cameras: List[str] = CAMERAS,
                 process_keys=("images", "calib", "lidar", "dynamic_masks",
                               "objects")):
        self.tables = Tables(data_root, version)
        self.target = target_dir
        self.cameras = list(cameras)
        self.keys = set(process_keys)

    def convert_scene(self, scene_idx: int) -> str:
        scenes = self.tables.rows["scene"]
        scene = scenes[scene_idx]
        out = os.path.join(self.target, f"{scene_idx:03d}")
        samples = self.tables.scene_samples(scene)
        key_ts = [s["timestamp"] for s in samples]
        ts = interpolated_timestamps(key_ts)

        if "images" in self.keys or "calib" in self.keys:
            self._save_cameras(scene, ts, out)
        if "lidar" in self.keys:
            self._save_lidar(scene, ts, out)
        inst_info, frame_inst = self._build_objects(scene, samples, ts)
        if "objects" in self.keys:
            os.makedirs(os.path.join(out, "instances"), exist_ok=True)
            with open(os.path.join(out, "instances",
                                   "instances_info.json"), "w") as f:
                json.dump(inst_info, f)
            with open(os.path.join(out, "instances",
                                   "frame_instances.json"), "w") as f:
                json.dump(frame_inst, f)
        if "dynamic_masks" in self.keys:
            self._save_dynamic_masks(scene, ts, inst_info, out)
        return out

    # -- cameras ------------------------------------------------------------

    def _save_cameras(self, scene, ts, out):
        t = self.tables
        os.makedirs(os.path.join(out, "images"), exist_ok=True)
        os.makedirs(os.path.join(out, "extrinsics"), exist_ok=True)
        os.makedirs(os.path.join(out, "intrinsics"), exist_ok=True)
        for ci, channel in enumerate(self.cameras):
            sds = t.channel_sample_datas(scene, channel)
            if not sds:
                continue
            calib = t.get("calibrated_sensor",
                          sds[0]["calibrated_sensor_token"])
            K = np.asarray(calib["camera_intrinsic"], np.float64)
            np.savetxt(os.path.join(out, "intrinsics", f"{ci}.txt"),
                       np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]))
            for fi, stamp in enumerate(ts):
                sd = _closest(sds, stamp)
                if "images" in self.keys:
                    src = os.path.join(t.data_root, sd["filename"])
                    dst = os.path.join(out, "images",
                                       f"{fi:03d}_{ci}.jpg")
                    if os.path.exists(src):
                        shutil.copyfile(src, dst)
                ego = _pose_mat(*[t.get("ego_pose", sd["ego_pose_token"])[k]
                                  for k in ("translation", "rotation")])
                cal = t.get("calibrated_sensor",
                            sd["calibrated_sensor_token"])
                cam2ego = _pose_mat(cal["translation"], cal["rotation"])
                np.savetxt(os.path.join(out, "extrinsics",
                                        f"{fi:03d}_{ci}.txt"), ego @ cam2ego)

    # -- lidar --------------------------------------------------------------

    def _save_lidar(self, scene, ts, out):
        t = self.tables
        os.makedirs(os.path.join(out, "lidar"), exist_ok=True)
        os.makedirs(os.path.join(out, "lidar_pose"), exist_ok=True)
        sds = t.channel_sample_datas(scene, LIDAR)
        if not sds:
            return
        for fi, stamp in enumerate(ts):
            sd = _closest(sds, stamp)
            src = os.path.join(t.data_root, sd["filename"])
            if os.path.exists(src):
                # raw .pcd.bin: float32 (x, y, z, intensity, ring); keep xyzi
                raw = np.fromfile(src, np.float32).reshape(-1, 5)
                raw[:, :4].astype(np.float32).tofile(
                    os.path.join(out, "lidar", f"{fi:03d}.bin"))
            ego = _pose_mat(*[t.get("ego_pose", sd["ego_pose_token"])[k]
                              for k in ("translation", "rotation")])
            cal = t.get("calibrated_sensor", sd["calibrated_sensor_token"])
            np.savetxt(os.path.join(out, "lidar_pose", f"{fi:03d}.txt"),
                       ego @ _pose_mat(cal["translation"], cal["rotation"]))

    # -- objects ------------------------------------------------------------

    def _build_objects(self, scene, samples, ts):
        """Keyframe boxes -> 10 Hz interpolated instance tracks
        (interpolate_boxes, nuscenes_preprocess.py:854-922)."""
        t = self.tables
        per_instance: Dict[str, dict] = {}
        for si, s in enumerate(samples):
            for ann in t.rows["sample_annotation"]:
                if ann["sample_token"] != s["token"]:
                    continue
                inst = t.get("instance", ann["instance_token"])
                cat = t.get("category", inst["category_token"])["name"]
                rec = per_instance.setdefault(ann["instance_token"], {
                    "class_name": cat, "stamps": [], "trans": [],
                    "rots": [], "sizes": []})
                rec["stamps"].append(s["timestamp"])
                rec["trans"].append(ann["translation"])
                rec["rots"].append(ann["rotation"])
                # nuScenes size is (w, l, h); drivestudio boxes are (l, w, h)
                w, l, h = ann["size"]
                rec["sizes"].append([l, w, h])

        inst_info, frame_inst = {}, {fi: [] for fi in range(len(ts))}
        for ii, (tok, rec) in enumerate(sorted(per_instance.items())):
            stamps = np.asarray(rec["stamps"], np.int64)
            order = np.argsort(stamps)
            stamps = stamps[order]
            trans = np.asarray(rec["trans"], np.float64)[order]
            rots = [rec["rots"][i] for i in order]
            frames, o2ws = [], []
            for fi, stamp in enumerate(ts):
                if stamp < stamps[0] or stamp > stamps[-1]:
                    continue
                j = int(np.searchsorted(stamps, stamp, side="right") - 1)
                j = min(j, len(stamps) - 2) if len(stamps) > 1 else 0
                if len(stamps) == 1:
                    tr, q = trans[0], np.asarray(rots[0])
                else:
                    span = max(float(stamps[j + 1] - stamps[j]), 1.0)
                    a = float(stamp - stamps[j]) / span
                    tr = (1 - a) * trans[j] + a * trans[j + 1]
                    q = _slerp(rots[j], rots[j + 1], a)
                m = np.eye(4)
                m[:3, :3] = _quat_to_mat(q)
                m[:3, 3] = tr
                frames.append(fi)
                o2ws.append(m.tolist())
                frame_inst[fi].append(str(ii))
            inst_info[str(ii)] = {
                "id": str(ii), "token": tok,
                "class_name": rec["class_name"],
                "frame_annotations": {
                    "frame_idx": frames,
                    "obj_to_world": o2ws,
                    "box_size": [rec["sizes"][0]] * len(frames),
                },
            }
        return inst_info, frame_inst

    # -- dynamic masks ------------------------------------------------------

    def _save_dynamic_masks(self, scene, ts, inst_info, out):
        """Project interpolated 3D boxes; fill their convex hulls
        (save_dynamic_mask_interpolated, nuscenes_preprocess.py:694-787)."""
        t = self.tables
        for sub in ("all", "human", "vehicle"):
            os.makedirs(os.path.join(out, "dynamic_masks", sub),
                        exist_ok=True)
        from PIL import Image
        for ci, channel in enumerate(self.cameras):
            sds = t.channel_sample_datas(scene, channel)
            if not sds:
                continue
            for fi, stamp in enumerate(ts):
                sd = _closest(sds, stamp)
                cal = t.get("calibrated_sensor",
                            sd["calibrated_sensor_token"])
                K = np.asarray(cal["camera_intrinsic"], np.float64)
                ego = _pose_mat(
                    *[t.get("ego_pose", sd["ego_pose_token"])[k]
                      for k in ("translation", "rotation")])
                c2w = ego @ _pose_mat(cal["translation"], cal["rotation"])
                w2c = np.linalg.inv(c2w)
                hgt, wid = sd.get("height", 900), sd.get("width", 1600)
                masks = {k: np.zeros((hgt, wid), bool)
                         for k in ("all", "human", "vehicle")}
                for iid, meta in inst_info.items():
                    cname = meta["class_name"]
                    if not cname.startswith(DYNAMIC_PREFIXES):
                        continue
                    ann = meta["frame_annotations"]
                    if fi not in ann["frame_idx"]:
                        continue
                    k = ann["frame_idx"].index(fi)
                    o2w = np.asarray(ann["obj_to_world"][k])
                    size = np.asarray(ann["box_size"][k])
                    poly = _project_box(o2w, size, w2c, K, wid, hgt)
                    if poly is None:
                        continue
                    m = _fill_convex(poly, hgt, wid)
                    masks["all"] |= m
                    if cname.startswith(HUMAN_PREFIXES):
                        masks["human"] |= m
                    if cname.startswith(VEHICLE_PREFIXES):
                        masks["vehicle"] |= m
                for sub, m in masks.items():
                    Image.fromarray((m * 255).astype(np.uint8)).save(
                        os.path.join(out, "dynamic_masks", sub,
                                     f"{fi:03d}_{ci}.png"))


def _project_box(o2w, size, w2c, K, width, height):
    """3D box corners -> image polygon (None if fully behind camera)."""
    l, w, h = [float(x) for x in size]
    corners = np.array([[sx * l / 2, sy * w / 2, sz * h / 2]
                        for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)])
    pts = corners @ o2w[:3, :3].T + o2w[:3, 3]
    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    front = cam[:, 2] > 0.1
    if not front.any():
        return None
    cam = cam[front]
    uv = cam[:, :2] / cam[:, 2:3]
    px = uv * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])
    if (px[:, 0] < -width).all() or (px[:, 0] > 2 * width).all() \
            or (px[:, 1] < -height).all() or (px[:, 1] > 2 * height).all():
        return None
    return _convex_hull(px)


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain (<= 8 points; no scipy dependency)."""
    pts = np.unique(np.round(pts, 3), axis=0)
    if pts.shape[0] < 3:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cross2(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and cross2(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def _fill_convex(poly: np.ndarray, height: int, width: int) -> np.ndarray:
    """Rasterize a convex polygon into a bool mask (pure numpy)."""
    if poly.shape[0] < 3:
        return np.zeros((height, width), bool)
    x0 = int(max(np.floor(poly[:, 0].min()), 0))
    x1 = int(min(np.ceil(poly[:, 0].max()) + 1, width))
    y0 = int(max(np.floor(poly[:, 1].min()), 0))
    y1 = int(min(np.ceil(poly[:, 1].max()) + 1, height))
    if x1 <= x0 or y1 <= y0:
        return np.zeros((height, width), bool)
    xs = np.arange(x0, x1) + 0.5
    ys = np.arange(y0, y1) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    inside = np.ones(gx.shape, bool)
    n = poly.shape[0]
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        # CCW hull: interior is on the left of each edge
        inside &= ((b[0] - a[0]) * (gy - a[1])
                   - (b[1] - a[1]) * (gx - a[0])) >= 0
    m = np.zeros((height, width), bool)
    m[y0:y1, x0:x1] = inside
    return m
