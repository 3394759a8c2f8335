"""Generate the protocol-shaped quality fixture (`proto_scene/`).

The 3-frame `mini_scene_nuscenes` fixture pins on-disk *formats*, but its
images are per-frame noise — no model can generalize to a held-out frame,
so quality floors measured on it are regression locks, not quality evidence
(VERDICT round-3 weak #3). This scene is built for *interpolation* floors:

  * 30 frames x 2 cameras at 96x64, every image RAYCAST from one consistent
    procedural 3-D world (checkerboard ground, colored buildings, gradient
    sky with a sun disk) — multi-view-consistent by construction;
  * a moving rigid car (slab-intersected box, per-frame pose identical to
    the `instances/` annotations) and a walking pedestrian (box +
    `humanpose/smpl.pkl` track) — both visible from the front camera for
    most of the drive;
  * lidar = rays cast against the same world from the ego origin (nuScenes
    xyzi layout + lidar_pose), so depth supervision and depth metrics are
    geometrically exact;
  * sky/dynamic/human/vehicle masks rendered from the same hits.

Held out with the protocol's stride (`data.test_image_stride=10` -> frames
10 and 20, both interior), a model that learns the scene must beat trivial
baselines on frames it never saw — the floor QUALITY_r04 asserts.

Run: python tests/fixtures/make_proto_scene.py   (rewrites deterministically)
"""
import json
import os
import pickle

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))
H, W = 64, 96
F = 30
CAMS = [0, 1]
FX = 80.0

SKY_TOP = np.array([0.35, 0.55, 0.95])
SKY_HORIZON = np.array([0.85, 0.88, 0.95])
SUN_DIR = np.array([0.5, 0.25, 0.45])
SUN_DIR_N = SUN_DIR / np.linalg.norm(SUN_DIR)

# static world: axis-aligned colored boxes [cx, cy, cz, lx, ly, lz, r, g, b]
BUILDINGS = [
    [12.0, 7.0, 2.0, 6.0, 3.0, 4.0, 0.75, 0.55, 0.40],
    [24.0, -8.0, 3.0, 8.0, 4.0, 6.0, 0.55, 0.60, 0.75],
    [36.0, 8.5, 2.5, 7.0, 3.5, 5.0, 0.80, 0.75, 0.55],
    [50.0, -7.5, 2.0, 9.0, 4.0, 4.0, 0.60, 0.72, 0.60],
    [62.0, 7.0, 3.0, 6.0, 3.0, 6.0, 0.70, 0.50, 0.55],
    [18.0, -6.5, 0.75, 2.0, 1.0, 1.5, 0.85, 0.30, 0.65],  # kiosk
    [44.0, 6.0, 1.0, 1.5, 1.5, 2.0, 0.30, 0.75, 0.75],    # booth
]
CAR_COLOR = np.array([0.85, 0.15, 0.12])
PED_COLOR = np.array([0.15, 0.25, 0.85])
CAR_SIZE = [4.2, 1.9, 1.6]    # l, w, h
PED_SIZE = [0.6, 0.6, 1.8]

# OpenCV camera axes expressed in the FLU ego frame (same block the real
# nuScenes converter stores): cam z -> ego x, cam x -> -y, cam y -> -z
CAM_FWD = np.array([[0.0, 0.0, 1.0],
                    [-1.0, 0.0, 0.0],
                    [0.0, -1.0, 0.0]])


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def ego_pose(t):
    e = np.eye(4)
    e[:3, :3] = rot_z(0.006 * t)
    e[:3, 3] = [1.5 * t, 0.03 * t, 0.0]
    return e


def car_pose(t):
    m = np.eye(4)
    m[:3, :3] = rot_z(0.004 * t)
    m[:3, 3] = [10.0 + 2.1 * t, -2.2, CAR_SIZE[2] / 2]
    return m


def ped_pose(t):
    # walks the sidewalk slightly slower than the ego so it stays in the
    # front camera's view for the whole 30-frame drive (gap 14 -> 7 m)
    m = np.eye(4)
    m[:3, 3] = [15.5 + 1.25 * t, 3.2 - 0.03 * t, PED_SIZE[2] / 2]
    return m


def cam_to_ego(cam):
    yaw, off = (0.0, [1.2, 0.0, 1.5]) if cam == 0 else (0.45, [0.8, 0.5, 1.5])
    r = rot_z(yaw) @ CAM_FWD
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = off
    return m


def _boxes_for_frame(t):
    """(B, 6) [lo, hi] slabs + (B, 3) colors + (B,) class id (0 static,
    1 car, 2 ped). Dynamic boxes use the SAME poses the annotations carry
    (yaw folded into an enclosing AABB — the raycast box is axis-aligned,
    the annotation keeps the true rotation; at <=0.12 rad the difference
    is sub-pixel at this resolution)."""
    lo, hi, col, cls = [], [], [], []
    for b in BUILDINGS:
        c = np.array(b[:3])
        s = np.array(b[3:6])
        lo.append(c - s / 2)
        hi.append(c + s / 2)
        col.append(b[6:9])
        cls.append(0)
    for pose, size, color, k in [(car_pose(t), CAR_SIZE, CAR_COLOR, 1),
                                 (ped_pose(t), PED_SIZE, PED_COLOR, 2)]:
        c = pose[:3, 3]
        half = np.abs(pose[:3, :3]) @ (np.array(size) / 2)
        lo.append(c - half)
        hi.append(c + half)
        col.append(color)
        cls.append(k)
    return (np.array(lo), np.array(hi), np.array(col),
            np.array(cls, np.int32))


def raycast(origins, dirs, t):
    """origins (N,3), dirs (N,3) unit. Returns rgb (N,3), depth_along_ray
    (N,), cls (N,) with -1 sky, 0 static/ground, 1 car, 2 ped."""
    n = dirs.shape[0]
    lo, hi, col, cls = _boxes_for_frame(t)
    eps = 1e-9
    inv = 1.0 / np.where(np.abs(dirs) < eps, eps, dirs)
    t0 = (lo[None] - origins[:, None]) * inv[:, None]      # (N, B, 3)
    t1 = (hi[None] - origins[:, None]) * inv[:, None]
    tmin = np.minimum(t0, t1).max(axis=2)
    tmax = np.maximum(t0, t1).min(axis=2)
    hit = (tmax >= np.maximum(tmin, 1e-3))
    tbox = np.where(hit, tmin, np.inf)                     # (N, B)
    bi = np.argmin(tbox, axis=1)
    tb = tbox[np.arange(n), bi]

    # ground plane z = 0
    dz = dirs[:, 2]
    tg = np.where(dz < -1e-6, -origins[:, 2] / np.where(
        np.abs(dz) < 1e-9, -1e-9, dz), np.inf)
    tg = np.where(tg > 1e-3, tg, np.inf)

    t_hit = np.minimum(tb, tg)
    is_box = tb <= tg
    sky = ~np.isfinite(t_hit)

    rgb = np.zeros((n, 3))
    # sky: gradient on ray elevation + sun disk
    elev = np.clip(dirs[:, 2], 0, 1)
    sun = np.clip((dirs @ SUN_DIR_N - 0.997) / 0.003, 0, 1)
    rgb[sky] = (SKY_HORIZON + (SKY_TOP - SKY_HORIZON) * elev[sky, None]
                + 0.8 * sun[sky, None])
    # ground: 2m checkerboard
    gmask = (~sky) & (~is_box)
    gp = origins[gmask] + t_hit[gmask, None] * dirs[gmask]
    check = ((np.floor(gp[:, 0] / 2) + np.floor(gp[:, 1] / 2)) % 2)
    rgb[gmask] = np.where(check[:, None] > 0,
                          np.array([[0.45, 0.47, 0.44]]),
                          np.array([[0.33, 0.36, 0.33]]))
    # boxes: face shading from the dominant hit axis
    bmask = (~sky) & is_box
    bsel = bi[bmask]
    pb = origins[bmask] + t_hit[bmask, None] * dirs[bmask]
    ctr = (lo[bsel] + hi[bsel]) / 2
    ext = (hi[bsel] - lo[bsel]) / 2
    rel = np.abs((pb - ctr) / np.where(ext < 1e-6, 1e-6, ext))
    face = np.argmax(rel, axis=1)
    shade = np.choose(face, [0.85, 0.7, 1.0])
    rgb[bmask] = col[bsel] * shade[:, None]

    out_cls = np.full(n, -1, np.int32)
    out_cls[gmask] = 0
    out_cls[bmask] = cls[bi[bmask]]
    depth = np.where(sky, 0.0, t_hit)
    return np.clip(rgb, 0, 1), depth, out_cls


def render_frame(t, cam):
    c2w = ego_pose(t) @ cam_to_ego(cam)
    ys, xs = np.mgrid[0:H, 0:W]
    pix = np.stack([(xs + 0.5 - W / 2) / FX, (ys + 0.5 - H / 2) / FX,
                    np.ones_like(xs, float)], axis=-1).reshape(-1, 3)
    dirs = pix @ c2w[:3, :3].T
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = np.broadcast_to(c2w[:3, 3], dirs.shape)
    rgb, depth_ray, cls = raycast(origins, dirs, t)
    return (rgb.reshape(H, W, 3), cls.reshape(H, W))


def write_txt(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savetxt(path, np.asarray(arr), fmt="%.18e")


def save_img(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def make(root):
    rng = np.random.RandomState(11)
    os.makedirs(root, exist_ok=True)
    for cam in CAMS:
        write_txt(os.path.join(root, "intrinsics", f"{cam}.txt"),
                  np.array([FX, FX, W / 2, H / 2, 0, 0, 0, 0, 0.0]))
    for t in range(F):
        for cam in CAMS:
            write_txt(os.path.join(root, "extrinsics", f"{t:03d}_{cam}.txt"),
                      ego_pose(t) @ cam_to_ego(cam))
            rgb, cls = render_frame(t, cam)
            save_img(os.path.join(root, "images", f"{t:03d}_{cam}.jpg"),
                     (rgb * 255).astype(np.uint8))
            save_img(os.path.join(root, "sky_masks", f"{t:03d}_{cam}.png"),
                     ((cls == -1) * 255).astype(np.uint8))
            dyn = ((cls == 1) | (cls == 2)).astype(np.uint8) * 255
            save_img(os.path.join(root, "dynamic_masks", "all",
                                  f"{t:03d}_{cam}.png"), dyn)
            save_img(os.path.join(root, "dynamic_masks", "vehicle",
                                  f"{t:03d}_{cam}.png"),
                     ((cls == 1) * 255).astype(np.uint8))
            save_img(os.path.join(root, "dynamic_masks", "human",
                                  f"{t:03d}_{cam}.png"),
                     ((cls == 2) * 255).astype(np.uint8))

        # lidar: 1024 rays from the ego origin, forward-biased hemisphere
        az = rng.uniform(-np.pi / 2, np.pi / 2, 1024)
        el = rng.uniform(-0.25, 0.12, 1024)
        d_ego = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                          np.sin(el)], 1)
        e = ego_pose(t)
        d_w = d_ego @ e[:3, :3].T
        o_w = np.broadcast_to(e[:3, 3] + np.array([0, 0, 1.8]),
                              d_w.shape)
        _, depth, cls = raycast(o_w, d_w, t)
        ok = (depth > 0.5) & (depth < 60.0)
        pts_w = o_w[ok] + depth[ok, None] * d_w[ok]
        # store ego-frame xyzi (nuScenes layout); lidar_pose = ego pose
        pts_e = (pts_w - e[:3, 3]) @ e[:3, :3]
        rec = np.concatenate(
            [pts_e.astype(np.float32),
             rng.rand(pts_e.shape[0], 1).astype(np.float32)], 1)
        os.makedirs(os.path.join(root, "lidar"), exist_ok=True)
        rec.tofile(os.path.join(root, "lidar", f"{t:03d}.bin"))
        write_txt(os.path.join(root, "lidar_pose", f"{t:03d}.txt"), e)

    # instances: the exact poses the raycaster used
    frames = list(range(F))
    info = {
        "0": {"id": "veh-proto", "class_name": "vehicle.car",
              "frame_annotations": {
                  "frame_idx": frames,
                  "obj_to_world": [car_pose(t).tolist() for t in frames],
                  "box_size": [CAR_SIZE] * F}},
        "1": {"id": "ped-proto", "class_name": "human.pedestrian.adult",
              "frame_annotations": {
                  "frame_idx": frames,
                  "obj_to_world": [ped_pose(t).tolist() for t in frames],
                  "box_size": [PED_SIZE] * F}},
    }
    os.makedirs(os.path.join(root, "instances"), exist_ok=True)
    with open(os.path.join(root, "instances", "instances_info.json"),
              "w") as f:
        json.dump(info, f, indent=1)
    with open(os.path.join(root, "instances", "frame_instances.json"),
              "w") as f:
        json.dump({str(t): [0, 1] for t in frames}, f)

    # humanpose/smpl.pkl: a walking-phase pose track for the pedestrian
    rngp = np.random.RandomState(5)

    def axis_angle_mat(a):
        th = np.linalg.norm(a) + 1e-9
        k = a / th
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                       [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx

    body = np.zeros((F, 23, 3, 3))
    orient = np.zeros((F, 3, 3))
    for t in range(F):
        phase = np.sin(2 * np.pi * t / 8.0)
        for j in range(23):
            swing = 0.35 * phase if j in (0, 1, 3, 4) else 0.05 * phase
            body[t, j] = axis_angle_mat(
                np.array([swing, 0.02 * rngp.randn(), 0.0]))
        orient[t] = rot_z(0.05 * np.sin(0.3 * t))
    smpl = {"1": {
        "valid_mask": np.ones(F, bool),
        "selected_cam_idx": np.zeros(F, np.int64),
        "smpl": {"betas": np.tile(rngp.randn(10) * 0.2, (F, 1)).astype(
                     np.float32),
                 "body_pose": body.astype(np.float32),
                 "global_orient": orient.astype(np.float32)}}}
    os.makedirs(os.path.join(root, "humanpose"), exist_ok=True)
    with open(os.path.join(root, "humanpose", "smpl.pkl"), "wb") as f:
        pickle.dump(smpl, f)


if __name__ == "__main__":
    make(os.path.join(HERE, "proto_scene"))
    print("proto_scene written under", HERE)
