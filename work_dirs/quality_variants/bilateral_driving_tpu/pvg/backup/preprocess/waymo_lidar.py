"""Devkit-free numpy math for Waymo range-image decoding and box projection.

Numpy counterparts of the Waymo devkit utilities the reference converter
leans on (reference `project/datasets/waymo/waymo_utils.py:59-403`, which in
turn wraps `waymo_open_dataset.utils.range_image_utils` /
`transform_utils` / `py_camera_model_ops` — all TensorFlow). Everything here
is plain numpy so it is unit-testable without the devkit or raw data; only
the proto *schema* (dataset_pb2) is needed at convert time, handled by
`waymo.py`.

Conventions (Waymo Open Dataset):
- vehicle frame: x forward, y left, z up;
- lidar range image: rows = beams (row 0 = highest inclination after the
  devkit's reverse), cols = azimuth sweep from +pi to -pi (minus the
  sensor's extrinsic yaw correction);
- camera frame: x forward (optical axis), y left, z up; pixel u grows along
  -y, v along -z.
"""
from __future__ import annotations

import numpy as np


def rotation_zyx(roll: np.ndarray, pitch: np.ndarray,
                 yaw: np.ndarray) -> np.ndarray:
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll), batched over leading dims
    (transform_utils.get_rotation_matrix)."""
    roll, pitch, yaw = np.broadcast_arrays(roll, pitch, yaw)
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    R = np.empty(roll.shape + (3, 3), np.float64)
    R[..., 0, 0] = cy * cp
    R[..., 0, 1] = cy * sp * sr - sy * cr
    R[..., 0, 2] = cy * sp * cr + sy * sr
    R[..., 1, 0] = sy * cp
    R[..., 1, 1] = sy * sp * sr + cy * cr
    R[..., 1, 2] = sy * sp * cr - cy * sr
    R[..., 2, 0] = -sp
    R[..., 2, 1] = cp * sr
    R[..., 2, 2] = cp * cr
    return R


def poses_from_6dof(rpy_xyz: np.ndarray) -> np.ndarray:
    """(..., 6) [roll, pitch, yaw, x, y, z] -> (..., 4, 4) transforms
    (transform_utils.get_transform over the top-pose range image)."""
    rpy_xyz = np.asarray(rpy_xyz, np.float64)
    out = np.zeros(rpy_xyz.shape[:-1] + (4, 4), np.float64)
    out[..., :3, :3] = rotation_zyx(rpy_xyz[..., 0], rpy_xyz[..., 1],
                                    rpy_xyz[..., 2])
    out[..., :3, 3] = rpy_xyz[..., 3:6]
    out[..., 3, 3] = 1.0
    return out


def compute_inclination(inc_min: float, inc_max: float,
                        height: int) -> np.ndarray:
    """Uniform beam inclinations for lidars without a per-beam table
    (range_image_utils.compute_inclination): row centers bottom-up."""
    return ((0.5 + np.arange(height)) / height * (inc_max - inc_min)
            + inc_min)


def extract_point_cloud(range_img: np.ndarray, extrinsic: np.ndarray,
                        inclination: np.ndarray,
                        pixel_pose: np.ndarray | None = None,
                        frame_pose: np.ndarray | None = None):
    """Range image -> (points, origins), both (H, W, 3) in the VEHICLE frame.

    `inclination` is (H,) with row 0 = first range-image row (i.e. already
    reversed like the devkit does before calling). `pixel_pose` (H, W, 4, 4)
    is the TOP lidar's per-column rolling-shutter pose (vehicle->world);
    `frame_pose` the frame's vehicle->world, required with pixel_pose.
    Mirrors range_image_utils.extract_point_cloud_from_range_image +
    compute_range_image_cartesian (reference waymo_utils.py:59-217).
    """
    H, W = range_img.shape
    extrinsic = np.asarray(extrinsic, np.float64)
    az_correction = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    ratios = (np.arange(W, 0, -1) - 0.5) / W
    azimuth = (ratios * 2.0 - 1.0) * np.pi - az_correction        # (W,)

    cos_az, sin_az = np.cos(azimuth)[None, :], np.sin(azimuth)[None, :]
    cos_in = np.cos(inclination)[:, None]
    sin_in = np.sin(inclination)[:, None]
    r = np.asarray(range_img, np.float64)
    x = cos_az * cos_in * r
    y = sin_az * cos_in * r
    z = sin_in * r
    pts = np.stack([x, y, z], axis=-1)                            # (H, W, 3)

    R, t = extrinsic[:3, :3], extrinsic[:3, 3]
    pts = pts @ R.T + t
    origins = np.broadcast_to(t, pts.shape).copy()

    if pixel_pose is not None:
        if frame_pose is None:
            raise ValueError("frame_pose must be set with pixel_pose")
        pr = pixel_pose[..., :3, :3]                              # (H, W, 3, 3)
        pt = pixel_pose[..., :3, 3]
        pts = np.einsum("hwij,hwj->hwi", pr, pts) + pt
        origins = np.einsum("hwij,hwj->hwi", pr, origins) + pt
        w2v = np.linalg.inv(np.asarray(frame_pose, np.float64))
        pts = pts @ w2v[:3, :3].T + w2v[:3, 3]
        origins = origins @ w2v[:3, :3].T + w2v[:3, 3]
    return pts, origins


def ground_mask(pts: np.ndarray, num_seed: int = 20, seed_margin: float = 1.2,
                n_iter: int = 10, dist_thresh: float = 0.3) -> np.ndarray:
    """Iterative plane-fit ground segmentation (reference
    waymo_utils.py:405-450 get_ground_np semantics): seed from the lowest
    points, fit a plane by PCA, re-select inliers, repeat. Returns (N, 1)
    bool like the reference (column stacked into the .bin)."""
    order = np.argsort(pts[:, 2])
    lpr = pts[order[:num_seed], 2].mean()
    seeds = pts[pts[:, 2] < lpr + seed_margin]
    result = np.zeros((pts.shape[0], 1))
    th_dist_d = 0.0
    for _ in range(n_iter):
        mean = seeds[:, :3].mean(axis=0)
        d = seeds[:, :3] - mean
        cov = (d[:, :, None] * d[:, None, :]).mean(axis=0)
        U, _, _ = np.linalg.svd(cov.astype(np.float32))
        normal = U[:, 2]
        th_dist_d = dist_thresh + normal.dot(mean)
        result = pts[:, :3] @ normal[:, None]
        seeds = pts[result[:, 0] < th_dist_d]
    return result < th_dist_d


def project_to_image(points_vehicle: np.ndarray, cam2v: np.ndarray,
                     intrinsic: np.ndarray, width: int,
                     height: int) -> np.ndarray:
    """Global-shutter projection of vehicle-frame points to pixels.

    Numpy counterpart of the devkit's `py_camera_model_ops.world_to_image`
    as the reference uses it for mask drawing (waymo_utils.py:17-57 with
    GLOBAL_SHUTTER metadata): Waymo camera axes (x forward, y left, z up),
    Brown-Conrady distortion [k1, k2, p1, p2, k3] from intrinsic[4:9].
    Returns (N, 3) of (u, v, ok); ok=0 for points behind the camera (the
    rolling-shutter timing refinement of the TF op is intentionally not
    replicated — boxes are drawn as axis-aligned speed rectangles
    downstream, waymo_preprocess.py:434-449)."""
    v2c = np.linalg.inv(np.asarray(cam2v, np.float64))
    p = np.asarray(points_vehicle, np.float64) @ v2c[:3, :3].T + v2c[:3, 3]
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    ok = x > 1e-6
    xs = np.where(ok, x, 1.0)
    # normalized image coords: u along -y/x, v along -z/x
    un, vn = -y / xs, -z / xs
    fx, fy, cx, cy = intrinsic[0:4]
    k1, k2, p1, p2, k3 = intrinsic[4:9]
    r2 = un * un + vn * vn
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    ud = un * radial + 2.0 * p1 * un * vn + p2 * (r2 + 2.0 * un * un)
    vd = vn * radial + p1 * (r2 + 2.0 * vn * vn) + 2.0 * p2 * un * vn
    u = fx * ud + cx
    v = fy * vd + cy
    return np.stack([u, v, ok.astype(np.float64)], axis=-1)


def box_corners_3d(center: np.ndarray, lwh: np.ndarray,
                   heading: float) -> np.ndarray:
    """Upright 3-D box corners, (8, 3) in the box's parent frame
    (box_utils.get_upright_3d_box_corners semantics: z-axis yaw only)."""
    l, w, h = lwh
    sx = np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float64) * (l / 2)
    sy = np.array([1, -1, -1, 1, 1, -1, -1, 1], np.float64) * (w / 2)
    sz = np.array([-1, -1, -1, -1, 1, 1, 1, 1], np.float64) * (h / 2)
    c, s = np.cos(heading), np.sin(heading)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)
    return np.stack([sx, sy, sz], axis=-1) @ R.T + np.asarray(center)


def draw_speed_mask(mask: np.ndarray, boxes, cam2v: np.ndarray,
                    intrinsic: np.ndarray) -> np.ndarray:
    """Accumulate per-box speed rectangles into `mask` (H, W) by max
    (waymo_preprocess.py:399-449): project the 8 corners, skip the box if
    any corner is behind the camera, clip to bounds, max-pool the speed.

    `boxes`: iterable of (corners_vehicle (8,3), speed float)."""
    H, W = mask.shape
    for corners, speed in boxes:
        uvo = project_to_image(corners, cam2v, intrinsic, W, H)
        if not np.all(uvo[:, 2] > 0):
            continue
        u = np.clip(uvo[:, 0], 0, W)
        v = np.clip(uvo[:, 1], 0, H)
        if u.max() - u.min() == 0 or v.max() - v.min() == 0:
            continue
        y0, y1 = int(v.min()), int(v.max())
        x0, x1 = int(u.min()), int(u.max())
        mask[y0:y1, x0:x1] = np.maximum(mask[y0:y1, x0:x1], speed)
    return mask
