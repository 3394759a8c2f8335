"""Point-cloud / Gaussian export utilities.

Counterparts of the reference's ply export (`export_points_to_ply`,
project/utils/misc.py; `export_gaussians_to_ply`, vanilla.py:466-473) and the
render-depth -> synthetic lidar generator
(project/generate_lidar/generate_lidar_from_depth.py:95).
"""
from __future__ import annotations

import numpy as np


def export_points_to_ply(path: str, points: np.ndarray,
                         colors: np.ndarray | None = None):
    """ASCII ply of xyz (+ uchar rgb)."""
    points = np.asarray(points)
    n = points.shape[0]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        if colors is not None:
            c = (np.clip(np.asarray(colors), 0, 1) * 255).astype(np.uint8)
            for p, cc in zip(points, c):
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{cc[0]} {cc[1]} {cc[2]}\n")
        else:
            for p in points:
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def export_gaussians_to_ply(path: str, params: dict, mask,
                            alpha_thresh: float = 0.0):
    """Live Gaussians above an opacity threshold as a colored point cloud
    (vanilla.py:466-473: positions + DC colors)."""
    import jax.numpy as jnp

    from ..core import sh as sh_lib

    op = np.asarray(1.0 / (1.0 + np.exp(-np.asarray(
        params["logit_opacities"][:, 0]))))
    keep = np.asarray(mask) & (op > alpha_thresh)
    means = np.asarray(params["means"])[keep]
    colors = np.asarray(sh_lib.sh_to_rgb(jnp.asarray(
        params["sh_dc"][:, 0, :])))[keep]
    export_points_to_ply(path, means, np.clip(colors, 0, 1))


def lidar_from_depth(depth: np.ndarray, K: np.ndarray, c2w: np.ndarray,
                     azimuth_res: float = 0.2, num_beams: int = 32,
                     fov_up: float = 10.0, fov_down: float = -30.0,
                     max_range: float = 80.0) -> np.ndarray:
    """Synthesize lidar-like returns from a rendered depth map by sampling
    the depth image along a spinning-beam pattern
    (generate_lidar_from_depth.py:95): returns world-frame xyz points."""
    h, w = depth.shape
    elevs = np.deg2rad(np.linspace(fov_down, fov_up, num_beams))
    azims = np.deg2rad(np.arange(-60.0, 60.0, azimuth_res))
    el, az = np.meshgrid(elevs, azims, indexing="ij")
    # camera-frame ray dirs (z forward, y down)
    dirs = np.stack([np.sin(az) * np.cos(el), -np.sin(el),
                     np.cos(az) * np.cos(el)], axis=-1).reshape(-1, 3)
    # project to pixels
    u = dirs[:, 0] / dirs[:, 2] * K[0, 0] + K[0, 2]
    v = dirs[:, 1] / dirs[:, 2] * K[1, 1] + K[1, 2]
    ok = (dirs[:, 2] > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    u, v, dirs = u[ok].astype(np.int64), v[ok].astype(np.int64), dirs[ok]
    z = depth[v, u]
    hit = (z > 0.1) & (z < max_range)
    pts_cam = dirs[hit] * (z[hit] / dirs[hit][:, 2])[:, None]
    return (pts_cam @ c2w[:3, :3].T + c2w[:3, 3]).astype(np.float32)
