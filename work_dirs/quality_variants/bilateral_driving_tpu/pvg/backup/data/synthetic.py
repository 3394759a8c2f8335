"""Synthetic driving-like scene generator for tests and benchmarks.

Stands in for preprocessed nuScenes/Waymo scenes (the real data layer is
data/dataset.py): produces a background point cloud, a moving rigid
"vehicle" box with a pose track, camera trajectories, and ready-to-train
batches matching the trainer's contract (pixels, sky_masks, lidar_depth_map,
viewdirs, img_idx, frame_idx, normed_time, camera_to_world, intrinsics).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import gaussians as G, transforms


class SyntheticScene(NamedTuple):
    bg_means: jax.Array
    bg_colors: jax.Array
    rigid_means: jax.Array      # instance-local points
    rigid_colors: jax.Array
    rigid_point_ids: jax.Array
    rigid_quats: jax.Array      # (F, I, 4)
    rigid_trans: jax.Array      # (F, I, 3)
    rigid_fv: jax.Array         # (F, I)
    rigid_sizes: jax.Array      # (I, 3)
    cameras: jax.Array          # (F, 4, 4) cam-to-world
    K: jax.Array
    width: int
    height: int
    num_frames: int


def make_scene(key, num_bg=2000, num_rigid_pts=300, num_frames=6,
               width=128, height=96) -> SyntheticScene:
    ks = jax.random.split(key, 8)
    # background: ground plane + scattered blobs ahead of the camera path
    ground = jnp.concatenate([
        jax.random.uniform(ks[0], (num_bg // 2, 1), minval=-8, maxval=8),
        jnp.full((num_bg // 2, 1), 1.5),
        jax.random.uniform(ks[1], (num_bg // 2, 1), minval=2, maxval=30),
    ], axis=1)
    blobs = jnp.concatenate([
        jax.random.uniform(ks[2], (num_bg - num_bg // 2, 1), minval=-6, maxval=6),
        jax.random.uniform(ks[3], (num_bg - num_bg // 2, 1), minval=-2, maxval=1.2),
        jax.random.uniform(ks[4], (num_bg - num_bg // 2, 1), minval=4, maxval=25),
    ], axis=1)
    bg_means = jnp.concatenate([ground, blobs])
    bg_colors = jax.random.uniform(ks[5], (num_bg, 3), minval=0.2, maxval=0.9)

    # one rigid instance: a box of points driving across the scene
    num_inst = 1
    size = jnp.array([[2.0, 1.5, 4.0]])
    local = (jax.random.uniform(ks[6], (num_rigid_pts, 3)) - 0.5) * size[0] * 0.9
    rigid_colors = jnp.tile(jnp.array([[0.9, 0.2, 0.1]]), (num_rigid_pts, 1))
    point_ids = jnp.zeros((num_rigid_pts,), jnp.int32)

    frames = jnp.arange(num_frames, dtype=jnp.float32)
    trans = jnp.stack([
        -4.0 + frames * 1.5,
        jnp.full((num_frames,), 0.5),
        jnp.full((num_frames,), 10.0),
    ], axis=1)[:, None, :]                      # (F, 1, 3)
    yaw = 0.05 * frames
    quats = jnp.stack([jnp.cos(yaw / 2), jnp.zeros_like(yaw),
                       jnp.sin(yaw / 2), jnp.zeros_like(yaw)], axis=1)[:, None]
    fv = jnp.ones((num_frames, num_inst), bool)

    # forward-moving camera
    cams = []
    for f in range(num_frames):
        c2w = jnp.eye(4).at[:3, 3].set(jnp.array([0.0, 0.0, 0.5 * f]))
        cams.append(c2w)
    cameras = jnp.stack(cams)
    focal = 0.9 * width
    K = jnp.array([[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1.0]])
    return SyntheticScene(bg_means, bg_colors, local, rigid_colors, point_ids,
                          quats, trans, fv, size, cameras, K, width, height,
                          num_frames)


def make_batch(scene: SyntheticScene, frame: int, pixels: jax.Array,
               sky_mask=None, depth_map=None):
    """Assemble a trainer batch for one frame with the given target image."""
    h, w = scene.height, scene.width
    c2w = scene.cameras[frame]
    # per-pixel world view directions
    xs = (jnp.arange(w) + 0.5 - scene.K[0, 2]) / scene.K[0, 0]
    ys = (jnp.arange(h) + 0.5 - scene.K[1, 2]) / scene.K[1, 1]
    d_cam = jnp.stack(
        jnp.broadcast_arrays(xs[None, :], ys[:, None], jnp.ones((1, 1))),
        axis=-1)
    d_world = d_cam @ c2w[:3, :3].T
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    return {
        "pixels": pixels,
        "sky_masks": (jnp.zeros((h, w)) if sky_mask is None else sky_mask),
        "lidar_depth_map": (jnp.zeros((h, w)) if depth_map is None
                            else depth_map),
        "viewdirs": d_world,
        "img_idx": jnp.asarray(frame, jnp.int32),
        "frame_idx": jnp.asarray(frame, jnp.int32),
        "normed_time": jnp.asarray(frame / max(scene.num_frames - 1, 1)),
        "camera_to_world": c2w,
        "intrinsics": scene.K,
    }
