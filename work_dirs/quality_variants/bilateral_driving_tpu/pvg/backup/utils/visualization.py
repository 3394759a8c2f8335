"""Multi-camera visualization grids + error maps.

Counterpart of the reference's `project/utils/visualization.py:24-335`
(per-dataset tiled camera layouts consumed by `save_videos`) and the
error-map coloring from `project/models/video_utils.py`. The reference
hand-writes one layout function per dataset; here each layout is a slot map
{camera_name: (row, col)} over a uniform grid, with shorter images
bottom-aligned in their cell (waymo/argoverse side cams).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# (row, col) grid slots per camera name, mirroring the reference's ASCII
# layouts (visualization.py: layout_waymo:98, layout_nuscenes:141,
# layout_pandaset:191, layout_argoverse:270, layout_kitti:243, nuplan:41)
LAYOUT_SLOTS: Dict[str, Dict[str, Tuple[int, int]]] = {
    "waymo": {
        "left_camera": (0, 0), "front_left_camera": (0, 1),
        "front_camera": (0, 2), "front_right_camera": (0, 3),
        "right_camera": (0, 4),
    },
    "nuscenes": {
        "CAM_FRONT_LEFT": (0, 0), "CAM_FRONT": (0, 1),
        "CAM_FRONT_RIGHT": (0, 2), "CAM_BACK_LEFT": (1, 0),
        "CAM_BACK": (1, 1), "CAM_BACK_RIGHT": (1, 2),
    },
    "pandaset": {
        "front_left_camera": (0, 0), "front_camera": (0, 1),
        "front_right_camera": (0, 2), "left_camera": (1, 0),
        "back_camera": (1, 1), "right_camera": (1, 2),
    },
    "argoverse": {
        "ring_front_left": (0, 0), "ring_front_center": (0, 1),
        "ring_front_right": (0, 2), "ring_side_left": (1, 0),
        "ring_side_right": (1, 2), "ring_rear_left": (2, 0),
        "ring_rear_right": (2, 2),
    },
    "kitti": {"cam_left": (0, 0), "cam_right": (0, 1)},
    "nuplan": {
        "CAM_L0": (0, 0), "CAM_F0": (0, 1), "CAM_R0": (0, 2),
        "CAM_L1": (1, 0), "CAM_R1": (1, 2),
        "CAM_L2": (2, 0), "CAM_B0": (2, 1), "CAM_R2": (2, 2),
    },
}


def tile_cameras(imgs: Sequence[np.ndarray], cam_names: Sequence[str],
                 dataset: Optional[str] = None) -> np.ndarray:
    """Tile per-camera images into the dataset's canonical grid.

    Unknown dataset / names fall back to a single row. Cells take the max
    per-image size; shorter images are bottom-aligned, narrower centered
    (reference bottom-aligns waymo's 866-px side cams, visualization.py:120).
    Empty rows/cols are cropped away."""
    slots = LAYOUT_SLOTS.get((dataset or "").split("/")[0].lower())
    if slots is None or not all(n in slots for n in cam_names):
        slots = {n: (0, i) for i, n in enumerate(cam_names)}
    ch = imgs[0].shape[-1] if imgs[0].ndim == 3 else 1
    cell_h = max(im.shape[0] for im in imgs)
    cell_w = max(im.shape[1] for im in imgs)
    nrow = max(r for r, _ in slots.values()) + 1
    ncol = max(c for _, c in slots.values()) + 1
    canvas = np.zeros((nrow * cell_h, ncol * cell_w, ch), np.float32)
    filled = np.zeros((nrow * cell_h, ncol * cell_w), bool)
    for im, name in zip(imgs, cam_names):
        if im.ndim == 2:
            im = im[..., None]
        r, c = slots[name]
        y0 = r * cell_h + (cell_h - im.shape[0])          # bottom-align
        x0 = c * cell_w + (cell_w - im.shape[1]) // 2     # center
        canvas[y0:y0 + im.shape[0], x0:x0 + im.shape[1]] = im
        filled[y0:y0 + im.shape[0], x0:x0 + im.shape[1]] = True
    ys, xs = np.where(filled)
    return canvas[ys.min():ys.max() + 1, xs.min():xs.max() + 1]


def error_map(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Per-pixel squared error as a turbo-ish heat image in [0,1]
    (reference compute_error_map, video_utils.py)."""
    err = np.mean((pred.astype(np.float32) - gt.astype(np.float32)) ** 2,
                  axis=-1)
    hi = np.percentile(err, 99.5) if err.size else 1.0
    x = np.clip(err / max(hi, 1e-8), 0.0, 1.0)
    # compact blue->green->red colormap
    r = np.clip(1.5 * x - 0.25, 0, 1)
    g = 1.0 - np.abs(2.0 * x - 1.0)
    b = np.clip(1.0 - 1.5 * x, 0, 1)
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def depth_colormap(depth: np.ndarray, max_depth: float = 80.0) -> np.ndarray:
    from ..eval.render_loop import depth_visualizer
    return depth_visualizer(depth, max_depth)


def snapshot_grid(render_out: Dict, cam_names: List[str],
                  dataset: Optional[str], max_depth: float = 80.0,
                  with_error: bool = True) -> np.ndarray:
    """Stack [gt | rgb | depth | error] camera grids vertically — the
    per-step visualization frame (reference save_videos layout semantics,
    tools/train.py:229-241 with render_keys gt/rgb/depth)."""
    rows = [
        tile_cameras(render_out["gt_rgbs"], cam_names, dataset),
        tile_cameras(render_out["rgbs"], cam_names, dataset),
        tile_cameras([depth_colormap(d, max_depth)
                      for d in render_out["depths"]], cam_names, dataset),
    ]
    if with_error:
        rows.append(tile_cameras(
            [error_map(p, g) for p, g in zip(render_out["rgbs"],
                                             render_out["gt_rgbs"])],
            cam_names, dataset))
    w = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0))) for r in rows]
    return np.concatenate(rows, axis=0)


def save_png(img: np.ndarray, path: str) -> None:
    """Write a float [0,1] HWC image as PNG (PIL, available via torch deps)."""
    from PIL import Image

    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


# --------------------------------------------------------------------------
# 3-D instance-box overlays (reference utils/visualization.py bbox drawing +
# generate_lidar radar bbox corners)
# --------------------------------------------------------------------------

# box corner ordering: +-x, +-y, +-z in object frame; 12 wireframe edges
_BOX_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3),
              (4, 5), (4, 6), (5, 7), (6, 7),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def box_corners(o2w: np.ndarray, size) -> np.ndarray:
    """(8, 3) world-space corners of an (l, w, h) box at obj-to-world o2w."""
    l, w, h = [float(x) for x in size]
    local = np.array([[sx * l / 2, sy * w / 2, sz * h / 2]
                      for sz in (-1, 1) for sy in (-1, 1) for sx in (-1, 1)])
    return local @ np.asarray(o2w)[:3, :3].T + np.asarray(o2w)[:3, 3]


def _draw_line(img, p0, p1, color):
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) + 1
    xs = np.linspace(p0[0], p1[0], n).round().astype(int)
    ys = np.linspace(p0[1], p1[1], n).round().astype(int)
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[keep], xs[keep]] = color


def draw_boxes(img: np.ndarray, o2ws, sizes, w2c: np.ndarray,
               K: np.ndarray, color=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Overlay wireframe 3-D boxes on a float [0,1] HWC image.

    o2ws (I, 4, 4), sizes (I, 3) in (l, w, h); edges behind the camera are
    clipped at z=0.1. Returns a copy."""
    out = np.array(img, copy=True)
    color = np.asarray(color, out.dtype)
    K = np.asarray(K)
    for o2w, size in zip(np.asarray(o2ws), np.asarray(sizes)):
        pts = box_corners(o2w, size)
        cam = pts @ np.asarray(w2c)[:3, :3].T + np.asarray(w2c)[:3, 3]
        for a, b in _BOX_EDGES:
            pa, pb = cam[a], cam[b]
            if pa[2] <= 0.1 and pb[2] <= 0.1:
                continue
            # clip the behind-camera end to the z=0.1 plane
            if pa[2] <= 0.1 or pb[2] <= 0.1:
                t = (0.1 - pa[2]) / (pb[2] - pa[2])
                mid = pa + t * (pb - pa)
                pa, pb = (mid, pb) if pa[2] <= 0.1 else (pa, mid)
            ua = (K[0, 0] * pa[0] / pa[2] + K[0, 2],
                  K[1, 1] * pa[1] / pa[2] + K[1, 2])
            ub = (K[0, 0] * pb[0] / pb[2] + K[0, 2],
                  K[1, 1] * pb[1] / pb[2] + K[1, 2])
            _draw_line(out, ua, ub, color)
    return out
