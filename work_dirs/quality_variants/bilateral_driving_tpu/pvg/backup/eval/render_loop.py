"""Evaluation / rendering loops (reference project/models/video_utils.py:47-95
`render_images` + tools/render.py `do_render`).

Renders a split of the dataset through the trainer forward (with test-set
neighbor-averaged bilateral affines and pose interpolation), computes the
per-image metric set, per-class decomposed renders via opacity masking
(scene_graph.py:296-313), and writes videos via imageio.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.nodes import NODE_CLASS_IDS
from ..train import trainer as trainer_mod
from . import metrics as metrics_mod


def _forward_fns(cfg, statics, masks):
    fwd_train = jax.jit(functools.partial(
        trainer_mod.forward, cfg, in_test_set=False))
    fwd_test = jax.jit(functools.partial(
        trainer_mod.forward, cfg, in_test_set=True))
    return fwd_train, fwd_test


def render_images(cfg, state, statics, data, image_indices,
                  neighbor_map: Optional[Dict] = None,
                  compute_metrics: bool = True,
                  compute_geo: bool = False,
                  downscale: int = 1,
                  decompose_classes: bool = False,
                  color_correct_eval: bool = False) -> Dict:
    """Render the given dataset image indices; returns dict of lists:
    rgbs, gt_rgbs, depths, opacities, per-image metrics."""
    full_statics = trainer_mod.merge_statics(statics, state.aux)
    fwd_train, fwd_test = _forward_fns(cfg, full_statics, state.masks)

    out = {"rgbs": [], "gt_rgbs": [], "depths": [], "opacities": [],
           "metrics": [], "sky_rgbs": []}
    if decompose_classes:
        out["decomposed"] = {n: [] for n in trainer_mod.gaussian_classes(cfg)}

    for idx in image_indices:
        batch = data.get_batch(int(idx), downscale=downscale)
        is_test = neighbor_map is not None and int(idx) in neighbor_map
        if is_test:
            nbrs = jnp.asarray(neighbor_map[int(idx)])
            o = fwd_test(state.params, full_statics, state.masks, batch,
                         state.step, neighbor_idx=nbrs)
        else:
            o = fwd_train(state.params, full_statics, state.masks, batch,
                          state.step)
        pred = np.clip(np.asarray(o["rgb"]), 0, 1)
        gt = np.asarray(batch["pixels"])
        if color_correct_eval:
            # bilateral-paper-style eval: least-squares color match before
            # metrics (video_utils_color_correction.py:201)
            from ..models import bilateral as bilateral_mod
            import jax.numpy as _jnp

            pred = np.asarray(bilateral_mod.color_correct(
                _jnp.asarray(pred), _jnp.asarray(gt)))
        out["rgbs"].append(pred)
        out["gt_rgbs"].append(gt)
        out["depths"].append(np.asarray(o["depth"][..., 0]))
        out["opacities"].append(np.asarray(o["opacity"][..., 0]))
        out["sky_rgbs"].append(np.asarray(o["rgb_sky"]))

        if compute_metrics:
            m = metrics_mod.image_metrics(
                pred, gt,
                sky_mask=data.sky_masks[idx][::downscale, ::downscale]
                if downscale > 1 else data.sky_masks[idx],
                dynamic_mask=_ds(data.dynamic_masks[idx], downscale),
                human_mask=_ds(data.human_masks[idx], downscale),
                vehicle_mask=_ds(data.vehicle_masks[idx], downscale),
            )
            if compute_geo and data.lidar_depth_maps is not None:
                gt_depth = _ds(data.lidar_depth_maps[idx], downscale)
                m.update(metrics_mod.depth_metrics(
                    np.asarray(o["depth"][..., 0]), gt_depth))
                K = np.asarray(batch["intrinsics"])
                c2w = np.asarray(batch["camera_to_world"])
                pd = metrics_mod.depth_to_points(
                    np.asarray(o["depth"][..., 0]) *
                    (gt_depth > 0), K, c2w)
                pg = metrics_mod.depth_to_points(gt_depth, K, c2w)
                m["chamfer"] = metrics_mod.chamfer_distance(pd, pg)
                m["chamfer_p97"] = metrics_mod.chamfer_distance(
                    pd, pg, percentile=97)
                m.update(metrics_mod.per_class_chamfer(
                    np.asarray(o["depth"][..., 0]) * (gt_depth > 0),
                    gt_depth, K, c2w,
                    {"dynamic": _ds(data.dynamic_masks[idx], downscale),
                     "human": _ds(data.human_masks[idx], downscale),
                     "vehicle": _ds(data.vehicle_masks[idx], downscale)}))
            out["metrics"].append(m)

        if decompose_classes:
            for name in trainer_mod.gaussian_classes(cfg):
                mult = _class_opacity_mask(cfg, state.masks, name)
                oc = fwd_train(state.params, full_statics, state.masks,
                               batch, state.step,
                               opacity_multiplier=mult)
                out["decomposed"][name].append(
                    np.clip(np.asarray(oc["rgb_gaussians"]), 0, 1))
    return out


def _ds(x, downscale):
    return x[::downscale, ::downscale] if downscale > 1 else x


def _class_opacity_mask(cfg, masks, keep_class):
    """Opacity multiplier zeroing all classes except `keep_class`
    (scene_graph.py:296-313 re-render path)."""
    parts = []
    for name in trainer_mod.gaussian_classes(cfg):
        c = masks[name].shape[0]
        parts.append(jnp.full((c,), 1.0 if name == keep_class else 0.0))
    return jnp.concatenate(parts)


def aggregate_metrics(per_image: List[Dict]) -> Dict[str, float]:
    keys = set().union(*(m.keys() for m in per_image)) if per_image else set()
    out = {}
    for k in keys:
        vals = [m[k] for m in per_image if k in m and np.isfinite(m[k])]
        if vals:
            out[k] = float(np.mean(vals))
    if per_image and "lpips" not in out:
        # make the absence visible in every artifact, not just in code: the
        # pure-JAX LPIPS port is present but its VGG weight npz cannot be
        # exported in this environment (no torchvision, no egress) — see
        # tools/export_lpips_weights.py
        out["lpips"] = None
        out["lpips_note"] = "null: VGG weights not vendored " \
            "(tools/export_lpips_weights.py)"
    return out


def save_video(frames: List[np.ndarray], path: str, fps: int = 10):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
    try:
        imageio.mimwrite(path, arr, fps=fps)
    except Exception:
        # fall back to per-frame PNGs if no video codec is available
        base = os.path.splitext(path)[0]
        os.makedirs(base, exist_ok=True)
        for i, f in enumerate(arr):
            imageio.imwrite(os.path.join(base, f"{i:04d}.png"), f)


def depth_visualizer(depth: np.ndarray, max_depth: float = 80.0) -> np.ndarray:
    """Turbo-ish depth colormap (utils/visualization.py:477)."""
    import matplotlib.cm as cm

    d = np.clip(depth / max_depth, 0, 1)
    return cm.turbo(1.0 - d)[..., :3].astype(np.float32)
