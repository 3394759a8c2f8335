"""Rendering CLI (reference project/tools/render.py).

    python -m bilateral_driving_tpu.tools.render --log_dir ... \
        [--traj front_center_interp|s_curve|three_key_poses] [--frames 100]

Renders test/full-split videos and novel-trajectory fly-throughs
(render.py:23-121; novel trajectories via utils/trajectory.py).
"""
from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..eval import render_loop
from ..train import checkpoint, trainer
from ..utils import config as config_lib, trajectory
from ..utils.logging import setup_logging, logger
from . import common


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--traj", default="front_center_interp")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--skip_splits", action="store_true")
    p.add_argument("opts", nargs="*")
    args = p.parse_args()

    setup_logging(args.log_dir)
    cfg = config_lib.load_config(os.path.join(args.log_dir, "config.yaml"),
                                 overrides=args.opts)
    key = jax.random.key(0)
    interpret = jax.default_backend() not in ("tpu", "axon")
    tcfg, data, params, statics, aux, masks = common.build_real_scene(
        key, cfg, interpret)
    state = trainer.init_state(key, tcfg, params, masks, aux)
    ckpt = args.checkpoint or checkpoint.latest_checkpoint(
        os.path.join(args.log_dir, "checkpoints"))
    if ckpt:
        state = checkpoint.restore_checkpoint(ckpt, state)

    out_dir = os.path.join(args.log_dir, "videos")
    test_stride = cfg.get_path("data.test_image_stride", 10)
    neighbor_map = data.neighbor_train_indices(test_stride)

    if not args.skip_splits:
        _, test_idx = data.split_train_test(test_stride)
        for split, indices in [("test", test_idx),
                               ("full", np.arange(data.num_images))]:
            if len(indices) == 0:
                continue
            res = render_loop.render_images(
                tcfg, state, statics, data, indices,
                neighbor_map=neighbor_map, compute_metrics=False)
            render_loop.save_video(res["rgbs"],
                                   os.path.join(out_dir, f"{split}.mp4"))
            depth_vis = [render_loop.depth_visualizer(d)
                         for d in res["depths"]]
            render_loop.save_video(depth_vis,
                                   os.path.join(out_dir, f"{split}_depth.mp4"))
            logger.info(f"wrote {split} videos ({len(indices)} frames)")

    # novel trajectory (novel_view=True disables camera refinement,
    # base.py:325-329)
    per_cam = {}
    for ci in range(data.num_cams):
        sel = data.cam_of_image == ci
        per_cam[ci] = data.cam_to_worlds[sel]
    traj = trajectory.get_novel_trajectory(per_cam, args.traj, args.frames)
    full_statics = trainer.merge_statics(statics, state.aux)
    fwd = jax.jit(functools.partial(trainer.forward, tcfg, novel_view=True,
                                    in_test_set=True))
    frames = []
    base_batch = data.get_batch(0)
    from ..data.scene import _pixel_viewdirs
    K = np.asarray(base_batch["intrinsics"])
    h, w = base_batch["pixels"].shape[:2]
    for c2w in traj:
        b = dict(base_batch)
        b["camera_to_world"] = jnp.asarray(c2w)
        # sky is composited from per-pixel view directions — recompute for
        # the novel pose (pixel_source.py:1070 novel-view render data)
        b["viewdirs"] = jnp.asarray(_pixel_viewdirs(h, w, K,
                                                    np.asarray(c2w)))
        o = fwd(state.params, full_statics, state.masks, b, state.step)
        frames.append(np.clip(np.asarray(o["rgb"]), 0, 1))
    render_loop.save_video(frames, os.path.join(out_dir, f"novel_{args.traj}.mp4"))
    logger.info(f"wrote novel trajectory video ({args.frames} frames)")


if __name__ == "__main__":
    main()
