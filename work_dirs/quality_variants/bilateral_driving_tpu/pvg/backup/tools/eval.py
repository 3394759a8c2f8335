"""Evaluation CLI (reference project/tools/eval_metrics.py).

    python -m bilateral_driving_tpu.tools.eval \
        --log_dir work_dirs/project/run [--checkpoint path] [opts...]

Rebuilds the trainer from the run's saved config, restores the checkpoint,
renders test + full splits, and dumps aggregated metric JSONs
(eval_metrics.py:24-127).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from ..eval import render_loop
from ..train import checkpoint, trainer
from ..utils import config as config_lib
from ..utils.logging import setup_logging, logger
from . import common


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--max_images", type=int, default=0)
    p.add_argument("--compute_geo", action="store_true")
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
        logger.info(f"restored {ckpt} @ step {int(state.step)}")

    test_stride = cfg.get_path("data.test_image_stride", 10)
    train_idx, test_idx = data.split_train_test(test_stride)
    neighbor_map = data.neighbor_train_indices(test_stride)

    for split, indices in [("test", test_idx), ("full", np.arange(
            data.num_images))]:
        if args.max_images:
            indices = indices[:args.max_images]
        if len(indices) == 0:
            continue
        results = render_loop.render_images(
            tcfg, state, statics, data, indices, neighbor_map=neighbor_map,
            compute_metrics=True, compute_geo=args.compute_geo)
        agg = render_loop.aggregate_metrics(results["metrics"])
        logger.info(f"{split}: {agg}")
        with open(os.path.join(args.log_dir,
                               f"metrics_{split}.json"), "w") as f:
            json.dump(agg, f, indent=2)


if __name__ == "__main__":
    main()
