"""TensorBoard adapter (reference logs scalars/images through wandb and
tensorboard, project/tools/train.py:216-246; wandb needs network so the
offline-capable tensorboard writer is the primary sink here).

Soft dependency: uses torch.utils.tensorboard when importable, else becomes
a no-op so training never requires it.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class TBWriter:
    def __init__(self, log_dir: Optional[str]):
        self._w = None
        if log_dir is None:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir=log_dir)
        except Exception:   # tensorboard absent -> JSONL/console remain
            self._w = None

    @property
    def active(self) -> bool:
        return self._w is not None

    def scalars(self, metrics: Dict[str, float], step: int) -> None:
        if self._w is None:
            return
        for k, v in metrics.items():
            try:
                self._w.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def image(self, tag: str, img_hwc: np.ndarray, step: int) -> None:
        if self._w is None:
            return
        arr = np.clip(np.asarray(img_hwc, np.float32), 0, 1)
        self._w.add_image(tag, arr, step, dataformats="HWC")

    def close(self) -> None:
        if self._w is not None:
            self._w.flush()
            self._w.close()


class WandbWriter:
    """wandb adapter (reference tools/train.py:64-80 inits wandb with a
    retry loop and syncs tensorboard). Soft dependency: no-op unless the
    `wandb` package is importable AND enable=True; offline mode is forced
    when no API key is configured so runs never block on network."""

    def __init__(self, enable: bool, project: str, run_name: str,
                 config: Optional[dict] = None, log_dir: Optional[str] = None):
        self._run = None
        if not enable:
            return
        try:
            import os

            import wandb

            if not os.environ.get("WANDB_API_KEY"):
                os.environ.setdefault("WANDB_MODE", "offline")
            for attempt in range(3):   # retry loop (train.py:66-76)
                try:
                    self._run = wandb.init(project=project, name=run_name,
                                           config=config, dir=log_dir,
                                           reinit=True)
                    break
                except Exception:
                    continue
        except Exception:
            self._run = None

    @property
    def active(self) -> bool:
        return self._run is not None

    def scalars(self, metrics: Dict[str, float], step: int) -> None:
        if self._run is None:
            return
        clean = {}
        for k, v in metrics.items():
            try:
                clean[k] = float(v)
            except (TypeError, ValueError):
                continue   # non-numeric markers (e.g. lpips=None)
        try:
            self._run.log(clean, step=step)
        except (TypeError, ValueError):
            pass

    def image(self, tag: str, img_hwc: np.ndarray, step: int) -> None:
        if self._run is None:
            return
        try:
            import wandb

            arr = np.clip(np.asarray(img_hwc, np.float32), 0, 1)
            self._run.log({tag: wandb.Image(arr)}, step=step)
        except Exception:
            pass

    def close(self) -> None:
        if self._run is not None:
            self._run.finish()
