"""Checkpoint / resume via orbax.

Improves on the reference, which saves model weights only and raises
NotImplementedError for optimizer resume (project/models/trainers/base.py:
677-753): here the FULL TrainerState (params, aux, masks, density stats,
optax state, step, rng key) round-trips, so training resumes bit-exactly.
Static capacities make restore trivial — no reallocation-to-checkpoint-N
dance (vanilla.py:454-463).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from . import trainer as trainer_mod


def _mask_empty(tree):
    """orbax refuses zero-size arrays (e.g. sh_rest at degree 0); swap them
    for 1-element placeholders symmetric with `restore_checkpoint`."""
    return jax.tree.map(
        lambda x: np.zeros(1, np.float32) if getattr(x, "size", 1) == 0 else x,
        tree)


def save_checkpoint(ckpt_dir: str, state: trainer_mod.TrainerState,
                    step: Optional[int] = None):
    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(ckpt_dir, f"checkpoint_{step}"))
    if os.path.isdir(path):
        # re-running a step (e.g. after a crash at the same step) should
        # overwrite, not die: orbax refuses existing destinations
        import shutil

        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _mask_empty(jax.device_get(state)))
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [d for d in os.listdir(ckpt_dir) if d.startswith("checkpoint_")]
    if not cands:
        return None
    latest = max(cands, key=lambda d: int(d.split("_")[-1]))
    return os.path.join(ckpt_dir, latest)


def restore_checkpoint(path: str,
                       template: trainer_mod.TrainerState
                       ) -> trainer_mod.TrainerState:
    """Restore into the structure of `template` (built by the same config)."""
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path),
                                 item=_mask_empty(jax.device_get(template)))
    return jax.tree.map(
        lambda t, r: t if getattr(t, "size", 1) == 0 else jax.numpy.asarray(r),
        template, restored)
