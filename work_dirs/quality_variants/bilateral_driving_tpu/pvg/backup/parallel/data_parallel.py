"""Multi-chip SPMD training over a device mesh.

The reference is strictly single-GPU, batch-size-1 (base.py:411 asserts it;
SURVEY.md §2.2) — this layer is new capability, not a port. Scaling axes for
driving scenes:

  * `data`: cameras/images per step. nuScenes trains 6 cameras per frame, so
    a v5e/v5p slice shards one multi-camera step across chips: each chip
    renders ONE full image through the existing single-image pipeline
    (projection -> binning -> Pallas tiles stay chip-local, zero
    communication), then per-Gaussian / grid / MLP parameter gradients are
    `psum`-reduced over ICI and a replicated optimizer update is applied.
    This is exactly gsplat-style training semantics with an effective batch
    of n_devices images — gradients are *summed*, matching the reference's
    accumulation of per-image losses one at a time (lr semantics preserved
    by scaling: we average over the axis instead, see `pmean`).

  * `tile` (intra-image sharding of tiles/Gaussians) is the planned axis for
    single-image latency; per-chip image parallelism already saturates ICI-
    free throughput for multi-camera training.

Multi-host: `jax.distributed.initialize()` + the same mesh spanning all
processes; each host feeds its local batch shard. Collectives ride ICI/DCN
automatically through shard_map's psum.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..train import trainer as trainer_mod


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))


def stack_batches(batches) -> Dict:
    """Stack per-image batch dicts into a leading device axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def parallel_train_step(cfg: trainer_mod.TrainerConfig, statics, mesh: Mesh,
                        ) -> callable:
    """Build a jitted SPMD train step: state replicated, batch sharded over
    `data`, gradients pmean'd over ICI, replicated update+refinement.

    Returns step(state, stacked_batch) -> (state, metrics)."""
    axis = mesh.axis_names[0]

    def _grads(state, batch_slice):
        # batch_slice has a leading local axis of size 1 inside shard_map
        batch = jax.tree.map(lambda x: x[0], batch_slice)
        total, loss_dict, outputs, g_params, g_dummy = \
            trainer_mod.compute_grads(cfg, statics, state, batch)
        # average over devices = average over the image batch
        total = jax.lax.pmean(total, axis)
        loss_dict = jax.lax.pmean(loss_dict, axis)
        g_params = jax.lax.pmean(g_params, axis)
        # densification stats: radii/screen-grads are per-Gaussian maxima/
        # sums across the image batch — reduce accordingly
        g_dummy = jax.lax.psum(g_dummy, axis)
        radii = jax.lax.pmax(outputs["info"]["radii"], axis)
        overflow = jax.lax.pmax(
            outputs["info"]["overflow"].astype(jnp.int32), axis)
        num_isects = jax.lax.psum(outputs["info"]["num_isects"], axis)
        psnr = jax.lax.pmean(
            -10.0 * jnp.log10(jnp.maximum(
                jnp.mean((outputs["rgb"] - batch["pixels"]) ** 2), 1e-12)),
            axis)
        return (total, loss_dict, g_params, g_dummy, radii, overflow,
                num_isects, psnr)

    state_specs = P()      # replicated
    grads_sharded = shard_map(
        _grads, mesh=mesh,
        in_specs=(state_specs, P(axis)),
        out_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: trainer_mod.TrainerState, stacked_batch
             ) -> Tuple[trainer_mod.TrainerState, Dict]:
        (total, loss_dict, g_params, g_dummy, radii, overflow, num_isects,
         psnr) = grads_sharded(state, stacked_batch)
        # representative batch for refinement bookkeeping (image size only)
        batch0 = jax.tree.map(lambda x: x[0], stacked_batch)
        outputs_stub = {"info": {"radii": radii,
                                 "overflow": overflow.astype(bool),
                                 "num_isects": num_isects},
                        "rgb": batch0["pixels"], "labels": None}
        new_state, metrics = trainer_mod.apply_grads_and_refine(
            cfg, statics, state, batch0, total, loss_dict, outputs_stub,
            g_params, g_dummy)
        metrics["psnr"] = psnr
        return new_state, metrics

    return step


def shard_batch(stacked_batch, mesh: Mesh):
    """Place a stacked batch with NamedSharding over the data axis."""
    axis = mesh.axis_names[0]

    def put(x):
        spec = P(axis) if x.ndim >= 1 and x.shape[0] == mesh.size else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, stacked_batch)
