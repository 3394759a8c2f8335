"""Multi-host (multi-process) SPMD entry.

The reference has no working multi-GPU/multi-node path (its
`project/utils/misc.py:99-125` DDP helpers are dead code; the trainer
asserts batch 1 on one device). Here multi-host is the same code path as
single-host: `jax.distributed.initialize()` turns N processes into one JAX
runtime whose `jax.devices()` spans all hosts; every mesh/shard_map in
parallel/{data,tile}_parallel.py then works unchanged, with XLA routing
collectives over ICI within a host/slice and DCN across.

Launch (per process):
    python -m bilateral_driving_tpu.tools.train ... \
        --coordinator host0:7777 --num_processes 2 --process_id $RANK
or rely on auto-detection (TPU pods populate the env so bare
`initialize()` works; see maybe_initialize).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class DistConfig:
    coordinator: Optional[str] = None   # "host:port" of process 0
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    local_device_ids: Optional[str] = None  # e.g. "0,1" to pin chips


def maybe_initialize(cfg: DistConfig) -> bool:
    """Join the multi-process runtime when configured; no-op otherwise.

    Returns True when running multi-process. Safe to call twice (the second
    call is ignored)."""
    if cfg.coordinator is None and cfg.num_processes is None:
        return jax.process_count() > 1
    kw = {}
    if cfg.coordinator is not None:
        kw["coordinator_address"] = cfg.coordinator
    if cfg.num_processes is not None:
        kw["num_processes"] = int(cfg.num_processes)
    if cfg.process_id is not None:
        kw["process_id"] = int(cfg.process_id)
    if cfg.local_device_ids:
        kw["local_device_ids"] = [int(x) for x in
                                  cfg.local_device_ids.split(",")]
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:   # already initialized
        if "already" not in str(e).lower():
            raise
    return jax.process_count() > 1


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch_to_global(stacked_local, mesh: Mesh):
    """Assemble a global device-sharded batch from each process's local
    shard (leading axis = local device count). The result behaves exactly
    like shard_batch's output on one host: leading axis = global devices."""
    axis = mesh.axis_names[0]

    def put(x):
        spec = P(axis) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))

    return jax.tree.map(put, stacked_local)


def process_train_indices(train_indices, seed: int, step: int,
                          mesh: Mesh) -> np.ndarray:
    """Deterministic per-step image choice for THIS process's local devices:
    all processes derive the same global permutation, then slice their own
    devices' rows — no cross-host data exchange."""
    rng = np.random.RandomState((seed * 1_000_003 + step) % (2 ** 31 - 1))
    n = mesh.size
    picks = rng.choice(len(train_indices), size=n,
                       replace=len(train_indices) < n)
    lo = jax.process_index() * jax.local_device_count()
    return np.asarray(train_indices)[
        picks[lo:lo + jax.local_device_count()]]
