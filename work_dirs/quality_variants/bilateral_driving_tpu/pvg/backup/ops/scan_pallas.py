"""Pallas blocked prefix scans (inclusive, along lanes).

XLA's cumsum/cummax on ~10^6-element buffers cost 3-6 ms on a v5e core even
with the hierarchical (rows, 1024) trick in ops/scan_utils.py — the scan is
pure bandwidth (~0.1 ms at roofline) but XLA materializes intermediates.
Here the scan is one sequential-grid Pallas pass: each step loads an
(R, BLK) block, runs a log-step Hillis-Steele scan in VMEM (pltpu.roll +
masked combine), adds a carry kept in VMEM scratch across grid steps
(the TPU grid is sequential), and writes the block out. One HBM read +
one write of the data, nothing else.

Used by ops/binning.py (`_fill_monotone` cummax, offsets cumsum) and
ops/pipeline.py (`_expand_sort_bwd` per-row gradient cumsum) when running
on the real TPU backend; the XLA fallback in scan_utils stays for
CPU/interpret paths.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8192          # lanes per grid step (block = rows x BLK in VMEM)
_OPS = {
    "sum": (jnp.add, 0),
    "max": (jnp.maximum, "min"),    # identity resolved per dtype
    "min": (jnp.minimum, "max"),
}


def _identity(op: str, dtype):
    if op == "sum":
        return jnp.zeros((), dtype)
    info = (jnp.iinfo if jnp.issubdtype(dtype, jnp.integer) else jnp.finfo)(
        dtype)
    return jnp.array(info.min if op == "max" else info.max, dtype)


def _scan_kernel(x_ref, o_ref, carry, *, op: str, rows: int):
    combine, _ = _OPS[op]
    i = pl.program_id(0)
    ident = _identity(op, x_ref.dtype)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.full_like(carry, ident)

    s = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, BLK), 1)
    shift = 1
    while shift < BLK:
        rolled = pltpu.roll(s, shift, axis=1)
        s = combine(s, jnp.where(lane >= shift, rolled, ident))
        shift *= 2
    s = combine(s, carry[:, 0:1])
    o_ref[:] = s
    carry[:, 0:1] = s[:, BLK - 1:BLK]


def scan_rows(x: jax.Array, op: str = "sum",
              interpret: bool = False) -> jax.Array:
    """Inclusive prefix scan of (R, M) along axis 1, each row scanned
    independently (the carry chains along the full row)."""
    r, m = x.shape
    ident = _identity(op, x.dtype)
    rp = -(-r // 8) * 8
    mp = -(-m // BLK) * BLK
    if mp != m or rp != r:
        x = jnp.pad(x, ((0, rp - r), (0, mp - m)), constant_values=ident)
    grid = mp // BLK
    out = pl.pallas_call(
        functools.partial(_scan_kernel, op=op, rows=rp),
        grid=(grid,),
        in_specs=[pl.BlockSpec((rp, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rp, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, mp), x.dtype),
        scratch_shapes=[pltpu.VMEM((rp, 128), x.dtype)],
        interpret=interpret,
    )(x)
    return out[:r, :m]


def scan1d(x: jax.Array, op: str = "sum",
           interpret: bool = False) -> jax.Array:
    """Inclusive scan of a 1-D array: reshaped to (rows, M/rows) with a
    row-linking carry is NOT possible in one pass, so 1-D scans run the
    blocked kernel on a single row (still one read+write of HBM)."""
    return scan_rows(x[None, :], op, interpret)[0]
