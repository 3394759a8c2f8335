"""Fast 1-D prefix scans for TPU.

XLA lowers `cumsum`/`cummax` on a 1-D array to a lane-starved (1, M) layout —
at M ~ 10^6 each scan costs ~10 ms on a v5e core. Reshaping to (rows, 1024)
and scanning along lanes with a tiny carry pass over row totals recovers full
VPU width (~100x faster). Used throughout ops/binning.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LANES = 1024


def _prep(x):
    m = x.shape[0]
    rows = -(-m // _LANES)
    return m, rows


def _hier(x, fill, row_scan, carry_op):
    m, rows = _prep(x)
    pad = rows * _LANES - m
    x2 = jnp.pad(x, (0, pad), constant_values=fill).reshape(rows, _LANES)
    scanned = row_scan(x2, axis=1)
    totals = scanned[:, -1]
    # exclusive carry across rows (row counts are small: M/1024)
    carry = row_scan(totals[None, :], axis=1)[0]
    carry = jnp.concatenate([jnp.full((1,), fill, x.dtype), carry[:-1]])
    out = carry_op(scanned, carry[:, None])
    return out.reshape(-1)[:m]


def cumsum(x: jax.Array) -> jax.Array:
    return _hier(x, jnp.zeros((), x.dtype).item() if False else 0,
                 jnp.cumsum, lambda s, c: s + c)


def cummax(x: jax.Array) -> jax.Array:
    fill = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) \
        else -jnp.inf
    return _hier(x, fill, jax.lax.cummax, jnp.maximum)


def cummin(x: jax.Array) -> jax.Array:
    fill = jnp.iinfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.integer) \
        else jnp.inf
    return _hier(x, fill, jax.lax.cummin, jnp.minimum)


def cumsum_rows(x: jax.Array) -> jax.Array:
    """Row-wise inclusive cumsum of (R, M): each row scanned independently
    with the same hierarchical layout."""
    r, m = x.shape
    rows = -(-m // _LANES)
    pad = rows * _LANES - m
    x2 = jnp.pad(x, ((0, 0), (0, pad))).reshape(r * rows, _LANES)
    scanned = jnp.cumsum(x2, axis=1)
    totals = scanned[:, -1].reshape(r, rows)
    carry = jnp.cumsum(totals, axis=1)
    carry = jnp.concatenate([jnp.zeros((r, 1), x.dtype), carry[:, :-1]],
                            axis=1)
    out = scanned.reshape(r, rows, _LANES) + carry[:, :, None]
    return out.reshape(r, rows * _LANES)[:, :m]
