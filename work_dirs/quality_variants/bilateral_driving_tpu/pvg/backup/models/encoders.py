"""Functional MLP / encoding primitives (plain pytree params, no framework).

Counterparts of the reference's `SinusoidalEncoder`, `MLP`, `nn.Embedding`
(project/models/modules.py:29-114, 874-922). Parameters are nested dicts so
the trainer can label optimizer groups by path; all applies are pure and
jit/vmap-friendly.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Static:
    """Hashable static metadata embedded in a param pytree (zero leaves, so
    grad/optimizers skip it)."""
    value: Any


def sinusoidal_encode(x: jax.Array, min_deg: int, max_deg: int,
                      use_identity: bool = True) -> jax.Array:
    """Positional encoding matching modules.py:29-73: scales 2^[min,max) on
    each input dim, sin+cos, with the raw input prepended."""
    if min_deg == max_deg:
        return x
    scales = jnp.asarray([2.0 ** i for i in range(min_deg, max_deg)], x.dtype)
    xb = x[..., None, :] * scales[:, None]          # (..., L, D)
    sines = jnp.sin(jnp.concatenate(
        [xb, xb + 0.5 * jnp.pi], axis=-2))          # sin and cos
    enc = sines.reshape(*x.shape[:-1], -1)
    if use_identity:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def sinusoidal_dim(in_dim: int, min_deg: int, max_deg: int,
                   use_identity: bool = True) -> int:
    return in_dim * (2 * (max_deg - min_deg) + (1 if use_identity else 0))


def mlp_init(key: jax.Array, in_dim: int, out_dim: int, num_layers: int,
             hidden: int, skips: Sequence[int] = (), zero_init_last=False,
             zero_init_all=False, dtype=jnp.float32):
    """Kaiming-uniform init (torch Linear default) for an MLP with skip
    connections at the given layer indices (concat input, modules.py:75-114)."""
    dims_in = []
    d = in_dim
    for i in range(num_layers):
        if i in skips:
            d = d + in_dim
        dims_in.append(d)
        d = hidden if i < num_layers - 1 else out_dim
    dims_out = [hidden] * (num_layers - 1) + [out_dim]

    params = []
    keys = jax.random.split(key, num_layers)
    for i, (di, do) in enumerate(zip(dims_in, dims_out)):
        bound = 1.0 / math.sqrt(di)
        w = jax.random.uniform(keys[i], (di, do), dtype, -bound, bound)
        b = jax.random.uniform(jax.random.fold_in(keys[i], 1), (do,), dtype,
                               -bound, bound)
        if zero_init_all or (zero_init_last and i == num_layers - 1):
            w = jnp.zeros_like(w)
            b = jnp.zeros_like(b)
        params.append({"w": w, "b": b})
    return {"layers": params, "skips": Static(tuple(skips))}


def mlp_apply(params, x: jax.Array) -> jax.Array:
    inp = x
    layers = params["layers"]
    skips = params["skips"].value
    for i, layer in enumerate(layers):
        if i in skips:
            x = jnp.concatenate([x, inp], axis=-1)
        x = x @ layer["w"] + layer["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def embedding_init(key: jax.Array, num: int, dim: int, zero=False,
                   dtype=jnp.float32) -> jax.Array:
    if zero:
        return jnp.zeros((num, dim), dtype)
    return jax.random.normal(key, (num, dim), dtype)
