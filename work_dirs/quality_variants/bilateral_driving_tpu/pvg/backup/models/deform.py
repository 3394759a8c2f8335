"""Deformation networks for dynamic Gaussians.

Counterparts of the reference's `DeformNetwork` (project/models/modules.py:925-964)
and `ConditionalDeformNetwork` (modules.py:967-1013): NeRF-style positional
encodings of (x, t) [+ per-instance embedding], an 8x256 trunk whose skip at
D//2 concatenates the embedded input *after* the activation (note: different
from the reference's generic MLP class), and separate heads for position
offset, quaternion delta, and scale delta.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import encoders
from .encoders import Static


def _nerf_encode(x: jax.Array, multires: int) -> jax.Array:
    """NeRF `Embedder` (modules.py:875-922): identity + sin/cos at 2^[0..m-1],
    interleaved per frequency."""
    outs = [x]
    for i in range(multires):
        f = 2.0 ** i
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def _nerf_dim(d: int, multires: int) -> int:
    return d * (1 + 2 * multires)


def _linear_init(key, di, do, zero=False):
    if zero:
        return {"w": jnp.zeros((di, do)), "b": jnp.zeros((do,))}
    bound = 1.0 / math.sqrt(di)
    w = jax.random.uniform(key, (di, do), minval=-bound, maxval=bound)
    b = jax.random.uniform(jax.random.fold_in(key, 1), (do,),
                           minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def init_deform(key, depth: int = 8, width: int = 256, embed_dim: int = 0,
                x_multires: int = 10, t_multires: int = 10,
                deform_quat: bool = True, deform_scale: bool = True):
    """embed_dim=0 gives DeformNetwork; >0 gives ConditionalDeformNetwork."""
    in_dim = _nerf_dim(3, x_multires) + _nerf_dim(1, t_multires) + embed_dim
    skips = (depth // 2,)
    keys = jax.random.split(key, depth + 3)
    trunk = []
    d = in_dim
    for i in range(depth):
        trunk.append(_linear_init(keys[i], d, width))
        d = width + (in_dim if i in skips else 0)
    last_dim = width + in_dim if (depth - 1) in skips else width
    heads = {"warp": _linear_init(keys[depth], last_dim, 3)}
    if deform_quat:
        heads["quat"] = _linear_init(keys[depth + 1], last_dim, 4)
    if deform_scale:
        heads["scale"] = _linear_init(keys[depth + 2], last_dim, 3)
    return {
        "trunk": trunk,
        "heads": heads,
        "meta": Static({
            "skips": skips,
            "x_multires": x_multires,
            "t_multires": t_multires,
        }),
    }


def apply_deform(params, x: jax.Array, t: jax.Array,
                 condition: jax.Array | None = None):
    """Returns (d_xyz, d_quat | None, d_scale | None); x (..., 3), t (..., 1).

    Skip layout matches modules.py:952-959: h = relu(W h); then at skip
    layers h = concat([inputs, h])."""
    meta = params["meta"].value
    x_emb = _nerf_encode(x, meta["x_multires"])
    t_emb = _nerf_encode(t, meta["t_multires"])
    parts = [x_emb, t_emb] + ([condition] if condition is not None else [])
    inp = jnp.concatenate(parts, axis=-1)
    h = inp
    for i, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
        if i in meta["skips"]:
            h = jnp.concatenate([inp, h], axis=-1)
    heads = params["heads"]
    d_xyz = h @ heads["warp"]["w"] + heads["warp"]["b"]
    d_quat = (h @ heads["quat"]["w"] + heads["quat"]["b"]
              if "quat" in heads else None)
    d_scale = (h @ heads["scale"]["w"] + heads["scale"]["b"]
               if "scale" in heads else None)
    return d_xyz, d_quat, d_scale
