"""Scene-graph node protocol: every node class turns its parameters into a
fixed-capacity `GaussianBundle` in world space for the current frame.

Mirrors the reference's `get_gaussians(cam) -> gs_dict` contract
(project/models/trainers/base.py:342-383) and the `GSModelType` class labels
(base.py:23-27), re-designed for XLA: instead of per-step boolean filtering
and `torch.cat` of variable-length tensors, each class always emits its full
static capacity with dead/invalid points masked to zero opacity; composition
is a static concat.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

# reference: GSModelType Background=0, RigidNodes=1, SMPLNodes=2,
# DeformableNodes=3 (base.py:23-27)
NODE_CLASS_IDS: Dict[str, int] = {
    "Background": 0,
    "RigidNodes": 1,
    "SMPLNodes": 2,
    "DeformableNodes": 3,
}


class GaussianBundle(NamedTuple):
    """World-space activated Gaussians of one node class (static capacity)."""
    means: jax.Array        # (C, 3)
    scales: jax.Array       # (C, 3) activated (exp)
    quats: jax.Array        # (C, 4) normalized
    opacities: jax.Array    # (C,) activated (sigmoid), 0 for dead/invalid
    rgbs: jax.Array         # (C, 3)


def concat_bundles(bundles: Dict[str, GaussianBundle]):
    """Static concat in NODE_CLASS_IDS order; returns (bundle, labels)."""
    names = [n for n in NODE_CLASS_IDS if n in bundles]
    parts = [bundles[n] for n in names]
    labels = jnp.concatenate([
        jnp.full((b.means.shape[0],), NODE_CLASS_IDS[n], jnp.int32)
        for n, b in zip(names, parts)
    ])
    merged = GaussianBundle(*(jnp.concatenate(xs) for xs in zip(*parts)))
    return merged, labels


def sh_colors(means: jax.Array, sh_dc: jax.Array, sh_rest: jax.Array,
              cam_origin: jax.Array, step, sh_degree_interval: int,
              max_degree: int) -> jax.Array:
    """View-dependent color path shared by every class (vanilla.py:378-395):
    degree scheduled by step, clamp(sh+0.5, 0, 1)."""
    from ..core import sh as sh_lib

    if max_degree == 0:
        return jax.nn.sigmoid(sh_dc[:, 0, :])
    viewdirs = jax.lax.stop_gradient(means) - cam_origin[None, :]
    n = jnp.minimum(step // sh_degree_interval, max_degree)
    coeffs = jnp.concatenate([sh_dc, sh_rest], axis=1)
    rgbs = sh_lib.eval_sh(coeffs, viewdirs, n, max_degree=max_degree)
    return jnp.clip(rgbs + 0.5, 0.0, 1.0)


def quat_norm(q: jax.Array) -> jax.Array:
    # grad-safe at q = 0 (see core.transforms.quat_normalize)
    sq = jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-16)
    return q * jax.lax.rsqrt(sq)
