"""Per-image affine color transform (OmniRe appearance baseline).

Counterpart of the reference's `AffineTransform`
(project/models/modules.py:213-267): per-image embedding -> small MLP -> one
3x4 affine, zero-initialized so it starts at identity; optional per-pixel
variant concatenates pixel coordinates. Regularized toward identity
(base.py:598-605).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import encoders


def init_affine(key, num_images: int, embedding_dim: int = 4,
                pixel_affine: bool = False, hidden: int = 64):
    in_dim = embedding_dim + (2 if pixel_affine else 0)
    return {
        "embedding": encoders.embedding_init(key, num_images, embedding_dim,
                                             zero=True),
        # the reference zero-inits the whole decoder (modules.py:242-247)
        "decoder": encoders.mlp_init(key, in_dim, 12, 2, hidden,
                                     zero_init_all=True),
    }


def affine_mats(params, img_idx, pixel_coords: jax.Array | None = None,
                use_mean_embedding: bool = False) -> jax.Array:
    """(..., 3, 4) affine; identity added to the linear part
    (modules.py:262-264)."""
    table = params["embedding"]
    emb = jnp.where(use_mean_embedding, jnp.mean(table, axis=0),
                    table[img_idx])
    if pixel_coords is not None:
        emb = jnp.broadcast_to(emb, (*pixel_coords.shape[:-1], emb.shape[-1]))
        emb = jnp.concatenate([emb, pixel_coords], axis=-1)
    out = encoders.mlp_apply(params["decoder"], emb)
    mats = out.reshape(*out.shape[:-1], 3, 4)
    return mats.at[..., :3, :3].add(jnp.eye(3, dtype=mats.dtype))


def identity_reg_loss(mats: jax.Array) -> jax.Array:
    """|A - I| + |t| regularizer (base.py:598-605)."""
    eye = jnp.eye(3, dtype=mats.dtype)
    return (jnp.mean(jnp.abs(mats[..., :3, :3] - eye))
            + jnp.mean(jnp.abs(mats[..., :3, 3])))
