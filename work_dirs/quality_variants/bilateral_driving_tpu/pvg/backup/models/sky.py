"""Sky models: MLP sky and learned cube-map EnvLight.

Counterparts of the reference's `SkyModel` (project/models/modules.py:116-174)
and `EnvLight` (modules.py:176-211; the Sky model in shipped configs,
omnire_ms_bilateral.yaml:239-245). The trainer composites
`rgb + sky * (1 - opacity)` (project/models/trainers/base.py:491-497).

EnvLight replaces nvdiffrast's `dr.texture(boundary_mode='cube')` with a pure
jnp cube-map sampler: branch-free face selection (where-chains over the
dominant axis) + per-face clamped bilinear gather — differentiable w.r.t. the
cube texture.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import encoders

# world -> OpenGL axis permutation applied to view dirs (modules.py:190)
# numpy (not jnp): module-level device arrays would initialize the XLA
# backend at import, which forbids a later jax.distributed.initialize()
TO_OPENGL = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]],
                     dtype=np.float32)


# --------------------------------------------------------------------------
# SkyModel: sinusoidal dirs + appearance embedding -> MLP -> sigmoid RGB
# --------------------------------------------------------------------------


def init_sky_mlp(key, num_images: int, head_width: int = 64,
                 appearance_dim: int = 16):
    k1, k2 = jax.random.split(key)
    in_dim = encoders.sinusoidal_dim(3, 0, 6) + appearance_dim
    return {
        "embedding": encoders.embedding_init(k1, num_images, appearance_dim),
        "head": encoders.mlp_init(k2, in_dim, 3, 3, head_width, skips=(1,)),
    }


def sky_mlp_color(params, viewdirs: jax.Array, img_idx,
                  use_mean_embedding: bool = False) -> jax.Array:
    """(..., 3) sky RGB. At test time the reference uses the mean appearance
    embedding (modules.py:158-166)."""
    enc = encoders.sinusoidal_encode(viewdirs, 0, 6)
    emb_table = params["embedding"]
    emb = jnp.where(
        use_mean_embedding,
        jnp.mean(emb_table, axis=0),
        emb_table[img_idx],
    )
    emb = jnp.broadcast_to(emb, (*enc.shape[:-1], emb.shape[-1]))
    out = encoders.mlp_apply(params["head"], jnp.concatenate([enc, emb], -1))
    return jax.nn.sigmoid(out)


# --------------------------------------------------------------------------
# EnvLight: learned cube map
# --------------------------------------------------------------------------


def init_envlight(key, resolution: int = 1024):
    del key
    return {"base": jnp.full((6, resolution, resolution, 3), 0.5)}


def _cube_faces_uv(d: jax.Array):
    """OpenGL cube-map face index + (u, v) in [-1, 1] for directions (..., 3)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    eps = 1e-9

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    # face: 0:+x 1:-x 2:+y 3:-y 4:+z 5:-z
    face = jnp.where(
        is_x, jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az)) + eps
    u = jnp.where(
        is_x, jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    v = jnp.where(
        is_x, -y,
        jnp.where(is_y, jnp.where(y >= 0, z, -z), -y),
    )
    return face.astype(jnp.int32), u / ma, v / ma


def sample_cubemap(base: jax.Array, dirs: jax.Array) -> jax.Array:
    """Bilinear cube-map lookup; base (6, R, R, C), dirs (..., 3) (normalized
    internally). Per-face border-clamped filtering (nvdiffrast filters across
    seams; the difference is subpixel at R>=64)."""
    res = base.shape[1]
    c = base.shape[-1]
    d = dirs * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-18))
    face, u, v = _cube_faces_uv(d)

    pix_u = jnp.clip((u * 0.5 + 0.5) * res - 0.5, 0.0, res - 1)
    pix_v = jnp.clip((v * 0.5 + 0.5) * res - 0.5, 0.0, res - 1)
    u0 = jnp.clip(jnp.floor(pix_u), 0, res - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(pix_v), 0, res - 2).astype(jnp.int32)
    wu = pix_u - u0
    wv = pix_v - v0

    flat = base.reshape(6 * res * res, c)

    def corner(vi, ui):
        return flat[(face * res + vi) * res + ui]

    wu = wu[..., None]
    wv = wv[..., None]
    out = (
        corner(v0, u0) * (1 - wv) * (1 - wu)
        + corner(v0, u0 + 1) * (1 - wv) * wu
        + corner(v0 + 1, u0) * wv * (1 - wu)
        + corner(v0 + 1, u0 + 1) * wv * wu
    )
    return out


def envlight_color(params, viewdirs: jax.Array,
                   interpret=None) -> jax.Array:
    """Sky RGB from world view directions (modules.py:193-206; note: no
    sigmoid/clamp, matching the reference).

    `interpret` not None selects the Pallas window-splat backward
    (ops/cubemap.py — XLA's scatter-add VJP costs ~28 ms/step at 544x320);
    None keeps the pure-XLA autodiff path (small evals, unit tests)."""
    d = viewdirs @ TO_OPENGL.T
    if interpret is None:
        return sample_cubemap(params["base"], d)
    from ..ops import cubemap

    return cubemap.sample_splat_vjp(params["base"], d, interpret)
