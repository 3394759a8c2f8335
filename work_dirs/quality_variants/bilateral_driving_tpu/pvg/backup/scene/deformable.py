"""Deformable Gaussians: background DeformableGS and non-rigid instance nodes.

Two reference models:
  * `DeformableGaussians` (project/models/gaussians/deformgs.py): canonical
    background Gaussians + DeformNetwork(x, t) offsets with MeRF-style
    contraction of the input coords and AST (annealed smooth training) noise.
  * `DeformableNodes` (project/models/nodes/deformable.py): RigidNodes whose
    local points additionally deform via ConditionalDeformNetwork(x, t,
    instance embedding) before the rigid transform; input heights normalized
    by instance size (deformable.py:43).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models import deform, encoders
from . import nodes, rigid


class DeformableConfig(NamedTuple):
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    embed_dim: int = 16
    deform_quat: bool = True
    deform_scale: bool = True
    ast_noise_scale: float = 0.0     # AST annealing handled by caller


def contract(x: jax.Array, order: float = jnp.inf) -> jax.Array:
    """MeRF contraction (deformgs.py:25-40): identity inside unit ball,
    (2 - 1/|x|) * x/|x| outside."""
    mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-8)
    contracted = jnp.where(mag <= 1.0, x, (2.0 - 1.0 / mag) * (x / mag))
    return contracted


def linear_noise(step, noise_base: float, total_steps: float):
    """AST noise annealing (deformgs get_linear_noise_func, deformgs.py:42)."""
    return noise_base * jnp.maximum(1.0 - step / total_steps, 0.0)


# --------------------------------------------------------------------------
# background DeformableGS
# --------------------------------------------------------------------------


def deformgs_gaussians(params, net_params, mask, cam_origin, step, t,
                       aabb_center, aabb_scale,
                       cfg: DeformableConfig = DeformableConfig(),
                       ast_noise=0.0) -> nodes.GaussianBundle:
    """Canonical params + DeformNetwork offsets on contracted coords."""
    x = (params["means"] - aabb_center) / aabb_scale
    xc = contract(x)
    tt = jnp.broadcast_to(jnp.asarray(t) + ast_noise, (xc.shape[0], 1))
    d_xyz, d_quat, d_scale = deform.apply_deform(net_params, xc, tt)
    means = params["means"] + d_xyz
    quats = nodes.quat_norm(params["quats"] + (d_quat if d_quat is not None else 0.0))
    log_scales = params["log_scales"] + (d_scale if d_scale is not None else 0.0)
    rgbs = nodes.sh_colors(means, params["sh_dc"], params["sh_rest"],
                           cam_origin, step, cfg.sh_degree_interval,
                           cfg.sh_degree)
    opac = jax.nn.sigmoid(params["logit_opacities"][:, 0]) * mask
    return nodes.GaussianBundle(means, jnp.exp(log_scales), quats, opac, rgbs)


# --------------------------------------------------------------------------
# DeformableNodes (instances)
# --------------------------------------------------------------------------


def init_node_embeddings(key, num_instances: int, embed_dim: int = 16):
    return encoders.embedding_init(key, num_instances, embed_dim)


def node_gaussians(params, statics, mask, cam_origin, step, frame,
                   num_frames: int, t, in_test_set: bool = False,
                   cfg: DeformableConfig = DeformableConfig(),
                   ast_noise=0.0) -> nodes.GaussianBundle:
    """RigidNodes + per-point nonrigid offsets from the conditional deform
    net (deformable.py:35-114). Heights normalized by instance size."""
    point_ids = statics["point_ids"]
    sizes = statics["instances_size"][point_ids]          # (C, 3)
    x_norm = params["means"] / jnp.maximum(sizes, 1e-6)
    emb = params["instance_embeds"][point_ids]
    tt = jnp.broadcast_to(jnp.asarray(t) + ast_noise, (x_norm.shape[0], 1))
    d_xyz, d_quat, d_scale = deform.apply_deform(
        params["deform_net"], x_norm, tt, emb)

    local_means = params["means"] + d_xyz
    local_quats = params["quats"] + (d_quat if (d_quat is not None and cfg.deform_quat) else 0.0)
    log_scales = params["log_scales"] + (d_scale if (d_scale is not None and cfg.deform_scale) else 0.0)

    q_ins, t_ins, valid = rigid._frame_pose(
        params, statics, frame, num_frames, in_test_set)
    means, quats = rigid.transform_to_world(
        local_means, local_quats, point_ids, q_ins, t_ins)
    rgbs = nodes.sh_colors(means, params["sh_dc"], params["sh_rest"],
                           cam_origin, step, cfg.sh_degree_interval,
                           cfg.sh_degree)
    opac = (jax.nn.sigmoid(params["logit_opacities"][:, 0])
            * valid[point_ids] * mask)
    return nodes.GaussianBundle(means, jnp.exp(log_scales), quats, opac, rgbs)
