"""Static background Gaussians (reference `VanillaGaussians`,
project/models/gaussians/vanilla.py).

Parameters live in a fixed-capacity dict; `mask` tracks liveness (dead slots
render with zero opacity). Regularizers mirror compute_reg_loss
(vanilla.py:416-452). Densification is generic over the param dict and lives
in train/density.py.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import gaussians as G
from . import nodes


class BackgroundConfig(NamedTuple):
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    ball_gaussians: bool = False
    gaussian_2d: bool = False


def init_from_points(key, capacity: int, means, colors, scales=None,
                     sh_degree: int = 3, init_opacity: float = 0.1):
    """create_from_pcd (vanilla.py:79-121): KNN-based scales done by caller
    or defaulted inside core.gaussians."""
    params, mask = G.init_params(
        key, capacity, means=means, colors=colors, scales=scales,
        sh_degree=sh_degree, init_opacity=init_opacity)
    return {
        "means": params.means,
        "log_scales": params.log_scales,
        "quats": params.quats,
        "logit_opacities": params.logit_opacities,
        "sh_dc": params.sh_dc,
        "sh_rest": params.sh_rest,
    }, mask


def gaussians(params, mask, cam_origin, step,
              cfg: BackgroundConfig = BackgroundConfig()) -> nodes.GaussianBundle:
    means = params["means"]
    if cfg.ball_gaussians:
        scales = jnp.exp(params["log_scales"][:, :1]).repeat(3, axis=1)
        quats = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0]),
                                 params["quats"].shape)
    elif cfg.gaussian_2d:
        scales = jnp.concatenate([
            jnp.exp(params["log_scales"][:, :2]),
            jnp.zeros_like(params["log_scales"][:, :1]),
        ], axis=1)
        quats = nodes.quat_norm(params["quats"])
    else:
        scales = jnp.exp(params["log_scales"])
        quats = nodes.quat_norm(params["quats"])
    rgbs = nodes.sh_colors(means, params["sh_dc"], params["sh_rest"],
                           cam_origin, step, cfg.sh_degree_interval,
                           cfg.sh_degree)
    opac = jax.nn.sigmoid(params["logit_opacities"][:, 0]) * mask
    return nodes.GaussianBundle(means, scales, quats, opac, rgbs)


def reg_loss(params, mask, cur_radii: Optional[jax.Array], step, reg_cfg: dict):
    """compute_reg_loss (vanilla.py:416-452). `cur_radii` is this step's
    per-point radii for the class (None if unavailable)."""
    losses = {}
    n_alive = jnp.maximum(jnp.sum(mask), 1.0)
    scaling = jnp.exp(params["log_scales"])

    sharp = reg_cfg.get("sharp_shape_reg")
    if sharp is not None:
        ratio = jnp.max(scaling, -1) / jnp.maximum(jnp.min(scaling, -1), 1e-8)
        r = jnp.maximum(ratio, sharp["max_gauss_ratio"]) - sharp["max_gauss_ratio"]
        apply = (step % sharp.get("step_interval", 10)) == 0
        losses["sharp_shape_reg"] = jnp.where(
            apply, jnp.sum(r * mask) / n_alive * sharp["w"], 0.0)

    flatten = reg_cfg.get("flatten")
    if flatten is not None:
        min_scale = jnp.clip(jnp.min(scaling, axis=1), 0.0, 30.0)
        losses["flatten"] = jnp.sum(jnp.abs(min_scale) * mask) / n_alive * flatten["w"]

    sparse = reg_cfg.get("sparse_reg")
    if sparse is not None and cur_radii is not None:
        vis = (cur_radii > 0) & (mask > 0)
        nvis = jnp.maximum(jnp.sum(vis), 1.0)
        op = jnp.clip(jax.nn.sigmoid(params["logit_opacities"][:, 0]),
                      1e-6, 1.0 - 1e-6)
        ent = -(op * jnp.log(op) + (1 - op) * jnp.log(1 - op))
        losses["sparse_reg"] = jnp.sum(ent * vis) / nvis * sparse["w"]

    max_s = reg_cfg.get("max_s_square_reg")
    if max_s is not None:
        losses["max_s_square"] = (
            jnp.sum(jnp.max(scaling, axis=1) ** 2 * mask) / n_alive * max_s["w"])
    return losses
