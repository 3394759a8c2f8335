"""Periodic Vibration Gaussians (reference `PeriodicVibrationGaussians`,
project/models/gaussians/pvg.py) — temporal background model.

Adds per-point life peak `tau`, temporal scale `beta`, and velocity:
  means(t) = mu + v * sin((t - tau) * 2*pi/T) / (2*pi/T)
  opacity(t) = o * exp(-0.5 (t - tau)^2 / beta^2)
The marginal-visibility filter (`get_marginal_t > 0.05`, pvg.py:391) becomes
an opacity mask instead of a gather (static shapes). Temporal smoothing
(pvg.py:377-389) samples a perturbed t1 and adds v * (t2 - t1).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import nodes


class PVGConfig(NamedTuple):
    """Times (t, taus, cycle, betas) all live on the reference's *scaled*
    time axis: consecutive frames are `time_interval` (0.02) apart
    (pvg.py:46-47 train_time_scale), NOT normalized [0,1] — cycle_length 0.2
    and betas_init 0.1 are tuned for that spacing. Callers scale normalized
    times by time_interval * (num_frames - 1) at the boundary."""
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    cycle: float = 0.2           # T, the vibration period (scaled time)
    marginal_thresh: float = 0.05


def init_extras(key, capacity: int, num_points: int, t_init: jax.Array | None,
                beta_init: float = 0.1, time_scale: float = 1.0):
    """taus from per-point observation time (or 0), betas log-init, zero
    velocity (pvg create_from_pcd). t_init is normalized [0,1]; stored taus
    are scaled by `time_scale` (reference pvg.py:53 init_times *
    train_time_scale)."""
    taus = jnp.zeros((capacity,))
    if t_init is not None:
        taus = taus.at[:num_points].set(t_init * time_scale)
    return {
        "taus": taus,
        # reference stores log(sqrt(betas_init)) (pvg.py:55-56:
        # betas = sqrt(ones * ctrl.betas_init); _betas = log(betas)) — the
        # effective life span is sqrt(0.1) ~ 0.316, wide enough to keep
        # every point visible across the clip at init. Without the sqrt
        # the marginal-visibility window is 3.16x too narrow and renders
        # collapse within a few steps (found by the round-4 on-chip PVG
        # convergence run).
        "log_betas": jnp.full((capacity,), 0.5 * jnp.log(beta_init)),
        "velocity": jnp.zeros((capacity, 3)),
    }


def temporal_state(params, t, cfg: PVGConfig):
    betas = jnp.exp(params["log_betas"])
    a = 2.0 * jnp.pi / cfg.cycle
    means = params["means"] + params["velocity"] * jnp.sin(
        (t - params["taus"])[:, None] * a) / a
    marginal = jnp.exp(-0.5 * (params["taus"] - t) ** 2 / betas ** 2)
    return means, marginal, betas


def effective_velocity(params, cfg: PVGConfig):
    """v * exp(-0.5 rho), rho = beta / T (pvg.py:86-89)."""
    rho = jnp.exp(params["log_betas"]) / cfg.cycle
    return params["velocity"] * jnp.exp(-0.5 * rho)[:, None]


def gaussians(params, mask, cam_origin, step, t, cfg: PVGConfig = PVGConfig(),
              smooth_delta_t=0.0) -> nodes.GaussianBundle:
    """t is the (possibly perturbed) current normalized time; smooth_delta_t
    = t_train - t when temporal smoothing is active, else 0."""
    means, marginal, _ = temporal_state(params, t, cfg)
    means = means + effective_velocity(params, cfg) * smooth_delta_t
    visible = marginal > cfg.marginal_thresh
    opac = (jax.nn.sigmoid(params["logit_opacities"][:, 0]) * marginal
            * visible * mask)
    scales = jnp.exp(params["log_scales"])
    quats = nodes.quat_norm(params["quats"])
    rgbs = nodes.sh_colors(means, params["sh_dc"], params["sh_rest"],
                           cam_origin, step, cfg.sh_degree_interval,
                           cfg.sh_degree)
    return nodes.GaussianBundle(means, scales, quats, opac, rgbs)


def velocity_reg_loss(params, mask, cur_radii, w: float, cfg: PVGConfig):
    """Per-point velocity regularization on visible points (pvg.py:429-437)."""
    vis = (cur_radii > 0) & (mask > 0)
    nvis = jnp.maximum(jnp.sum(vis), 1.0)
    # safe L2 norm: velocity inits to exactly 0 and d||v||/dv is NaN there
    # (torch.norm subgradients to 0 at the origin; jnp.linalg.norm does not)
    v = effective_velocity(params, cfg)
    vnorm = jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-12)
    return jnp.sum(vnorm * vis) / nvis * w
