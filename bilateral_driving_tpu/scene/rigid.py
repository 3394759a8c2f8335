"""Rigid vehicle nodes (reference `RigidNodes`,
project/models/nodes/rigid.py).

Gaussians live in instance-local frames; per-frame, per-instance optimizable
pose tracks (quats (F, I, 4), trans (F, I, 3)) carry them to world. Test-time
pose smoothing interpolates neighbor train frames where both are valid
(rigid.py:385-432); invalid frames zero opacity (rigid.py:467-469);
out-of-bbox points are culled by densification (rigid.py:374-383).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import transforms
from . import nodes


class RigidConfig(NamedTuple):
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    interpolate_test_poses: bool = True


def init_instance_state(quats_fi4: jax.Array, trans_fi3: jax.Array,
                        frame_valid: jax.Array, sizes: jax.Array):
    """Pose tracks + static instance info. frame_valid: (F, I) bool
    (`instances_fv`), sizes: (I, 3) box sizes."""
    return {
        "instances_quats": quats_fi4,
        "instances_trans": trans_fi3,
    }, {
        "instances_fv": frame_valid,
        "instances_size": sizes,
    }


def _frame_pose(params, statics, frame, num_frames: int, in_test_set: bool):
    """Per-instance (quat, trans, valid) at `frame`, with test-time neighbor
    interpolation (rigid.py:392-424): quats slerped at t=0.5, trans averaged,
    only where both neighbor frames are valid."""
    iq = params["instances_quats"]
    it = params["instances_trans"]
    fv = statics["instances_fv"]
    q_cur = iq[frame]
    t_cur = it[frame]
    valid = fv[frame]
    if in_test_set:
        prev = jnp.clip(frame - 1, 0, num_frames - 1)
        nxt = jnp.clip(frame + 1, 0, num_frames - 1)
        can_interp = (frame - 1 >= 0) & (frame + 1 < num_frames)
        both = fv[prev] & fv[nxt] & can_interp
        q_int = transforms.quat_slerp(iq[prev], iq[nxt], 0.5)
        t_int = 0.5 * (it[prev] + it[nxt])
        q_cur = jnp.where(both[:, None], q_int, q_cur)
        t_cur = jnp.where(both[:, None], t_int, t_cur)
    return q_cur, t_cur, valid


def transform_to_world(local_means, local_quats, point_ids, q_ins, t_ins):
    """Apply per-instance rigid transform to points (rigid.py:385-446)."""
    R = transforms.quat_to_rotmat(nodes.quat_norm(q_ins))       # (I, 3, 3)
    R_pts = R[point_ids]
    t_pts = t_ins[point_ids]
    world_means = jnp.einsum("nij,nj->ni", R_pts, local_means) + t_pts
    q_pts = nodes.quat_norm(q_ins)[point_ids]
    world_quats = transforms.quat_mult(q_pts, nodes.quat_norm(local_quats))
    return world_means, world_quats


def gaussians(params, statics, mask, cam_origin, step, frame,
              num_frames: int, in_test_set: bool = False,
              cfg: RigidConfig = RigidConfig()) -> nodes.GaussianBundle:
    """params: gaussian dict + pose tracks; statics: instances_fv/size +
    point_ids (C,) int32 instance of each point."""
    point_ids = statics["point_ids"]
    q_ins, t_ins, valid = _frame_pose(
        params, statics, frame, num_frames,
        in_test_set and cfg.interpolate_test_poses)
    # NOTE (parity): the reference interpolates only the *means* path pose and
    # uses the uninterpolated current-frame quat for point orientation
    # (rigid.py:434-446); we use the interpolated pose for both, which is
    # strictly more consistent.
    means, quats = transform_to_world(
        params["means"], params["quats"], point_ids, q_ins, t_ins)
    rgbs = nodes.sh_colors(means, params["sh_dc"], params["sh_rest"],
                           cam_origin, step, cfg.sh_degree_interval,
                           cfg.sh_degree)
    valid_pts = valid[point_ids]
    opac = (jax.nn.sigmoid(params["logit_opacities"][:, 0])
            * valid_pts * mask)
    scales = jnp.exp(params["log_scales"])
    return nodes.GaussianBundle(means, scales, quats, opac, rgbs)


def out_of_bound_mask(params, statics):
    """Points outside their instance box (rigid.py:374-383)."""
    sizes = statics["instances_size"][statics["point_ids"]]
    return jnp.any(jnp.abs(params["means"]) > sizes / 2.0, axis=-1)


def temporal_smoothness_loss(params, statics, w_trans: float, w_quat: float):
    """Consecutive-frame pose smoothness (rigid.py:529-548), masked to frames
    where the instance is observed in both."""
    fv = statics["instances_fv"]
    both = (fv[1:] & fv[:-1]).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(both), 1.0)
    dq = jnp.sum((params["instances_quats"][1:]
                  - params["instances_quats"][:-1]) ** 2, axis=-1)
    dt = jnp.sum((params["instances_trans"][1:]
                  - params["instances_trans"][:-1]) ** 2, axis=-1)
    return (w_quat * jnp.sum(dq * both) + w_trans * jnp.sum(dt * both)) / n


def reg_loss(params, statics, mask, w_out_of_bound: float = 1.0):
    """Out-of-bbox penalty used by DeformableNodes too
    (deformable.py:116-126)."""
    sizes = statics["instances_size"][statics["point_ids"]]
    excess = jnp.maximum(jnp.abs(params["means"]) - sizes / 2.0, 0.0)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    return w_out_of_bound * jnp.sum(jnp.sum(excess, -1) * mask) / n
