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


# --------------------------------------------------------------------------
# offline instance-editing API (reference rigid.py:574-607). Host-side ops on
# the static-capacity arrays: removal zeroes the alive mask; replacement
# copies the donor instance's gaussians into the removed instance's dead
# slots, retagged so they follow the *target's* pose track (the reference
# keeps the original ins_id on appended points for the same reason).
# --------------------------------------------------------------------------


def remove_instances(statics, mask, remove_ids):
    """Kill every gaussian belonging to the listed instance ids.

    Returns the updated alive mask (same dtype/shape; capacity unchanged)."""
    import numpy as np
    pid = np.asarray(statics["point_ids"])
    keep = ~np.isin(pid, np.asarray(list(remove_ids)))
    return jnp.asarray(np.asarray(mask) * keep.astype(np.asarray(mask).dtype))


def replace_instances(params, statics, mask, replace: dict):
    """replace = {target_id: donor_id}: swap each target instance's geometry
    for a copy of the donor's, keeping the target's pose track
    (rigid.py:607 keeps the original point ids on the appended copy).

    Returns (params, statics, mask) with donor rows written into the freed
    slots. Raises if an instance's donor has more points than fit in the
    freed + dead capacity."""
    import numpy as np
    pid = np.asarray(statics["point_ids"]).copy()
    alive = np.asarray(mask).astype(bool).copy()
    rows = {k: np.asarray(v).copy() for k, v in params.items()
            if k not in ("instances_quats", "instances_trans")}
    for target, donor in replace.items():
        src = alive & (pid == donor)
        alive[alive & (pid == target)] = False
        free = np.flatnonzero(~alive)
        n_src = int(src.sum())
        if n_src > free.size:
            raise ValueError(
                f"replace_instances: donor {donor} has {n_src} points but "
                f"only {free.size} free slots remain")
        dst = free[:n_src]
        src_idx = np.flatnonzero(src)
        for k, v in rows.items():
            v[dst] = v[src_idx]
        pid[dst] = target
        alive[dst] = True
    new_params = dict(params)
    for k, v in rows.items():
        new_params[k] = jnp.asarray(v)
    new_statics = dict(statics)
    new_statics["point_ids"] = jnp.asarray(pid)
    return new_params, new_statics, jnp.asarray(
        alive.astype(np.asarray(mask).dtype))


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
