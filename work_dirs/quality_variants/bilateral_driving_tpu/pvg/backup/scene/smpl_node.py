"""SMPL pedestrian nodes (reference `SMPLNodes`,
project/models/nodes/smpl.py).

Per instance: V canonical Gaussians on/near the SMPL mesh, per-frame
optimizable root orientation quats (F, I, 1, 4), joint quats (F, I, 23, 4)
and translations (F, I, 3); forward LBS (W · (A·A0⁻¹)) carries points and
orientations to world (smpl.py:267-341), optionally with VoxelDeformer
learned skinning-weight corrections. No densification — the point count is
fixed at I·V; KNN smoothness regularizers keep neighbors coherent
(smpl.py:462-509). Test-time pose smoothing slerps neighbor train frames
(smpl.py:276-291).

The reference's `index_add_` masked-instance scatter becomes a plain `where`
over all instances (static shapes; invalid instances are computed then
opacity-masked).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import transforms
from . import nodes, smpl_model, voxel_deformer as vd


class SMPLConfig(NamedTuple):
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    knn_neighbors: int = 5
    use_voxel_deformer: bool = False
    ball_gaussians: bool = False


def _frame_theta(params, statics, frame, num_frames: int, in_test_set: bool):
    """(I, 24, 4) joint quats + (I, 3) trans + (I,) valid at `frame`, with
    test-time neighbor slerp (smpl.py:276-330)."""
    root = params["instances_quats"]       # (F, I, 1, 4)
    body = params["smpl_quats"]            # (F, I, 23, 4)
    trans = params["instances_trans"]      # (F, I, 3)
    fv = statics["instances_fv"]           # (F, I)
    theta = jnp.concatenate([root, body], axis=2)  # (F, I, 24, 4)
    th_cur = theta[frame]
    t_cur = trans[frame]
    valid = fv[frame]
    if in_test_set:
        prev = jnp.clip(frame - 1, 0, num_frames - 1)
        nxt = jnp.clip(frame + 1, 0, num_frames - 1)
        can = (frame - 1 >= 0) & (frame + 1 < num_frames)
        both = fv[prev] & fv[nxt] & can
        th_int = transforms.quat_slerp(theta[prev], theta[nxt], 0.5)
        t_int = 0.5 * (trans[prev] + trans[nxt])
        th_cur = jnp.where(both[:, None, None], th_int, th_cur)
        t_cur = jnp.where(both[:, None], t_int, t_cur)
    return transforms.quat_normalize(th_cur), t_cur, valid


def gaussians(params, statics, mask, cam_origin, step, frame,
              num_frames: int, in_test_set: bool = False,
              cfg: SMPLConfig = SMPLConfig(),
              vd_statics: Optional[vd.VoxelDeformerStatics] = None
              ) -> nodes.GaussianBundle:
    """statics: template (SMPLTemplate pytree), instances_fv, point_ids.
    params: gaussian dict + instances_quats/smpl_quats/instances_trans
    [+ voxel_w_correction]."""
    template: smpl_model.SMPLTemplate = statics["template"]
    num_inst = template.j_canonical.shape[0]
    V = params["means"].shape[0] // num_inst

    theta, t_ins, valid = _frame_theta(params, statics, frame, num_frames,
                                       in_test_set)
    A = smpl_model.skinning_transforms(template, theta)      # (I, 24, 4, 4)

    means_i = params["means"].reshape(num_inst, V, 3)
    if cfg.use_voxel_deformer and vd_statics is not None:
        W = vd.query_weights(vd_statics,
                             {"voxel_w_correction": params["voxel_w_correction"]},
                             means_i)
    else:
        W = template.lbs_weights                              # (I, V, 24)
    posed, R = smpl_model.lbs_apply(W, A, means_i)            # (I, V, 3)
    world_means = (posed + t_ins[:, None, :]).reshape(-1, 3)

    quats_i = nodes.quat_norm(params["quats"]).reshape(num_inst, V, 4)
    rq = transforms.rotmat_to_quat(R)                         # (I, V, 4)
    world_quats = transforms.quat_mult(rq, quats_i).reshape(-1, 4)

    rgbs = nodes.sh_colors(world_means, params["sh_dc"], params["sh_rest"],
                           cam_origin, step, cfg.sh_degree_interval,
                           cfg.sh_degree)
    valid_pts = valid[statics["point_ids"]]
    opac = (jax.nn.sigmoid(params["logit_opacities"][:, 0])
            * valid_pts * mask)
    if cfg.ball_gaussians:
        scales = jnp.exp(params["log_scales"][:, :1]).repeat(3, axis=1)
    else:
        scales = jnp.exp(params["log_scales"])
    return nodes.GaussianBundle(world_means, scales,
                                nodes.quat_norm(world_quats), opac, rgbs)


def compute_knn(means: jax.Array, num_inst: int, k: int):
    """Per-instance KNN indices over the canonical points (smpl.py:184-188);
    refreshed occasionally by the trainer (host-side is fine)."""
    V = means.shape[0] // num_inst
    mi = means.reshape(num_inst, V, 3)

    def one(pts):
        d2 = (jnp.sum(pts * pts, -1, keepdims=True) - 2.0 * pts @ pts.T
              + jnp.sum(pts * pts, -1)[None])
        _, idx = jax.lax.top_k(-d2, k)
        return idx

    return jax.vmap(one)(mi)                                  # (I, V, K)


def knn_reg_loss(params, statics, nn_ind: jax.Array, frame, reg_cfg: dict,
                 cfg: SMPLConfig = SMPLConfig()):
    """KNN smoothness on sh_dc / sh_rest / opacity / scale / quats
    (smpl.py:462-509): std over neighbors, averaged over valid instances."""
    fv = statics["instances_fv"]
    valid = fv[frame].astype(jnp.float32)
    num_inst = valid.shape[0]
    V = params["means"].shape[0] // num_inst
    n_valid = jnp.maximum(jnp.sum(valid), 1e-6)

    def std_term(flat_values, dim):
        vals = flat_values.reshape(num_inst, V, dim)
        gathered = jnp.take_along_axis(
            vals[:, :, None, :].repeat(nn_ind.shape[-1], axis=2),
            nn_ind[..., None].repeat(dim, axis=-1), axis=1)
        std = jnp.std(gathered, axis=2)                        # (I, V, dim)
        per_inst = jnp.mean(std, axis=(1, 2))
        return jnp.sum(per_inst * valid) / n_valid

    losses = {}
    kr = reg_cfg.get("knn_reg")
    if kr is not None:
        losses["knn_reg_dc"] = std_term(params["sh_dc"][:, 0, :], 3) * \
            kr.get("lambda_std_shs_dc", 0.0)
        rest = params["sh_rest"].reshape(params["sh_rest"].shape[0], -1)
        losses["knn_reg_rest"] = std_term(rest, rest.shape[-1]) * \
            kr.get("lambda_std_shs_rest", 0.0)
        op = jax.nn.sigmoid(params["logit_opacities"])
        losses["knn_reg_o"] = std_term(op, 1) * kr.get("lambda_std_o", 0.0)
        sdim = 1 if cfg.ball_gaussians else 3
        sc = jnp.exp(params["log_scales"][:, :sdim])
        losses["knn_reg_s"] = std_term(sc, sdim) * kr.get("lambda_std_s", 0.0)
        losses["knn_reg_q"] = std_term(params["quats"], 4) * \
            kr.get("lambda_std_q", 0.0)

    xo = reg_cfg.get("x_offset")
    if xo is not None and "on_mesh_x" in statics:
        # grad-safe at zero offset (means == on_mesh_x exactly at init)
        dd = (params["means"] - statics["on_mesh_x"]).reshape(
            num_inst, V, 3)
        dx = jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, axis=-1), 1e-16))
        losses["x_offset"] = (jnp.sum(jnp.mean(dx, axis=1) * valid)
                              / n_valid * xo["w"])
    return losses


def joint_smoothness_loss(params, statics, frame, num_frames: int, w: float):
    """Second-order joint-position smoothness (smpl.py:418-445): |v_next -
    v_prev| of LBS-posed joints across (frame-1, frame, frame+1)."""
    template: smpl_model.SMPLTemplate = statics["template"]
    prev = jnp.clip(frame - 1, 0, num_frames - 1)
    nxt = jnp.clip(frame + 1, 0, num_frames - 1)
    can = jnp.asarray((frame - 1 > 0) & (frame + 1 < num_frames),
                      jnp.float32)

    def joints_at(f):
        theta = jnp.concatenate(
            [params["instances_quats"][f], params["smpl_quats"][f]], axis=1)
        rot = transforms.quat_to_rotmat(transforms.quat_normalize(theta))
        J, _ = smpl_model.batch_rigid_transform(
            rot, template.j_canonical, template.parents.value)
        return J + params["instances_trans"][f][:, None, :]

    j_prev, j_cur, j_next = joints_at(prev), joints_at(frame), joints_at(nxt)
    fv = statics["instances_fv"]
    valid = (fv[prev] & fv[frame] & fv[nxt]).astype(jnp.float32)
    acc = jnp.abs((j_next - j_cur) - (j_cur - j_prev))
    per_inst = jnp.mean(acc, axis=(1, 2))
    return can * w * jnp.sum(per_inst * valid) / jnp.maximum(jnp.sum(valid), 1e-6)
