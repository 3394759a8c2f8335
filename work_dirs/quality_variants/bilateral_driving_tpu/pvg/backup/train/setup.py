"""Scene/model construction: turn dataset init data into trainer state.

Counterpart of the reference's `MultiTrainer._init_models` +
`init_gaussians_from_dataset` (project/models/trainers/scene_graph.py:25-229):
builds per-class parameter dicts (static capacity), aux per-point arrays,
masks, and the non-Gaussian models (sky, affine, camera opt).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import gaussians as G, sampling
from ..models import affine as affine_mod
from ..models import bilateral, camera_opt, deform, encoders, sky as sky_mod
from ..scene import deformable, pvg as pvg_mod, smpl_model, smpl_node
from . import trainer as trainer_mod


def _gauss_dict(key, capacity, means, colors, scales=None, sh_degree=3,
                init_opacity=0.1):
    params, mask = G.init_params(key, capacity, means=means, colors=colors,
                                 scales=scales, sh_degree=sh_degree,
                                 init_opacity=init_opacity)
    return {
        "means": params.means,
        "log_scales": params.log_scales,
        "quats": params.quats,
        "logit_opacities": params.logit_opacities,
        "sh_dc": params.sh_dc,
        "sh_rest": params.sh_rest,
    }, mask


def knn_scales(points: jax.Array, k: int = 3) -> jax.Array:
    """Scale init from mean 3-NN distance (basics.py:208-224 usage in
    create_from_pcd)."""
    d = sampling.knn_mean_distance(points, k=k)
    return jnp.clip(d, 1e-7, None)


def build_background(key, capacity, means, colors, sh_degree=3):
    scales = knn_scales(means)
    return _gauss_dict(key, capacity, means, colors, scales, sh_degree)


def build_pvg_background(key, capacity, means, colors, t_init=None,
                         sh_degree=3, beta_init=0.1, time_scale=1.0):
    """t_init: normalized per-point observation times (scaled into taus by
    time_scale = time_interval * (num_frames - 1), pvg.py:47,53)."""
    params, mask = build_background(key, capacity, means, colors, sh_degree)
    params.update(pvg_mod.init_extras(key, capacity, means.shape[0], t_init,
                                      beta_init, time_scale))
    return params, mask


def build_rigid(key, capacity, means, colors, point_ids, quats_fi4,
                trans_fi3, frame_valid, sizes, sh_degree=3):
    """means are instance-local; point_ids (N,) instance per point."""
    scales = knn_scales(means)
    params, mask = _gauss_dict(key, capacity, means, colors, scales,
                               sh_degree)
    params["instances_quats"] = quats_fi4
    params["instances_trans"] = trans_fi3
    statics = {"instances_fv": frame_valid, "instances_size": sizes}
    pid = jnp.zeros((capacity,), jnp.int32).at[:point_ids.shape[0]].set(
        point_ids)
    aux = {"point_ids": pid}
    return params, statics, aux, mask


def build_deformable(key, capacity, means, colors, point_ids, quats_fi4,
                     trans_fi3, frame_valid, sizes, num_instances,
                     sh_degree=3, embed_dim=16, net_depth=8, net_width=256):
    params, statics, aux, mask = build_rigid(
        key, capacity, means, colors, point_ids, quats_fi4, trans_fi3,
        frame_valid, sizes, sh_degree)
    k1, k2 = jax.random.split(key)
    params["instance_embeds"] = deformable.init_node_embeddings(
        k1, num_instances, embed_dim)
    params["deform_net"] = deform.init_deform(
        k2, depth=net_depth, width=net_width, embed_dim=embed_dim)
    return params, statics, aux, mask


def build_smpl(key, model: smpl_model.SMPLModel, betas, root_quats_fi14,
               body_quats_fi234, trans_fi3, frame_valid, sizes=None,
               sh_degree=3, init_opacity=0.88, use_voxel_deformer=False):
    """betas (I, 10); root_quats (F, I, 1, 4); body_quats (F, I, 23, 4);
    points initialized on the canonical (da-pose) template vertices
    (human_body.py get_on_mesh_init_geo_values, simplified: vertex positions,
    surface-frame quats left random, KNN scales)."""
    from ..scene import voxel_deformer as vd

    template = smpl_model.make_template(model, betas)
    num_inst, V = template.verts_canonical.shape[:2]
    means = template.verts_canonical.reshape(-1, 3)
    colors = jax.random.uniform(key, (means.shape[0], 3))  # smpl.py:157-159
    capacity = means.shape[0]
    scales = jnp.full((capacity,), 0.01)
    params, mask = _gauss_dict(key, capacity, means, colors, scales,
                               sh_degree, init_opacity)
    # mesh-surface geometry init (human_body.py:216-259): normal-aligned
    # frames and 1-ring-area disk scales replace random quats / constant
    # scales wherever the model has a real mesh
    if model.faces.shape[0] > 1:
        mq, ms = smpl_model.mesh_init_qso(
            jnp.asarray(template.verts_canonical), model.faces,
            jax.random.fold_in(key, 11))
        params["quats"] = jnp.asarray(mq)
        params["log_scales"] = jnp.asarray(ms)
    params["instances_quats"] = root_quats_fi14
    params["smpl_quats"] = body_quats_fi234
    params["instances_trans"] = trans_fi3
    point_ids = jnp.repeat(jnp.arange(num_inst, dtype=jnp.int32), V)
    statics = {
        "template": template,
        "instances_fv": frame_valid,
        "nn_ind": smpl_node.compute_knn(means, num_inst, k=5),
        "on_mesh_x": means,
    }
    if use_voxel_deformer:
        vd_statics, vd_params = vd.init_voxel_deformer(
            template.verts_canonical, template.lbs_weights)
        statics["vd_statics"] = vd_statics
        params["voxel_w_correction"] = vd_params["voxel_w_correction"]
    aux = {"point_ids": point_ids}
    return params, statics, aux, mask


def build_models(key, cfg: trainer_mod.TrainerConfig):
    """Non-Gaussian models keyed exactly as the trainer expects."""
    out = {}
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.sky_model == "envlight":
        out["Sky"] = sky_mod.init_envlight(k1, cfg.envlight_resolution)
    elif cfg.sky_model == "mlp":
        out["Sky"] = sky_mod.init_sky_mlp(k1, cfg.num_images)
    if cfg.affine_model == "multiscale_bilateral":
        out["Affine"] = bilateral.init_multiscale(k2, cfg.num_images,
                                                  cfg.ms_grid)
    elif cfg.affine_model == "bilateral":
        gx, gy, gw = cfg.bilateral_grid_shape
        out["Affine"] = bilateral.init_bilateral(k2, cfg.num_images, gx, gy, gw)
    elif cfg.affine_model == "affine":
        out["Affine"] = affine_mod.init_affine(k2, cfg.num_images)
    elif cfg.affine_model == "neural_bilateral":
        gx, gy, gw = cfg.bilateral_grid_shape
        out["Affine"] = bilateral.init_neural_bilateral(
            k2, cfg.num_images, gx, gy, gw, feature_dim=8, hidden_dim=64)
    elif cfg.affine_model == "multiscale_neural_bilateral":
        out["Affine"] = bilateral.init_multiscale_neural(
            k2, cfg.num_images, cfg.ms_grid)
    elif cfg.affine_model == "cp4d":
        out["Affine"] = bilateral.init_cp4d(k2)
    if cfg.use_camera_opt:
        out["CamPose"] = camera_opt.init_camera_opt(k3, cfg.num_images)
    if cfg.use_camera_perturb:
        out["CamPosePerturb"] = camera_opt.init_camera_opt(
            jax.random.fold_in(k3, 1), cfg.num_images, std=0.01)
    return out


def build_deformgs_background(key, capacity, means, colors, aabb_center,
                              aabb_radius, sh_degree=3, net_depth=8,
                              net_width=256):
    """Background DeformableGS (deformgs.py): canonical gaussians + a
    DeformNetwork stored alongside; statics carry the contraction AABB."""
    params, mask = build_background(key, capacity, means, colors, sh_degree)
    params["deform_net"] = deform.init_deform(
        jax.random.fold_in(key, 7), depth=net_depth, width=net_width)
    statics = {"aabb_center": jnp.asarray(aabb_center),
               "aabb_scale": jnp.asarray(aabb_radius)}
    return params, statics, mask
