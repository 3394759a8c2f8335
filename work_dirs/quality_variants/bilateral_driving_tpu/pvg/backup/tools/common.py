"""Config -> trainer construction shared by the CLIs.

Maps the YAML schema (configs/*.yaml; keys deliberately parallel the
reference's omnire_ms_bilateral.yaml groups) onto TrainerConfig + scene
builders, covering both real drivestudio scene directories and the synthetic
scene used for smoke tests and benchmarks.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax

# honor JAX_PLATFORMS=cpu even when a sitecustomize pinned the platform
# config before env vars were read (same dance as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ..data import scene as scene_mod, synthetic
from ..scene import smpl_model
from ..train import density, setup, trainer
from ..utils.config import ConfigDict, validate_keys


def _leaves(*names):
    return {n: True for n in names}


# every key any CLI/builder consumes; validate_config rejects the rest so a
# misspelled override fails loudly instead of silently training with defaults
CONFIG_SCHEMA = {
    "seed": True,
    "dataset": True,
    "trainer": _leaves(
        "background_model", "use_rigid", "use_smpl", "use_deformable",
        "sky_model", "affine_model", "use_camera_opt", "use_camera_perturb",
        "use_voxel_deformer", "sh_degree", "sh_degree_interval",
        "envlight_resolution", "max_steps", "ms_grid", "guidance_factor",
        "bilateral_grid_shape", "steps_per_dispatch"),
    "render": _leaves("near_plane", "far_plane", "radius_clip", "antialiased",
                      "isect_capacity", "capacity_policy", "capacity_margin",
                      "capacity_floor", "rebucket_after"),
    "losses": {
        **_leaves(
            "rgb", "ssim", "mask", "mask_loss_type", "depth",
            "depth_loss_type", "depth_inverse", "depth_normalize",
            "depth_reduction", "max_depth", "lidar_w_decay", "affine",
            "affine_inverse", "opacity_entropy", "inverse_depth_smoothness",
            "rigid_temporal", "smpl_joint_smooth"),
        # dynamic-region weighted rgb loss (reference base.py:638-653)
        "dynamic_region": _leaves("w", "start_from"),
    },
    "background_reg": {"*": {"*": True}},
    "smpl_reg": {"*": {"*": True}},
    "density": {f: True for f in density.DensityConfig._fields},
    "background_init": _leaves("num_lidar_samples", "num_near_pts",
                               "num_far_pts", "capacity"),
    "rigid_capacity": True,
    "deformable_capacity": True,
    "sampler": _leaves("buffer_ratio", "start_enhance_weight",
                       "refresh_every", "refresh_downscale"),
    "data": _leaves(
        "dataset", "scene_dir", "cameras", "downscale", "test_image_stride",
        "num_cams", "start_frame", "end_frame", "undistort", "ego_mask_dir",
        "synthetic", "width", "height", "num_frames", "num_bg",
        "bg_capacity"),
    "pvg": _leaves("cycle_length", "time_interval", "betas_init",
                   "enable_temporal_smoothing", "smooth_probability",
                   "distribution_span"),
    "smpl": _leaves("model_path"),
    "logging": _leaves("log_every", "ckpt_every", "vis_freq",
                       "metrics_flush_every"),
    "res_schedule": _leaves("double_steps", "downscale_times"),
    "optim": {"*": _leaves("lr", "lr_final", "warmup_steps")},
}


def validate_config(cfg: ConfigDict):
    unknown = validate_keys(cfg, CONFIG_SCHEMA)
    if unknown:
        raise ValueError(
            "unknown config keys (misspelled override?): "
            + ", ".join(sorted(unknown)))


def trainer_config_from(cfg: ConfigDict, num_images: int,
                        num_frames: int, scene_scale: float,
                        interpret: bool = False,
                        scene_origin=(0.0, 0.0, 0.0)) -> trainer.TrainerConfig:
    validate_config(cfg)
    t = cfg.get("trainer", {})
    losses = cfg.get("losses", {})
    dens = cfg.get("density", {})
    render = cfg.get("render", {})
    den = density.DensityConfig(**{k: v for k, v in dens.items()
                                   if k in density.DensityConfig._fields})
    kw = dict(
        background_model=t.get("background_model", "vanilla"),
        use_rigid=t.get("use_rigid", False),
        use_smpl=t.get("use_smpl", False),
        use_deformable=t.get("use_deformable", False),
        sky_model=t.get("sky_model", "envlight"),
        affine_model=t.get("affine_model", "multiscale_bilateral"),
        use_camera_opt=t.get("use_camera_opt", False),
        use_camera_perturb=t.get("use_camera_perturb", False),
        use_voxel_deformer=t.get("use_voxel_deformer", False),
        near_plane=render.get("near_plane", 0.1),
        far_plane=render.get("far_plane", 1e7),
        radius_clip=render.get("radius_clip", 0.0),
        antialiased=render.get("antialiased", False),
        isect_capacity=int(render.get("isect_capacity", 2 ** 20)),
        interpret=interpret,
        sh_degree=t.get("sh_degree", 3),
        sh_degree_interval=t.get("sh_degree_interval", 1000),
        envlight_resolution=t.get("envlight_resolution", 512),
        num_images=num_images,
        num_frames=num_frames,
        w_rgb=losses.get("rgb", 0.8),
        w_ssim=losses.get("ssim", 0.2),
        w_mask=losses.get("mask", 0.05),
        w_depth=losses.get("depth", 0.01),
        lidar_w_decay=losses.get("lidar_w_decay", -1.0),
        w_affine=losses.get("affine", 1e-5),
        w_affine_inverse=losses.get("affine_inverse", 0.0),
        w_opacity_entropy=losses.get("opacity_entropy", 0.0),
        w_inverse_depth_smoothness=losses.get("inverse_depth_smoothness", 0.0),
        depth_loss_type=losses.get("depth_loss_type", "l1"),
        depth_inverse=losses.get("depth_inverse", False),
        depth_normalize=losses.get("depth_normalize", False),
        depth_reduction=losses.get("depth_reduction", "mean_on_hit"),
        mask_loss_type=losses.get("mask_loss_type", "safe_bce"),
        max_depth=losses.get("max_depth", 80.0),
        pvg_cycle=cfg.get("pvg", {}).get("cycle_length", 0.2),
        pvg_time_interval=cfg.get("pvg", {}).get("time_interval", 0.02),
        pvg_temporal_smoothing=cfg.get("pvg", {}).get(
            "enable_temporal_smoothing", False),
        pvg_smooth_probability=cfg.get("pvg", {}).get(
            "smooth_probability", 0.5),
        pvg_distribution_span=cfg.get("pvg", {}).get(
            "distribution_span", 1.5),
        w_rigid_temporal=losses.get("rigid_temporal", 0.0),
        w_smpl_joint_smooth=losses.get("smpl_joint_smooth", 0.0),
        # presence of the dynamic_region block enables it at the reference's
        # default weight 1.0 (base.py:640-641)
        w_dynamic_region=(losses.get("dynamic_region") or {}).get("w", 1.0)
        if losses.get("dynamic_region") is not None else 0.0,
        dynamic_region_start_from=int(
            (losses.get("dynamic_region") or {}).get("start_from", 0)),
        density=den,
        scene_scale=scene_scale,
        scene_origin=tuple(float(x) for x in scene_origin),
        max_steps=t.get("max_steps", 30000),
    )
    if "ms_grid" in t:
        kw["ms_grid"] = tuple(tuple(g) for g in t["ms_grid"])
    if "guidance_factor" in t:
        kw["guidance_factor"] = tuple(t["guidance_factor"])
    if "bilateral_grid_shape" in t:
        kw["bilateral_grid_shape"] = tuple(t["bilateral_grid_shape"])
    regs = cfg.get("background_reg", None)
    if regs:
        kw["background_reg"] = tuple((k, tuple(v.items()))
                                     for k, v in regs.items())
    sregs = cfg.get("smpl_reg", None)
    if sregs:
        kw["smpl_reg"] = tuple((k, tuple(v.items()))
                               for k, v in sregs.items())
    optim = cfg.get("optim", None)
    if optim:
        # per-config lr-group overrides, mirroring the reference's per-model
        # optim blocks (e.g. omnire_bilateral.yaml Affine all.lr=1e-5 vs the
        # ms-bilateral grid schedule): group -> {lr, lr_final, warmup_steps}
        default_lr = next(f for f in dataclasses.fields(trainer.TrainerConfig)
                          if f.name == "lr").default
        table = {e[0]: list(e[1:]) for e in default_lr}
        for group, ov in optim.items():
            base = table.get(group, [1e-3, None, 0])
            table[group] = [ov.get("lr", base[0]),
                            ov.get("lr_final", base[1]),
                            ov.get("warmup_steps", base[2])]
        kw["lr"] = tuple((k, *v) for k, v in table.items())
    return trainer.TrainerConfig(**kw)


def _background_from_scene(key, cfg, data: scene_mod.SceneData, tcfg):
    """Build the Background class for any background_model
    (vanilla | pvg | deformgs). Returns (params, mask, statics)."""
    init = cfg.get("background_init", {})
    pts, pt_times = scene_mod.get_init_background(
        data,
        num_samples=init.get("num_lidar_samples", 400_000),
        num_near=init.get("num_near_pts", 50_000),
        num_far=init.get("num_far_pts", 50_000), return_times=True)
    colors = scene_mod.lidar_colors_for_points(data, pts)
    capacity = int(init.get("capacity", max(2 ** 19, 2 * pts.shape[0])))
    capacity = max(capacity, pts.shape[0])
    pts = jnp.asarray(pts)
    colors = jnp.asarray(colors)
    if tcfg.background_model == "pvg":
        params, mask = setup.build_pvg_background(
            key, capacity, pts, colors,
            t_init=jnp.asarray(pt_times), sh_degree=tcfg.sh_degree,
            beta_init=cfg.get("pvg", {}).get("betas_init", 0.1),
            time_scale=tcfg.pvg_time_interval * max(tcfg.num_frames - 1, 1))
        return params, mask, {}
    if tcfg.background_model == "deformgs":
        aabb = data.aabb()
        center = 0.5 * (aabb[0] + aabb[1])
        radius = float(np.max(aabb[1] - aabb[0]) / 2.0)
        params, statics, mask = setup.build_deformgs_background(
            key, capacity, pts, colors, center, radius,
            sh_degree=tcfg.sh_degree)
        return params, mask, statics
    params, mask = setup.build_background(key, capacity, pts, colors,
                                          sh_degree=tcfg.sh_degree)
    return params, mask, {}


def build_real_scene(key, cfg: ConfigDict, interpret=False):
    """Load a drivestudio scene dir and construct everything."""
    d = cfg.data
    data = scene_mod.load_scene(
        d.scene_dir, cameras=tuple(d.get("cameras", (0,))),
        start_frame=d.get("start_frame", 0), end_frame=d.get("end_frame", -1),
        downscale=d.get("downscale", 1.0),
        dataset=d.get("dataset", None),
        undistort=d.get("undistort", False),
        ego_mask_dir=d.get("ego_mask_dir", None))
    aabb = data.aabb()
    tcfg = trainer_config_from(cfg, data.num_images, data.num_frames,
                               data.scene_radius(), interpret,
                               scene_origin=0.5 * (aabb[0] + aabb[1]))
    params = setup.build_models(key, tcfg)
    masks, aux, statics = {}, {}, {}

    bg, masks["Background"], statics["Background"] = _background_from_scene(
        key, cfg, data, tcfg)
    params["Background"] = bg
    aux["Background"] = {}

    if tcfg.use_rigid:
        obj = scene_mod.get_init_objects(data, "RigidNodes")
        if obj is not None:
            cap = int(cfg.get("rigid_capacity", 2 * obj["means"].shape[0]))
            rp, rs, ra, rm = setup.build_rigid(
                key, cap, jnp.asarray(obj["means"]),
                jnp.asarray(scene_mod.lidar_colors_for_points(
                    data, obj["means"])),
                jnp.asarray(obj["point_ids"]), jnp.asarray(obj["quats"]),
                jnp.asarray(obj["trans"]), jnp.asarray(obj["frame_valid"]),
                jnp.asarray(obj["sizes"]), sh_degree=tcfg.sh_degree)
            params["RigidNodes"] = rp
            statics["RigidNodes"] = rs
            aux["RigidNodes"] = ra
            masks["RigidNodes"] = rm
        else:
            # safe_init_models: drop empty classes (scene_graph.py:73-84)
            tcfg = dataclasses.replace(tcfg, use_rigid=False)

    if tcfg.use_smpl:
        built = _smpl_from_scene(key, cfg, data, tcfg)
        if built is not None:
            sp, ss, sa, sm = built
            params["SMPLNodes"] = sp
            statics["SMPLNodes"] = ss
            aux["SMPLNodes"] = sa
            masks["SMPLNodes"] = sm
        else:
            tcfg = dataclasses.replace(tcfg, use_smpl=False)

    if tcfg.use_deformable:
        # with SMPL off (or its gated model pickle absent) SMPL-class
        # instances fall through to DeformableNodes, mirroring the
        # reference's load_smpl=False routing (the shipped nuScenes
        # protocol, scripts/train.sh:16; nuscenes_sourceloader SMPLNODE
        # handling)
        deform_types = ("DeformableNodes",) if tcfg.use_smpl else (
            "DeformableNodes", "SMPLNodes")
        obj = scene_mod.get_init_objects(data, deform_types)
        if obj is not None:
            cap = int(cfg.get("deformable_capacity",
                              2 * obj["means"].shape[0]))
            num_inst = obj["sizes"].shape[0]
            dp, ds, da, dm = setup.build_deformable(
                key, cap, jnp.asarray(obj["means"]),
                jnp.asarray(scene_mod.lidar_colors_for_points(
                    data, obj["means"])),
                jnp.asarray(obj["point_ids"]), jnp.asarray(obj["quats"]),
                jnp.asarray(obj["trans"]), jnp.asarray(obj["frame_valid"]),
                jnp.asarray(obj["sizes"]), num_inst,
                sh_degree=tcfg.sh_degree)
            params["DeformableNodes"] = dp
            statics["DeformableNodes"] = ds
            aux["DeformableNodes"] = da
            masks["DeformableNodes"] = dm
        else:
            # safe_init_models: drop empty classes (scene_graph.py:73-84)
            tcfg = dataclasses.replace(tcfg, use_deformable=False)

    return tcfg, data, params, statics, aux, masks


def _smpl_from_scene(key, cfg, data, tcfg):
    """SMPL instances from tracked poses; requires the SMPL model pickle
    (cfg.smpl.model_path) — returns None if missing (gated asset)."""
    smpl_path = cfg.get_path("smpl.model_path")
    inst = data.instances
    synthetic_body = smpl_path == "synthetic"
    if inst is None or smpl_path is None or not (
            synthetic_body or os.path.exists(smpl_path)):
        return None
    sel = [i for i, nt in enumerate(inst.node_types) if nt == "SMPLNodes"]
    if not sel:
        return None
    # "synthetic": deterministic low-poly body in place of the gated SMPL
    # pickle, so fixture-scale smokes exercise the full SMPL branch
    # (LBS + tracked body quats) without the licensed asset
    model = (smpl_model.synthetic_model(jax.random.key(0), num_verts=256)
             if synthetic_body else smpl_model.load_model(smpl_path))
    F, I = data.num_frames, len(sel)
    from ..core import transforms as T

    poses = inst.poses[:, sel]
    # np.array (not asarray): the jax buffer view is read-only and tracked
    # poses are written in below
    root_q = np.array(T.rotmat_to_quat(jnp.asarray(poses[..., :3, :3])))
    body = np.broadcast_to(np.asarray(smpl_model.da_pose_quats())[1:],
                           (F, I, 23, 4)).copy()
    betas = np.zeros((I, 10), np.float32)
    frame_valid = inst.frame_valid[:, sel].copy()
    # tracked joint angles: root = world-rotated SMPL global orient, body =
    # 23 joint quats, translation stays the instance box center
    # (nuscenes_sourceloader.py:284-336)
    if data.smpl_poses:
        for local_i, i in enumerate(sel):
            track = data.smpl_poses.get(str(inst.ids[i]))
            if track is None:
                continue
            tv = track["valid"]
            root_q[tv, local_i] = track["quats"][tv, 0]
            body[tv, local_i] = track["quats"][tv, 1:]
            betas[local_i] = track["betas"]
            frame_valid[:, local_i] &= tv
    return setup.build_smpl(
        key, model, jnp.asarray(betas),
        jnp.asarray(root_q)[:, :, None, :], jnp.asarray(body),
        jnp.asarray(poses[..., :3, 3]),
        jnp.asarray(frame_valid), sh_degree=tcfg.sh_degree,
        use_voxel_deformer=tcfg.use_voxel_deformer)


def build_synthetic_scene(key, cfg: ConfigDict, interpret=False):
    """Synthetic scene path (configs/synthetic.yaml; smoke/bench)."""
    d = cfg.get("data", {})
    W = d.get("width", 128)
    H = d.get("height", 96)
    num_frames = d.get("num_frames", 6)
    scene = synthetic.make_scene(key, num_bg=d.get("num_bg", 3000),
                                 num_frames=num_frames, width=W, height=H)
    tcfg = trainer_config_from(cfg, num_frames, num_frames, 15.0, interpret)
    params = setup.build_models(key, tcfg)
    masks, aux, statics = {}, {}, {}
    bg_cap = d.get("bg_capacity", 8192)
    if tcfg.background_model == "pvg":
        bg, masks["Background"] = setup.build_pvg_background(
            key, bg_cap, scene.bg_means, scene.bg_colors,
            sh_degree=tcfg.sh_degree,
            time_scale=tcfg.pvg_time_interval * max(tcfg.num_frames - 1, 1))
        statics["Background"] = {}
    elif tcfg.background_model == "deformgs":
        bg, statics["Background"], masks["Background"] = \
            setup.build_deformgs_background(
                key, bg_cap, scene.bg_means, scene.bg_colors,
                jnp.zeros(3), 20.0, sh_degree=tcfg.sh_degree)
    else:
        bg, masks["Background"] = setup.build_background(
            key, bg_cap, scene.bg_means, scene.bg_colors,
            sh_degree=tcfg.sh_degree)
        statics["Background"] = {}
    params["Background"] = bg
    aux["Background"] = {}
    if tcfg.use_rigid:
        rp, rs, ra, rm = setup.build_rigid(
            key, 1024, scene.rigid_means, scene.rigid_colors,
            scene.rigid_point_ids, scene.rigid_quats, scene.rigid_trans,
            scene.rigid_fv, scene.rigid_sizes, sh_degree=tcfg.sh_degree)
        params["RigidNodes"] = rp
        statics["RigidNodes"] = rs
        aux["RigidNodes"] = ra
        masks["RigidNodes"] = rm
    if tcfg.use_smpl:
        # synthetic body model (no SMPL pickle needed) so smpl configs can
        # smoke-test end to end
        model = smpl_model.synthetic_model(key, num_verts=64)
        F, I = num_frames, 1
        root = jnp.broadcast_to(smpl_model.da_pose_quats()[0], (F, I, 1, 4))
        body = jnp.broadcast_to(smpl_model.da_pose_quats()[1:], (F, I, 23, 4))
        trans = jnp.tile(jnp.array([0.0, 0.0, 8.0]), (F, I, 1))
        sp, ss, sa, sm = setup.build_smpl(
            jax.random.fold_in(key, 2), model, jnp.zeros((I, 10)), root,
            body, trans, jnp.ones((F, I), bool), sh_degree=tcfg.sh_degree,
            use_voxel_deformer=tcfg.use_voxel_deformer)
        params["SMPLNodes"] = sp
        statics["SMPLNodes"] = ss
        aux["SMPLNodes"] = sa
        masks["SMPLNodes"] = sm
    if tcfg.use_deformable:
        # the synthetic scene reuses its rigid instances as deformable ones
        num_inst = int(scene.rigid_sizes.shape[0])
        dp, ds, da, dm = setup.build_deformable(
            jax.random.fold_in(key, 3), 1024, scene.rigid_means,
            scene.rigid_colors, scene.rigid_point_ids, scene.rigid_quats,
            scene.rigid_trans, scene.rigid_fv, scene.rigid_sizes, num_inst,
            sh_degree=tcfg.sh_degree)
        params["DeformableNodes"] = dp
        statics["DeformableNodes"] = ds
        aux["DeformableNodes"] = da
        masks["DeformableNodes"] = dm
    return tcfg, scene, params, statics, aux, masks
