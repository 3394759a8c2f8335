"""SMPL body model in pure JAX: shaping, kinematic chain, LBS.

Replaces the vendored torch smplx package the reference wraps through
`SMPLTemplate` (project/models/human_body.py:83-180; smplx/lbs.py
`batch_rigid_transform`, smplx/body_models.py `SMPLLayer`). Only the pieces
the pipeline exercises are implemented: betas -> shaped vertices/joints,
quaternion joint rotations -> per-joint world transforms A, the canonical
da-pose inverse A·A0⁻¹ trick, and LBS weights. Loads the standard
`SMPL_NEUTRAL.pkl` when available; `synthetic_model()` provides a small
random-but-valid body for tests and demos (the real asset is licensed and not
vendored).
"""
from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms
from ..models.encoders import Static

NUM_JOINTS = 24


class SMPLModel(NamedTuple):
    v_template: jax.Array    # (V, 3)
    shapedirs: jax.Array     # (V, 3, n_betas)
    j_regressor: jax.Array   # (24, V)
    lbs_weights: jax.Array   # (V, 24)
    parents: tuple           # static tuple of 24 ints
    faces: np.ndarray        # (F, 3) int


def load_model(path: str) -> SMPLModel:
    """Load the standard SMPL pickle (same file the reference consumes)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    def dense(x):
        if hasattr(x, "todense"):
            return np.asarray(x.todense())
        return np.asarray(x)

    shapedirs = np.asarray(data["shapedirs"])[..., :10]
    return SMPLModel(
        v_template=jnp.asarray(np.asarray(data["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        j_regressor=jnp.asarray(dense(data["J_regressor"]), jnp.float32),
        lbs_weights=jnp.asarray(np.asarray(data["weights"]), jnp.float32),
        parents=tuple(int(i) for i in np.asarray(data["kintree_table"])[0]),
        faces=np.asarray(data["f"], np.int64),
    )


def synthetic_model(key, num_verts: int = 512) -> SMPLModel:
    """Random but kinematically valid stand-in (tests / no-asset demos)."""
    k1, k2, k3 = jax.random.split(key, 3)
    parents = (-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16,
               17, 18, 19, 20, 21)  # SMPL kinematic tree
    joints = 0.3 * jax.random.normal(k1, (NUM_JOINTS, 3))
    # vertices clustered near joints; weights: softmax of negative distances
    assign = jax.random.randint(k2, (num_verts,), 0, NUM_JOINTS)
    verts = joints[assign] + 0.05 * jax.random.normal(k3, (num_verts, 3))
    d2 = jnp.sum((verts[:, None] - joints[None]) ** 2, -1)
    weights = jax.nn.softmax(-d2 / 0.02, axis=-1)
    # j_regressor: averages the vertices assigned to each joint
    onehot = jax.nn.one_hot(assign, NUM_JOINTS).T
    j_reg = onehot / jnp.maximum(onehot.sum(1, keepdims=True), 1.0)
    return SMPLModel(
        v_template=verts,
        shapedirs=0.01 * jax.random.normal(key, (num_verts, 3, 10)),
        j_regressor=j_reg,
        lbs_weights=weights,
        parents=parents,
        faces=np.zeros((1, 3), np.int64),
    )


def shape_model(model: SMPLModel, betas: jax.Array):
    """betas (B, 10) -> (verts (B, V, 3), joints (B, 24, 3))."""
    offsets = jnp.einsum("vcb,nb->nvc", model.shapedirs, betas)
    verts = model.v_template[None] + offsets
    joints = jnp.einsum("jv,nvc->njc", model.j_regressor, verts)
    return verts, joints


def batch_rigid_transform(rot_mats: jax.Array, joints: jax.Array,
                          parents) -> tuple[jax.Array, jax.Array]:
    """smplx lbs.batch_rigid_transform: rot_mats (B, 24, 3, 3), joints
    (B, 24, 3) -> (posed_joints (B, 24, 3), rel_transforms A (B, 24, 4, 4)).

    The 24-deep kinematic chain is unrolled statically (XLA-friendly; 24 tiny
    matmuls)."""
    B = rot_mats.shape[0]
    rel_joints = joints.at[:, 1:].add(-joints[:, list(parents[1:])])

    def make_T(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)
        bot = jnp.broadcast_to(
            jnp.array([[0.0, 0.0, 0.0, 1.0]], R.dtype), (B, 1, 4))
        return jnp.concatenate([top, bot], axis=-2)

    chains = [make_T(rot_mats[:, 0], rel_joints[:, 0])]
    for i in range(1, len(parents)):
        chains.append(chains[parents[i]] @ make_T(rot_mats[:, i],
                                                  rel_joints[:, i]))
    chain = jnp.stack(chains, axis=1)                 # (B, 24, 4, 4)
    posed_joints = chain[..., :3, 3]
    # A = chain with translation corrected by -R_chain @ j (remove the
    # canonical joint position so A acts on canonical-space points)
    correction = jnp.einsum("bjrc,bjc->bjr", chain[..., :3, :3], joints)
    A = chain.at[..., :3, 3].add(-correction)
    return posed_joints, A


def da_pose_quats(dtype=jnp.float32) -> jax.Array:
    """Canonical da-pose as 24 wxyz quaternions (human_body.py:66-82:
    body joints 0 and 1 rotated ±30° about z)."""
    aa = jnp.zeros((NUM_JOINTS, 3), dtype)
    aa = aa.at[1, 2].set(jnp.pi / 6)     # body_pose[2] -> joint 1, z
    aa = aa.at[2, 2].set(-jnp.pi / 6)    # body_pose[5] -> joint 2, z
    return transforms.axis_angle_to_quat(aa)


class SMPLTemplate(NamedTuple):
    """Per-instance canonical template (reference SMPLTemplate ctor)."""
    j_canonical: jax.Array   # (B, 24, 3)
    a0_inv: jax.Array        # (B, 24, 4, 4)
    verts_canonical: jax.Array  # (B, V, 3)
    lbs_weights: jax.Array   # (B, V, 24)
    parents: Static          # Static(tuple) so the pytree has no int leaves


def make_template(model: SMPLModel, betas: jax.Array) -> SMPLTemplate:
    """Canonical da-pose template: A0 from the da-pose, canonical vertices
    LBS-posed into da-pose (human_body.py:100-132)."""
    B = betas.shape[0]
    verts_shaped, joints = shape_model(model, betas)
    quats = jnp.broadcast_to(da_pose_quats(), (B, NUM_JOINTS, 4))
    rot = transforms.quat_to_rotmat(quats)
    _, A0 = batch_rigid_transform(rot, joints, model.parents)
    # canonical (da-posed) vertices via LBS with A0
    T = jnp.einsum("vj,bjrc->bvrc", model.lbs_weights, A0)
    verts_cano = (jnp.einsum("bvrc,bvc->bvr", T[..., :3, :3], verts_shaped)
                  + T[..., :3, 3])
    return SMPLTemplate(
        j_canonical=joints,
        a0_inv=jnp.linalg.inv(A0),
        verts_canonical=verts_cano,
        lbs_weights=jnp.broadcast_to(model.lbs_weights[None],
                                     (B,) + model.lbs_weights.shape),
        parents=Static(model.parents),
    )


def skinning_transforms(template: SMPLTemplate, joint_quats: jax.Array):
    """joint_quats (B, 24, 4) -> A·A0⁻¹ (B, 24, 4, 4)
    (human_body.py:158-180)."""
    rot = transforms.quat_to_rotmat(transforms.quat_normalize(joint_quats))
    _, A = batch_rigid_transform(rot, template.j_canonical,
                                 template.parents.value)
    return jnp.einsum("bnij,bnjk->bnik", A, template.a0_inv)


def lbs_apply(W: jax.Array, A: jax.Array, points: jax.Array):
    """Skin canonical points: W (B, N, 24), A (B, 24, 4, 4), points
    (B, N, 3) -> (posed points, per-point rotation (B, N, 3, 3))
    (smpl.py:298-306)."""
    T = jnp.einsum("bnj,bjrc->bnrc", W, A)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("bnij,bnj->bni", R, points) + t, R


def mesh_init_qso(verts: np.ndarray, faces: np.ndarray, key,
                 scale_init_factor: float = 1.0,
                 thickness_init_factor: float = 0.5,
                 max_scale: float = 1.0, min_scale: float = 0.0):
    """Mesh-surface Gaussian geometry init (human_body.py:216-259
    `init_qso_on_mesh`): per-vertex local frame with z along the vertex
    normal and random tangent xy -> quats; scale = disk radius from the
    1-ring area (thickness = 0.5x), stored as logit(radius) exactly like the
    reference (whose get_gaussians then applies exp — the activated scale is
    r/(1-r) ~= r for surface-size radii).

    verts (I, V, 3), faces (F, 3). Returns (quats (I*V, 4),
    log_scales (I*V, 3)).
    """
    num_inst, V = verts.shape[:2]
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces)

    quats_all, scales_all = [], []
    rng = np.random.RandomState(
        int(jax.random.randint(key, (), 0, 2 ** 31 - 1)))
    for b in range(num_inst):
        v = verts[b]
        fv = v[faces]                                   # (F, 3, 3)
        fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        area2 = np.linalg.norm(fn, axis=-1)             # 2x triangle area
        # vertex normals: area-weighted accumulation of face normals
        normal = np.zeros_like(v)
        vtx_area = np.zeros(V, np.float32)
        for i in range(3):
            np.add.at(normal, faces[:, i], fn)
            np.add.at(vtx_area, faces[:, i], area2 / 2.0 / 3.0)
        nrm = np.linalg.norm(normal, axis=-1, keepdims=True)
        uz = np.where(nrm > 1e-12, normal / np.maximum(nrm, 1e-12),
                      np.array([0.0, 0.0, 1.0], np.float32))
        rand_dir = rng.randn(V, 3).astype(np.float32)
        ux = np.cross(uz, rand_dir)
        ux /= np.maximum(np.linalg.norm(ux, axis=-1, keepdims=True), 1e-12)
        uy = np.cross(uz, ux)
        uy /= np.maximum(np.linalg.norm(uy, axis=-1, keepdims=True), 1e-12)
        frame = np.stack([ux, uy, uz], axis=-1)         # columns = basis
        quats_all.append(np.asarray(
            transforms.rotmat_to_quat(jnp.asarray(frame)), np.float32))

        radius = np.sqrt(np.maximum(vtx_area, 0.0) / np.pi)
        radius = np.clip(radius * scale_init_factor,
                         min_scale + 1e-4, max_scale - 1e-4)
        thickness = np.clip(radius * thickness_init_factor,
                            min_scale + 1e-4, max_scale - 1e-4)
        logit = lambda p: np.log(p / (1.0 - p))
        scales_all.append(np.stack(
            [logit(radius), logit(radius), logit(thickness)],
            axis=-1).astype(np.float32))
    return (np.concatenate(quats_all), np.concatenate(scales_all))
