"""Data layer: drivestudio-format scene loading round-trip on a generated
fake scene directory, splits, depth projection, init extraction, sampler."""
import json
import os

import numpy as np
import pytest

from bilateral_driving_tpu.data import importance, scene


@pytest.fixture(scope="module")
def fake_scene(tmp_path_factory):
    """Write a minimal drivestudio-format scene: 4 frames, 2 cameras."""
    from PIL import Image

    root = tmp_path_factory.mktemp("scene")
    F, H, W = 4, 32, 48
    rng = np.random.RandomState(0)
    for sub in ["images", "sky_masks", "dynamic_masks/all",
                "dynamic_masks/human", "dynamic_masks/vehicle",
                "extrinsics", "intrinsics", "lidar", "lidar_pose",
                "instances"]:
        os.makedirs(root / sub, exist_ok=True)

    for cam in range(2):
        np.savetxt(root / "intrinsics" / f"{cam}.txt",
                   np.array([40.0, 40.0, W / 2, H / 2]))
    for t in range(F):
        for cam in range(2):
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / "images" / f"{t:03d}_{cam}.jpg")
            sky = np.zeros((H, W), np.uint8)
            sky[: H // 4] = 255
            Image.fromarray(sky).save(root / "sky_masks" / f"{t:03d}_{cam}.png")
            dyn = np.zeros((H, W), np.uint8)
            dyn[H // 2:, : W // 2] = 255
            Image.fromarray(dyn).save(
                root / "dynamic_masks" / "all" / f"{t:03d}_{cam}.png")
            c2w = np.eye(4)
            c2w[:3, 3] = [cam * 0.5, 0.0, t * 1.0]
            np.savetxt(root / "extrinsics" / f"{t:03d}_{cam}.txt", c2w)
        # lidar: ring of points in front of the cameras, world frame
        pts = rng.randn(500, 3).astype(np.float32) * np.array([5, 1, 5]) + \
            np.array([0, 0.5, 10.0])
        xyzi = np.concatenate([pts, np.ones((500, 1), np.float32)], 1)
        xyzi.astype(np.float32).tofile(root / "lidar" / f"{t:03d}.bin")
        np.savetxt(root / "lidar_pose" / f"{t:03d}.txt", np.eye(4))

    # one moving rigid instance
    info = {
        "0": {
            "class_name": "vehicle.car",
            "frame_annotations": {
                "frame_idx": list(range(F)),
                "obj_to_world": [
                    np.eye(4).tolist() for _ in range(F)
                ],
                "box_size": [[2.0, 1.5, 4.0]] * F,
            },
        }
    }
    for f in range(F):
        info["0"]["frame_annotations"]["obj_to_world"][f][0][3] = f * 2.0
    with open(root / "instances" / "instances_info.json", "w") as fh:
        json.dump(info, fh)
    with open(root / "instances" / "frame_instances.json", "w") as fh:
        json.dump({str(f): ["0"] for f in range(F)}, fh)
    return str(root)


class TestLoadScene:
    def test_roundtrip(self, fake_scene):
        data = scene.load_scene(fake_scene, cameras=(0, 1))
        assert data.num_frames == 4 and data.num_cams == 2
        assert data.num_images == 8
        assert data.images.shape == (8, 32, 48, 3)
        assert 0.0 <= data.images.min() and data.images.max() <= 1.0
        # world recentered: first front-cam pose is identity
        np.testing.assert_allclose(data.cam_to_worlds[0], np.eye(4),
                                   atol=1e-6)
        assert data.sky_masks[0, 0, 0] == 1.0 and data.sky_masks[0, -1, 0] == 0.0

    def test_depth_maps(self, fake_scene):
        data = scene.load_scene(fake_scene, cameras=(0,))
        assert data.lidar_depth_maps is not None
        hits = data.lidar_depth_maps[0] > 0
        assert hits.sum() > 10
        d = data.lidar_depth_maps[0][hits]
        assert (d > 0.5).all() and (d < 50).all()

    def test_split_and_neighbors(self, fake_scene):
        data = scene.load_scene(fake_scene, cameras=(0, 1))
        train, test = data.split_train_test(test_stride=2)
        test_frames = set(data.frame_of_image[test])
        assert test_frames == {2}
        assert len(train) + len(test) == 8
        nbrs = data.neighbor_train_indices(test_stride=2, k=2)
        for ti, ns in nbrs.items():
            assert data.cam_of_image[ti] == data.cam_of_image[ns[0]]
            assert len(ns) == 2

    def test_batch_contract(self, fake_scene):
        data = scene.load_scene(fake_scene, cameras=(0,))
        b = data.get_batch(3)
        for k in ["pixels", "sky_masks", "lidar_depth_map", "viewdirs",
                  "img_idx", "frame_idx", "normed_time", "camera_to_world",
                  "intrinsics"]:
            assert k in b, k
        assert b["pixels"].shape == (32, 48, 3)
        assert b["viewdirs"].shape == (32, 48, 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(b["viewdirs"]), axis=-1), 1.0,
            atol=1e-5)
        b2 = data.get_batch(3, downscale=2)
        assert b2["pixels"].shape == (16, 24, 3)
        np.testing.assert_allclose(np.asarray(b2["intrinsics"])[0, 0],
                                   np.asarray(b["intrinsics"])[0, 0] / 2)

    def test_instances(self, fake_scene):
        data = scene.load_scene(fake_scene, cameras=(0,))
        inst = data.instances
        assert inst is not None and len(inst.ids) == 1
        assert inst.node_types[0] == "RigidNodes"
        assert inst.frame_valid.all()
        # instance moves 2 units/frame in x
        np.testing.assert_allclose(
            inst.poses[1, 0, 0, 3] - inst.poses[0, 0, 0, 3], 2.0, atol=1e-5)

    def test_init_objects_and_background(self, fake_scene):
        data = scene.load_scene(fake_scene, cameras=(0,))
        obj = scene.get_init_objects(data, "RigidNodes", only_moving=True)
        assert obj is not None
        assert obj["quats"].shape == (4, 1, 4)
        assert obj["means"].shape[0] == obj["point_ids"].shape[0]
        # local points inside the box
        assert (np.abs(obj["means"]) <= obj["sizes"][0] / 2 + 1e-5).all()

        bg = scene.get_init_background(data, num_samples=1000, num_near=100,
                                       num_far=100)
        assert bg.shape[0] <= 1200 and bg.shape[0] > 200
        colors = scene.lidar_colors_for_points(data, bg[:50])
        assert colors.shape == (50, 3)
        assert (colors >= 0).all() and (colors <= 1).all()


class TestImportanceSampler:
    def test_uniform_before_buffer(self):
        s = importance.ImageSampler(10, 2, buffer_ratio=1.0)
        picks = {s.propose(np.arange(10)) for _ in range(50)}
        assert len(picks) > 3

    def test_error_weighted(self):
        s = importance.ImageSampler(10, 2, buffer_ratio=1.0, seed=1)
        errors = np.zeros(10)
        errors[7] = 100.0
        s.update_all(errors)
        picks = [s.propose(np.arange(10)) for _ in range(30)]
        assert picks.count(7) > 25

    def test_buffer_ratio_zero_is_uniform(self):
        s = importance.ImageSampler(10, 2, buffer_ratio=0.0, seed=2)
        s.update_all(np.eye(10)[0] * 100)
        picks = [s.propose(np.arange(10)) for _ in range(100)]
        assert picks.count(0) < 30

    def test_start_enhance(self):
        s = importance.ImageSampler(20, 2, buffer_ratio=1.0,
                                    start_enhance_weight=5.0, seed=3)
        s.update_all(np.ones(20))
        picks = np.array([s.propose(np.arange(20)) for _ in range(400)])
        early = (picks < 2).mean()
        assert early > 0.15   # boosted over the uniform 0.1


class TestSMPLPoses:
    def _write_pkl(self, root, F=4):
        """Synthesize humanpose/smpl.pkl in the 4D-Humans tracked format
        (nuscenes_sourceloader.py:284-336)."""
        import pickle

        os.makedirs(os.path.join(root, "humanpose"), exist_ok=True)
        rng = np.random.RandomState(3)

        def rot_x(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)

        body = np.stack([np.stack([rot_x(0.1 * (j + 1) * (f + 1))
                                   for j in range(23)])
                         for f in range(F)])          # (F, 23, 3, 3)
        orient = np.stack([rot_x(0.2 * f) for f in range(F)])
        d = {
            "7": {
                "valid_mask": np.array([True, True, False, True]),
                "selected_cam_idx": np.zeros(F, np.int64),
                "smpl": {
                    "betas": rng.randn(F, 10).astype(np.float32),
                    "body_pose": body,
                    "global_orient": orient,
                },
            }
        }
        with open(os.path.join(root, "humanpose", "smpl.pkl"), "wb") as f:
            pickle.dump(d, f)
        return d

    def test_load_smpl_poses_roundtrip(self, fake_scene):
        import jax.numpy as jnp

        from bilateral_driving_tpu.core import transforms as T

        raw = self._write_pkl(fake_scene)
        out = scene.load_smpl_poses(fake_scene, [0, 1, 2, 3], np.eye(4))
        assert out is not None and "7" in out
        track = out["7"]
        assert track["quats"].shape == (4, 24, 4)
        np.testing.assert_array_equal(track["valid"],
                                      [True, True, False, True])
        # invalid frame stays identity
        np.testing.assert_allclose(track["quats"][2, 0], [1, 0, 0, 0])
        # body joint quats round-trip to the written rotations
        R = np.asarray(T.quat_to_rotmat(jnp.asarray(track["quats"][1, 1:])))
        np.testing.assert_allclose(R, raw["7"]["smpl"]["body_pose"][1],
                                   atol=1e-5)
        # global orient is world-rotated by the selected camera's c2w; the
        # fake scene's c2w rotation is identity, so it round-trips directly
        R0 = np.asarray(T.quat_to_rotmat(jnp.asarray(track["quats"][3, 0])))
        np.testing.assert_allclose(R0, raw["7"]["smpl"]["global_orient"][3],
                                   atol=1e-5)

    def test_mesh_init_qso(self):
        import jax

        from bilateral_driving_tpu.scene import smpl_model

        # regular tetrahedron: all vertex areas equal, normals point outward
        v = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                     np.float32)[None]
        f = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]])
        q, s = smpl_model.mesh_init_qso(v, f, jax.random.key(0))
        assert q.shape == (4, 4) and s.shape == (4, 3)
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
        # frame z-axis == outward vertex normal (-v/|v| inward for tet ->
        # normals point away from centroid = +v/|v|)
        import jax.numpy as jnp

        from bilateral_driving_tpu.core import transforms as T

        R = np.asarray(T.quat_to_rotmat(jnp.asarray(q)))
        uz = R[:, :, 2]
        expect = v[0] / np.linalg.norm(v[0], axis=-1, keepdims=True)
        np.testing.assert_allclose(np.abs(np.sum(uz * expect, -1)), 1.0,
                                   atol=1e-4)
        # activated scales exp(logit(r)) stay in surface range
        r = np.exp(s)
        assert (r > 0).all() and (r[:, 2] < r[:, 0] + 1e-6).all()


FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.skipif(not os.path.isdir(os.path.join(FIXDIR,
                                                   "mini_scene_nuscenes")),
                    reason="committed fixtures absent")
class TestCommittedFixtures:
    """Loader tests against the *committed* drivestudio-layout mini-scenes
    (format-pinning fixtures, tests/fixtures/make_mini_scene.py)."""

    def test_nuscenes_layout(self):
        data = scene.load_scene(
            os.path.join(FIXDIR, "mini_scene_nuscenes"), cameras=(0, 1),
            dataset="nuscenes", undistort=True,
            ego_mask_dir=os.path.join(FIXDIR, "ego_masks"))
        assert data.num_frames == 3 and data.num_cams == 2
        assert data.images.shape == (6, 48, 64, 3)
        # world recentered on first front-cam pose -> identity
        np.testing.assert_allclose(data.cam_to_worlds[0], np.eye(4),
                                   atol=1e-6)
        # per-camera ego masks: cam 1 has a hood band, cam 0 none
        assert data.egocar_masks is not None
        assert data.egocar_masks[0].sum() == 0
        assert data.egocar_masks[1].sum() > 0
        b = data.get_batch(1)
        assert "egocar_masks" in b and b["egocar_masks"].shape == (48, 64)
        # lidar present and in world frame (finite, plausible range)
        assert data.lidar_points[0].shape[0] == 256
        assert np.isfinite(data.lidar_points[0]).all()
        # tracked SMPL poses parsed from humanpose/smpl.pkl
        assert data.smpl_poses is not None and "1" in data.smpl_poses
        sp = data.smpl_poses["1"]
        assert sp["quats"].shape == (3, 24, 4)
        assert sp["valid"].tolist() == [True, True, False]

    def test_nuscenes_undistort_changes_pixels(self):
        root = os.path.join(FIXDIR, "mini_scene_nuscenes")
        d0 = scene.load_scene(root, cameras=(1,), dataset="nuscenes",
                              undistort=False)
        d1 = scene.load_scene(root, cameras=(1,), dataset="nuscenes",
                              undistort=True)
        # cam 1 carries nonzero distortion -> undistortion must change pixels
        assert np.abs(d0.images - d1.images).max() > 1e-3

    def test_waymo_layout(self):
        from bilateral_driving_tpu.data import meta

        data = scene.load_scene(
            os.path.join(FIXDIR, "mini_scene_waymo"), cameras=(0, 1),
            dataset="waymo")
        assert data.num_frames == 3
        # c2w = inv(ego0) @ ego_t @ cam_to_ego @ OPENCV2DATASET
        root = os.path.join(FIXDIR, "mini_scene_waymo")
        ego0 = np.loadtxt(os.path.join(root, "ego_pose", "000.txt"))
        ego2 = np.loadtxt(os.path.join(root, "ego_pose", "002.txt"))
        c2e = np.loadtxt(os.path.join(root, "extrinsics", "0.txt"))
        expect = np.linalg.inv(ego0) @ ego2 @ c2e @ \
            meta.DATASETS["waymo"].opencv_mat()
        np.testing.assert_allclose(data.cam_to_worlds[4], expect, atol=1e-6)
        # waymo 14-column lidar parsed, ego->recentered-world transform
        raw = np.fromfile(os.path.join(root, "lidar", "001.bin"),
                          np.float32).reshape(-1, 14)
        ego1 = np.loadtxt(os.path.join(root, "ego_pose", "001.txt"))
        l2w = np.linalg.inv(ego0) @ ego1
        expect_pts = raw[:, 3:6] @ l2w[:3, :3].T + l2w[:3, 3]
        np.testing.assert_allclose(data.lidar_points[1], expect_pts,
                                   atol=1e-4)

    def test_lidar_depth_projection_real_hits(self):
        """Every image of both committed layouts must receive projected
        lidar depth (guards against convention bugs that silently zero the
        depth-supervision path — an earlier fixture had sky-facing OpenCV
        axes and 0 hits everywhere). The two layouts encode the SAME
        geometry through different file conventions, so their per-image hit
        counts must agree exactly."""
        hits = {}
        for name, ds in (("mini_scene_nuscenes", "nuscenes"),
                         ("mini_scene_waymo", "waymo")):
            d = scene.load_scene(os.path.join(FIXDIR, name), cameras=(0, 1),
                                 dataset=ds)
            hits[ds] = [int((np.asarray(
                d.get_batch(i, 1)["lidar_depth_map"]) > 0).sum())
                for i in range(d.num_images)]
            assert min(hits[ds]) > 5, (name, hits[ds])
        assert hits["nuscenes"] == hits["waymo"]

    def test_reference_aabb_semantics(self):
        data = scene.load_scene(
            os.path.join(FIXDIR, "mini_scene_nuscenes"), cameras=(0, 1),
            dataset="nuscenes")
        aabb = data.aabb()
        front = data.cam_to_worlds[data.cam_of_image == 0, :3, 3]
        np.testing.assert_allclose(aabb[1][0], front[:, 0].max() + 40.0,
                                   atol=1e-4)
        assert aabb[1][2] <= 20.0 and aabb[0][2] >= -5.0


def test_sparse_depth_downsample_hit_mean():
    """Block average over lidar HITS only (reference
    pixel_source.py:77-92), zero for hitless blocks, ceil-sized output."""
    from bilateral_driving_tpu.data.scene import _sparse_depth_downsample
    d = np.zeros((5, 4), np.float32)
    d[0, 0], d[1, 1] = 10.0, 40.0   # two hits in the top-left 2x2 block
    d[4, 2] = 7.0                   # one hit in the ragged last row
    out = _sparse_depth_downsample(d, 2)
    assert out.shape == (3, 2)
    np.testing.assert_allclose(out[0, 0], 25.0)   # mean of hits, not max
    np.testing.assert_allclose(out[0, 1], 0.0)    # no hits -> 0
    np.testing.assert_allclose(out[2, 1], 7.0)


class TestEgoMaskAssets:
    """Converter-written ego-mask assets (preprocess/ego_masks.py) and the
    loader's `<scene>/ego_masks/` search path (VERDICT round-3 item 9)."""

    def _copy(self, fake_scene, tmp_path):
        import shutil
        dst = str(tmp_path / "scene")
        shutil.copytree(fake_scene, dst)
        return dst

    def test_placeholders_warn_not_mask(self, fake_scene, tmp_path, caplog):
        import logging

        from bilateral_driving_tpu.preprocess import ego_masks as em

        root = self._copy(fake_scene, tmp_path)
        d = em.write_placeholders(root, [0, 1], {0: (48, 32), 1: (48, 32)})
        assert os.path.exists(os.path.join(d, "README.txt"))
        assert em.is_placeholder(os.path.join(d, "0.png"))
        with caplog.at_level(logging.WARNING, "bilateral_driving_tpu"):
            data = scene.load_scene(root, cameras=(0, 1),
                                    dataset="nuscenes")
        # all-zero placeholders are NOT treated as real masks, and the
        # silent-ego-pixel hazard is surfaced
        assert data.egocar_masks is None
        assert any("ego" in r.message for r in caplog.records)

    def test_scene_dir_masks_found(self, fake_scene, tmp_path):
        from PIL import Image

        from bilateral_driving_tpu.preprocess import ego_masks as em

        root = self._copy(fake_scene, tmp_path)
        src = tmp_path / "src"
        os.makedirs(src)
        hood = np.zeros((32, 48), np.uint8)
        hood[-6:] = 255
        Image.fromarray(hood).save(src / "1.png")
        n = em.import_masks(str(src), root, [0, 1],
                            {0: (48, 32), 1: (48, 32)})
        assert n == 1
        assert not em.is_placeholder(
            os.path.join(em.scene_mask_dir(root), "1.png"))
        # picked up with no explicit ego_mask_dir
        data = scene.load_scene(root, cameras=(0, 1), dataset="nuscenes")
        assert data.egocar_masks is not None
        assert data.egocar_masks[0].sum() == 0
        assert data.egocar_masks[1].sum() > 0
        b = data.get_batch(1)
        assert "egocar_masks" in b
