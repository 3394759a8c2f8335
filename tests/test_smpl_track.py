"""SMPL track postprocessing: match -> interpolate -> merge -> smpl.pkl.

Synthetic two-camera scene with two GT pedestrians and noisy predicted
tracks (one with a detection gap, one visible only on camera 1); the merged
pkl must round-trip through `data/scene.py:load_smpl_poses` (reference
pipeline: datasets/tools/postprocess.py match_and_postprocess ->
nuscenes_sourceloader.py:284-336 consumption)."""
import os

import numpy as np
import pytest

from bilateral_driving_tpu.preprocess import smpl_track as st


def _rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _pred_frame(tids, boxes, thetas):
    return {
        "tid": list(tids),
        "tracked_time": [0] * len(tids),
        "bbox": [np.asarray(b, np.float64) for b in boxes],
        "camera": [np.array([1.0, 0.0, 0.0])] * len(tids),
        "smpl": [{
            "global_orient": _rot_z(th).reshape(1, 3, 3),
            "body_pose": np.tile(_rot_z(th / 2), (st.NUM_BODY_JOINTS, 1, 1)),
            "betas": np.full(10, 0.1 * (i + 1)),
        } for i, th in enumerate(thetas)],
    }


def _gt_frame(tids, boxes):
    return {"extra_data": {"gt_track_id": list(tids)},
            "gt_bbox": [np.asarray(b, np.float64) for b in boxes]}


F = 6


@pytest.fixture
def tracked_scene():
    """GT track 7 on both cams (bigger on cam 1); GT track 9 on cam 0 only.
    Pred track 100 follows GT 7 with a miss at frame 3; pred 200 follows
    GT 9; pred 300 is a spurious far box matching nothing."""
    box7 = [10.0, 10.0, 20.0, 40.0]
    box7_big = [200.0, 10.0, 30.0, 60.0]
    box9 = [100.0, 20.0, 15.0, 30.0]
    far = [400.0, 300.0, 5.0, 5.0]

    gt0, gt1, pr0, pr1 = {}, {}, {}, {}
    for fi in range(F):
        gt0[fi] = _gt_frame([7, 9], [box7, box9])
        gt1[fi] = _gt_frame([7], [box7_big])
        theta = 0.2 * fi
        if fi == 3:  # detector miss on both cams
            pr0[fi] = _pred_frame([200, 300], [box9, far],
                                  [0.05 * fi, 1.0])
            pr1[fi] = _pred_frame([], [], [])
        else:
            pr0[fi] = _pred_frame([100, 200, 300], [box7, box9, far],
                                  [theta, 0.05 * fi, 1.0])
            pr1[fi] = _pred_frame([101], [box7_big], [theta])
    return {0: gt0, 1: gt1}, {0: pr0, 1: pr1}


def test_match_tracks(tracked_scene):
    gt_raw, pr_raw = tracked_scene
    gt = st.parse_phalp_tracks(gt_raw[0], F, with_smpl=False)
    pred = st.parse_phalp_tracks(pr_raw[0], F, with_smpl=True)
    m = st.match_tracks(pred, gt)
    assert m == {7: 100, 9: 200}


def test_interpolate_gaps_slerp_midpoint():
    valid = np.array([True, False, True])
    mats = np.stack([_rot_z(0.0), np.eye(3), _rot_z(1.0)])
    out = st.interpolate_gaps(valid, mats, rotations=True)
    np.testing.assert_allclose(out[1], _rot_z(0.5), atol=1e-6)
    # linear + edge clamp
    vals = np.array([np.nan, 2.0, np.nan, 4.0, np.nan])
    v = np.array([False, True, False, True, False])
    out = st.interpolate_gaps(v, vals)
    np.testing.assert_allclose(out, [2.0, 2.0, 3.0, 4.0, 4.0])


def test_merge_and_roundtrip(tracked_scene, tmp_path):
    gt_raw, pr_raw = tracked_scene
    scene = str(tmp_path)
    path = st.process_scene(scene, gt_raw, F, pred_raw_by_cam=pr_raw)
    assert os.path.exists(path)

    import pickle
    with open(path, "rb") as f:
        pkl = pickle.load(f)
    assert set(pkl.keys()) == {7, 9}
    rec7 = pkl[7]
    assert rec7["valid_mask"].all()
    # camera 1 sees the larger box -> wins the per-frame selection
    assert (rec7["selected_cam_idx"][:3] == 1).all()
    # the gap frame is slerp-filled between theta=0.4 and 0.8
    np.testing.assert_allclose(rec7["smpl"]["global_orient"][3, 0],
                               _rot_z(0.6), atol=1e-5)
    # GT 9 only on cam 0
    assert (pkl[9]["selected_cam_idx"][pkl[9]["valid_mask"]] == 0).all()
    np.testing.assert_allclose(pkl[9]["smpl"]["betas"][0], 0.2, atol=1e-12)

    # the data layer consumes the file (extrinsics absent -> orient kept
    # camera-local, still valid)
    from bilateral_driving_tpu.data.scene import load_smpl_poses
    poses = load_smpl_poses(scene, frames=list(range(F)),
                            inv_first=np.eye(4))
    assert set(poses.keys()) == {"7", "9"}
    assert poses["7"]["valid"].all()
    assert poses["7"]["quats"].shape == (F, 24, 4)
    n = np.linalg.norm(poses["7"]["quats"], axis=-1)
    np.testing.assert_allclose(n[poses["7"]["valid"]], 1.0, atol=1e-5)


def test_run_tracker_gated(tmp_path):
    with pytest.raises(FileNotFoundError, match="4D-Humans"):
        st.run_tracker(str(tmp_path), [0])


def test_pred2gt_prefilter(tracked_scene):
    """A GT track whose only IoU overlaps come from predictions that match a
    DIFFERENT GT better must be excluded (postprocess.py:185-227)."""
    gt_raw, pr_raw = tracked_scene
    # GT 11 half-overlaps pred 100's box, but pred 100's best match is GT 7
    for fi in range(F):
        gt_raw[0][fi]["extra_data"]["gt_track_id"].append(11)
        gt_raw[0][fi]["gt_bbox"].append(
            np.array([20.0, 10.0, 20.0, 40.0]))
    gt = {c: st.parse_phalp_tracks(gt_raw[c], F, False) for c in (0, 1)}
    pred = {c: st.parse_phalp_tracks(pr_raw[c], F, True) for c in (0, 1)}
    assert st.valid_gt_tids(pred, gt) == {7, 9}
    merged = st.merge_cameras(gt, pred, F)
    assert set(merged.keys()) == {7, 9}


def test_break_fill():
    """Interior all-camera visibility gaps become valid with interpolated
    poses (postprocess.py:527-559); a gap ending at the final frame stays
    unfilled (reference quirk)."""
    must = np.array([True, True, False, False, True, True])
    np.testing.assert_array_equal(
        st.detect_breaks_mask(must),
        [False, False, True, True, False, False])
    # gap terminated by the last frame -> NOT filled
    must_tail = np.array([True, False, True])
    np.testing.assert_array_equal(st.detect_breaks_mask(must_tail),
                                  [False, False, False])

    F2 = 6
    box = [10.0, 10.0, 20.0, 40.0]
    gt, pr = {}, {}
    for fi in range(F2):
        seen = fi not in (2, 3)  # two-frame interior break
        gt[fi] = _gt_frame([7] if seen else [], [box] if seen else [])
        pr[fi] = _pred_frame([100] if seen else [],
                             [box] if seen else [],
                             [0.2 * fi] if seen else [])
    gtp = {0: st.parse_phalp_tracks(gt, F2, False)}
    prp = {0: st.parse_phalp_tracks(pr, F2, True)}
    merged = st.merge_cameras(gtp, prp, F2)
    rec = merged[7]
    assert rec.valid_mask.all()
    # filled frames carry slerped orientations between theta=0.2 and 0.8
    np.testing.assert_allclose(rec.smpl["global_orient"][2, 0],
                               _rot_z(0.4), atol=1e-5)
    np.testing.assert_allclose(rec.smpl["global_orient"][3, 0],
                               _rot_z(0.6), atol=1e-5)
    assert (rec.selected_cam_idx[rec.valid_mask] == 0).all()


def test_process_scene_frame_count_mismatch(tracked_scene, tmp_path):
    """Tracker pkls shorter/longer than the video must be rejected, not
    silently mis-indexed (reference asserts len(pred)==len(gt))."""
    gt_raw, pr_raw = tracked_scene
    bad = {0: dict(list(pr_raw[0].items())[:-1]), 1: pr_raw[1]}
    with pytest.raises(ValueError, match="frames"):
        st.process_scene(str(tmp_path), gt_raw, F, pred_raw_by_cam=bad)


def test_hmr_wrapper_mocked_predictor(tracked_scene, tmp_path):
    """The 4D-Humans wrapper (preprocess/hmr_predictor.py, reference
    extract_smpl.py:196-287) drives process_scene end-to-end with an
    injected predictor, writes the reference's per-camera cache
    (cam_<id>.pkl), and serves re-runs from that cache."""
    gt_raw, pr_raw = tracked_scene
    scene = str(tmp_path)
    img_dir = os.path.join(scene, "images")
    os.makedirs(img_dir)
    for fi in range(F):
        for cam in (0, 1):
            open(os.path.join(img_dir, f"{fi:03d}_{cam}.jpg"), "wb").close()

    calls = []

    def mock_predictor(image_paths, cam_id):
        assert len(image_paths) == F
        calls.append(cam_id)
        return pr_raw[cam_id]

    path = st.process_scene(scene, gt_raw, F, predictor=mock_predictor)
    assert os.path.exists(path)
    assert sorted(calls) == [0, 1]
    from bilateral_driving_tpu.preprocess import hmr_predictor as hp
    assert os.path.exists(hp.cache_path(scene, 0))
    assert os.path.exists(hp.cache_path(scene, 1))

    # re-run without a predictor: served entirely from the cache (the
    # gated real stack is never touched), identical output
    os.remove(path)
    path2 = st.process_scene(scene, gt_raw, F)
    assert os.path.exists(path2)
    assert calls == [0, 1]   # predictor not called again

    # without images/ and without caches the wrapper stays loudly gated
    with pytest.raises(FileNotFoundError, match="4D-Humans|images"):
        st.run_tracker(str(tmp_path / "empty"), [0])
