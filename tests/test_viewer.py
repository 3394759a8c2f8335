"""Host-side HTTP viewer shim (tools/viewer.py; reference base.py:755-827)."""
import urllib.request

import numpy as np

from bilateral_driving_tpu.tools import viewer


def test_look_at_opencv_convention():
    c2w = viewer._look_at([0, -5, 0], [0, 0, 0])
    # forward (+z of camera) points from eye to target: +y world
    np.testing.assert_allclose(c2w[:3, 2], [0, 1, 0], atol=1e-9)
    np.testing.assert_allclose(c2w[:3, 3], [0, -5, 0], atol=1e-9)
    # rotation is orthonormal, right-handed with y pointing down-ish
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert c2w[2, 1] < 0  # camera y (down) maps against world +z


def test_viewer_serves_page_and_frames():
    calls = {}

    def render(c2w, t):
        calls["c2w"] = c2w
        calls["t"] = t
        return np.full((24, 32, 3), 0.5, np.float32)

    v = viewer.Viewer(render, port=0).start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/", timeout=10).read()
        assert b"orbit" in page
        frame = urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/frame?eye=0,-5,0&look=0,0,0&t=0.25",
            timeout=10).read()
        assert frame[:2] == b"\xff\xd8"          # JPEG magic
        assert calls["t"] == 0.25
        np.testing.assert_allclose(calls["c2w"][:3, 3], [0, -5, 0],
                                   atol=1e-9)
    finally:
        v.stop()


def test_viewer_stats_and_pause():
    """nerfview-'training'-mode parity (VERDICT r3 missing #5): the HUD
    stats endpoint reflects update_stats, and the pause toggle blocks
    wait_if_paused until resumed."""
    import json
    import threading
    import time

    v = viewer.Viewer(lambda c2w, t: np.zeros((8, 8, 3)), port=0).start()
    try:
        v.update_stats(step=42, steps_per_s=3.5, num_points=1234,
                       loss=0.125)
        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/stats", timeout=10).read())
        assert stats["step"] == 42 and stats["num_points"] == 1234
        assert abs(stats["steps_per_s"] - 3.5) < 1e-9
        assert stats["paused"] is False

        # pause via the endpoint; a training thread blocks in
        # wait_if_paused until the second toggle resumes it
        req = urllib.request.Request(
            f"http://127.0.0.1:{v.port}/pause", method="POST")
        assert json.loads(urllib.request.urlopen(
            req, timeout=10).read())["paused"] is True
        released = threading.Event()

        def trainer_thread():
            v.wait_if_paused(poll_s=0.02)
            released.set()

        threading.Thread(target=trainer_thread, daemon=True).start()
        time.sleep(0.15)
        assert not released.is_set()          # still paused -> blocked
        assert json.loads(urllib.request.urlopen(
            req, timeout=10).read())["paused"] is False
        assert released.wait(timeout=5)       # resumed -> unblocked
    finally:
        v.stop()
