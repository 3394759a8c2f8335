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
