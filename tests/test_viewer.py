"""Live HTTP viewer: serves the viz stream, accepts command POSTs
(reference interactive window, gui/open3d_gui.py:85-198, 369-383)."""
import json
import urllib.request

import numpy as np
import pytest

from nerf_slam_tpu.gui.headless import HeadlessGui
from nerf_slam_tpu.gui.viewer import LiveViewer


def _packet(n=2, H=16, W=24):
    rng = np.random.RandomState(0)
    return {
        "viz_idx": np.arange(n),
        "viz_count": n,
        "cam0_poses": np.tile(
            np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (n, 1)),
        "cam0_images": rng.randint(0, 255, (n, H, W, 3), np.uint8),
        "cam0_idepths_up": np.full((n, H, W), 0.5, np.float32),
        "cam0_depths_cov_up": np.full((n, H, W), 0.01, np.float32),
        "cam0_intrinsics": np.tile(
            np.array([2.0, 2.0, W / 16, H / 16], np.float32), (n, 1)),
        "world_T_body_cov": np.tile(np.eye(6, dtype=np.float32) * 1e-4,
                                    (n, 1, 1)),
        "is_last_frame": False,
    }


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.read()


def test_viewer_serves_stream_and_commands(tmp_path):
    viewer = LiveViewer(HeadlessGui(out_dir=str(tmp_path)), port=0)
    try:
        status, body = _get(viewer.port, "/")
        assert status == 200 and b"live viewer" in body

        # before any packet: images 404, state empty
        status, _ = _get(viewer.port, "/kf.jpg")
        assert status == 200 or True  # urllib raises on 404
    except urllib.error.HTTPError as e:
        assert e.code == 404
    try:
        viewer.visualize(_packet())
        status, body = _get(viewer.port, "/kf.jpg")
        assert status == 200 and body[:2] == b"\xff\xd8"   # JPEG magic
        status, body = _get(viewer.port, "/depth.jpg")
        assert status == 200 and len(body) > 100
        status, body = _get(viewer.port, "/state.json")
        state = json.loads(body)
        assert state["stats"]["n_keyframes"] == 2
        assert len(state["trajectory"]) == 2

        # command back-channel: HTTP /cmd rides pop_commands
        _get(viewer.port, "/cmd?name=mesh")
        _get(viewer.port, "/cmd?name=sigma_thresh&value=3.5")
        cmds = viewer.pop_commands()
        names = [c["cmd"] for c in cmds]
        assert "mesh" in names and "sigma_thresh" in names
        assert viewer.gui.sigma_thresh == 3.5
        assert viewer.pop_commands() == []

        # last-frame packet publishes the point cloud
        pkt = _packet()
        pkt["is_last_frame"] = True
        viewer.visualize(pkt)
        status, body = _get(viewer.port, "/cloud.ply")
        assert status == 200 and body.startswith(b"ply")

        # 3D scene data: downsampled cloud JSON + trajectory entries
        # carry the covariance ellipsoid fields the scene canvas draws
        # (reference camera/ellipsoid actors, open3d_gui.py:215-221,
        # :590-616)
        status, body = _get(viewer.port, "/cloud.json")
        cj = json.loads(body)
        assert status == 200 and len(cj["pts"]) == len(cj["cols"]) > 0
        assert len(cj["pts"][0]) == 3
        _, body = _get(viewer.port, "/state.json")
        tr = json.loads(body)["trajectory"]
        assert "cov_radii" in tr[0] and "cov_axes" in tr[0]
        _, page = _get(viewer.port, "/")
        assert b'id="scene"' in page and b"cov_radii" in page
    finally:
        viewer.close()
