import json
import os

import numpy as np

from nerf_slam_tpu.utils import viz
from nerf_slam_tpu.gui import HeadlessGui, backproject_packet, write_ply


def test_flow_colorization():
    flow = np.zeros((8, 8, 2))
    flow[:4, :, 0] = 5.0
    img = viz.flow_to_rgb(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # moving vs static areas differ
    assert not np.array_equal(img[0, 0], img[7, 7])


def test_colormaps():
    d = np.linspace(0, 5, 64).reshape(8, 8)
    rgb = viz.depth_to_rgb(d)
    assert rgb.shape == (8, 8, 3)
    s = viz.sigma_to_rgb(d ** 2)
    assert s.shape == (8, 8, 3)


def test_pose_cov_ellipsoid():
    cov = np.diag([0.1, 0.1, 0.1, 0.04, 0.01, 0.0025])
    radii, axes = viz.pose_cov_ellipsoid(cov, nstd=1.0)
    np.testing.assert_allclose(sorted(radii), [0.05, 0.1, 0.2], atol=1e-9)


def make_packet(n=2, H=32, W=40):
    return {
        "viz_idx": np.arange(n),
        "cam0_poses": np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0],
                                       np.float32), (n, 1)),
        "world_T_body_cov": np.tile(0.01 * np.eye(6, dtype=np.float32),
                                    (n, 1, 1)),
        "cam0_images": np.random.randint(0, 255, (n, H, W, 3), np.uint8),
        "cam0_idepths_up": np.full((n, H, W), 0.5, np.float32),
        "cam0_depths_cov_up": np.full((n, H, W), 0.01, np.float32),
        "cam0_intrinsics": np.tile(
            np.array([4.0, 4.0, 2.5, 2.0], np.float32), (n, 1)),
        "is_last_frame": True,
    }


def test_backproject_masks_uncertain(tmp_path):
    pkt = make_packet()
    pts, cols = backproject_packet(pkt, sigma_thresh=10.0)
    assert pts.shape[0] > 0
    # all depths are 2.0 in camera frame
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-4)
    pkt["cam0_depths_cov_up"][...] = 1e6
    pts2, _ = backproject_packet(pkt, sigma_thresh=10.0)
    assert pts2.shape[0] == 0


def test_headless_gui_exports(tmp_path):
    gui = HeadlessGui(out_dir=str(tmp_path / "viz"), export_every=1)
    pkt = make_packet()
    gui.visualize(pkt)
    files = os.listdir(tmp_path / "viz")
    assert any(f.endswith(".ply") for f in files)
    assert "trajectory.json" in files
    traj = json.load(open(tmp_path / "viz" / "trajectory.json"))
    assert len(traj) == 2
    assert "cov_radii" in traj[0]
    assert any(f.startswith("depth_") for f in files)
