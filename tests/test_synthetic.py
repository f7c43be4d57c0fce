import numpy as np

from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig


def test_synthetic_dataset_contract():
    ds = SyntheticDataset(SyntheticConfig(n_frames=4, height=48, width=64))
    assert len(ds) == 4
    pkt = ds[0]
    assert pkt["images"].shape == (48, 64, 3)
    assert pkt["images"].dtype == np.uint8
    assert pkt["depths"].shape == (48, 64)
    assert pkt["poses"].shape == (4, 4)
    assert not pkt["is_last_frame"]
    assert ds[3]["is_last_frame"]
    # depths positive and bounded by the room size
    assert (pkt["depths"] > 0.05).all()
    assert (pkt["depths"] < 10.0).all()


def test_synthetic_depth_consistency():
    """Reproject frame-0 pixels into frame 1 via GT depth/pose; colors
    should roughly match (validates pose/depth conventions end-to-end)."""
    ds = SyntheticDataset(SyntheticConfig(n_frames=8, height=64, width=80))
    p0 = ds[0]
    p1 = ds[1]
    fx, fy, cx, cy = ds.K
    h, w = p0["depths"].shape
    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    z = p0["depths"]
    pts_cam = np.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], -1)
    c2w0 = p0["poses"]
    pts_w = pts_cam @ c2w0[:3, :3].T + c2w0[:3, 3]
    w2c1 = np.linalg.inv(p1["poses"])
    pts1 = pts_w @ w2c1[:3, :3].T + w2c1[:3, 3]
    z1 = pts1[..., 2]
    u1 = fx * pts1[..., 0] / z1 + cx - 0.5
    v1 = fy * pts1[..., 1] / z1 + cy - 0.5
    ok = (z1 > 0.1) & (u1 >= 0) & (u1 < w - 1) & (v1 >= 0) & (v1 < h - 1)
    ui = np.clip(np.round(u1).astype(int), 0, w - 1)
    vi = np.clip(np.round(v1).astype(int), 0, h - 1)
    c0 = p0["images"].astype(np.float32) / 255
    c1 = p1["images"].astype(np.float32)[vi, ui] / 255
    err = np.abs(c0 - c1)[ok]
    # most reprojected pixels should see (nearly) the same surface color
    assert np.median(err) < 0.06, np.median(err)

    # reprojected depth should match frame 1's rendered depth closely
    d1 = p1["depths"][vi, ui]
    derr = np.abs(d1 - z1)[ok] / z1[ok]
    assert np.median(derr) < 0.02, np.median(derr)
