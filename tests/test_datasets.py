"""Dataset loader round-trips on synthetic data written to disk in each
format (we have no real datasets in this environment; the formats are
exercised end-to-end instead)."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
from nerf_slam_tpu.datasets.nerf_dataset import (NeRFDataset,
                                                 export_nerf_format)
from nerf_slam_tpu.datasets.replica_dataset import ReplicaDataset
from nerf_slam_tpu.datasets.tum_dataset import TumDataset
from nerf_slam_tpu.datasets.data_module import build_dataset
from nerf_slam_tpu.utils.conversions import (nerf_matrix_to_ngp,
                                             ngp_matrix_to_nerf,
                                             get_scale_and_offset)


@pytest.fixture(scope="module")
def synth():
    return SyntheticDataset(SyntheticConfig(n_frames=4, height=48,
                                            width=64))


def test_ngp_matrix_roundtrip():
    rng = np.random.RandomState(0)
    m = np.eye(4)
    m[:3, :3] = np.linalg.qr(rng.randn(3, 3))[0]
    m[:3, 3] = rng.randn(3)
    m2 = ngp_matrix_to_nerf(nerf_matrix_to_ngp(m, 2.0, 0.3), 2.0, 0.3)
    np.testing.assert_allclose(m2, m, atol=1e-12)


def test_scale_offset_unit_cube():
    aabb = [[-3.0, -1.0, 0.0], [1.0, 1.0, 2.0]]
    s, off = get_scale_and_offset(aabb)
    lo = np.array(aabb[0]) * s + off
    hi = np.array(aabb[1]) * s + off
    center = (lo + hi) / 2
    np.testing.assert_allclose(center, 0.5, atol=1e-9)
    assert (hi - lo).max() <= 1.0 + 1e-9


def test_nerf_format_roundtrip(tmp_path, synth):
    out = export_nerf_format(synth, str(tmp_path / "scene"))
    ds = NeRFDataset(out)
    assert len(ds) == 4
    p0 = ds[0]
    s0 = synth[0]
    np.testing.assert_allclose(p0["poses"], s0["poses"], atol=1e-5)
    # images round-trip exactly (png)
    np.testing.assert_array_equal(p0["images"], s0["images"])
    # depth quantized at 1 mm
    np.testing.assert_allclose(p0["depths"], s0["depths"], atol=2e-3)
    np.testing.assert_allclose(p0["intrinsics"], s0["intrinsics"],
                               atol=1e-4)
    assert ds[3]["is_last_frame"]


def test_replica_format(tmp_path, synth):
    d = tmp_path / "room0"
    (d / "results").mkdir(parents=True)
    traj = []
    for k in range(4):
        pkt = synth[k]
        cv2.imwrite(str(d / "results" / f"frame{k:06d}.jpg"),
                    cv2.cvtColor(pkt["images"], cv2.COLOR_RGB2BGR))
        d16 = (pkt["depths"] / 6553.5 * 65535 / 10).astype(np.uint16)
        cv2.imwrite(str(d / "results" / f"depth{k:06d}.png"), d16)
        # replica traj stores OpenGL c2w; our packets are OpenCV
        gl = pkt["poses"].copy()
        gl[:3, 1] *= -1
        gl[:3, 2] *= -1
        traj.append(gl.reshape(-1))
    np.savetxt(str(d / "traj.txt"), np.stack(traj))
    with open(d / "cam_params.json", "w") as f:
        json.dump({"camera": {
            "fx": float(synth.K[0]), "fy": float(synth.K[1]),
            "cx": float(synth.K[2]), "cy": float(synth.K[3]),
            "w": 64, "h": 48, "scale": 6553.5}}, f)

    ds = ReplicaDataset(str(d))
    assert len(ds) == 4
    p = ds[1]
    np.testing.assert_allclose(p["poses"], synth[1]["poses"], atol=1e-5)
    assert p["images"].shape == (48, 64, 3)
    assert p["depths"] is not None


def test_tum_format(tmp_path, synth):
    d = tmp_path / "rgbd_dataset_freiburg3_test"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for k in range(4):
        pkt = synth[k]
        t = 1000.0 + k * 0.1
        cv2.imwrite(str(d / "rgb" / f"{t:.6f}.png"),
                    cv2.cvtColor(pkt["images"], cv2.COLOR_RGB2BGR))
        d16 = (pkt["depths"] * 5000).astype(np.uint16)
        cv2.imwrite(str(d / "depth" / f"{t:.6f}.png"), d16)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        c2w = pkt["poses"]
        # quaternion from rotation (xyzw)
        from nerf_slam_tpu.geometry import se3
        import jax.numpy as jnp
        pose7 = np.asarray(se3.from_matrix(jnp.asarray(c2w)))
        gt_lines.append(
            f"{t:.6f} " + " ".join(f"{v:.8f}" for v in pose7))
    (d / "rgb.txt").write_text("\n".join(rgb_lines))
    (d / "depth.txt").write_text("\n".join(depth_lines))
    (d / "groundtruth.txt").write_text("\n".join(gt_lines))

    ds = TumDataset(str(d), target_hw=(48, 64))
    assert len(ds) == 4
    p = ds[2]
    assert p["images"].shape == (48, 64, 3)
    assert p["depths"] is not None
    # GT pose translation matches
    np.testing.assert_allclose(p["poses"][:3, 3],
                               synth[2]["poses"][:3, 3], atol=1e-5)


def test_build_dataset_factory(synth):
    ds = build_dataset("synthetic", n_frames=3, height=48, width=64)
    assert len(ds) == 3
    with pytest.raises(ValueError):
        build_dataset("bogus", "/tmp/x")
