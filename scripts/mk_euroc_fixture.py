"""Write a synthetic stereo orbit to /tmp/euroc_fix in EuRoC mav0 layout
(driver for end-to-end verification of the EuRoC stereo ingestion)."""
import os
import sys

import numpy as np
import cv2

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig

H, W = 120, 160
BASELINE = 0.1
N = 32
ROOT = "/tmp/euroc_fix/V9_synth"


def yaml_cam(T_BS, K, wh):
    rows = ", ".join(f"{v:.9f}" for v in T_BS.reshape(-1))
    return ("%YAML:1.0\nsensor_type: camera\nT_BS:\n  rows: 4\n  cols: 4\n"
            f"  data: [{rows}]\nrate_hz: 30\n"
            f"resolution: [{wh[0]}, {wh[1]}]\ncamera_model: pinhole\n"
            f"intrinsics: [{K[0]}, {K[1]}, {K[2]}, {K[3]}]\n"
            "distortion_model: radial-tangential\n"
            "distortion_coefficients: [0.0, 0.0, 0.0, 0.0]\n")


def rot_to_quat_wxyz(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    return (w, (R[2, 1] - R[1, 2]) / (4 * w),
            (R[0, 2] - R[2, 0]) / (4 * w), (R[1, 0] - R[0, 1]) / (4 * w))


def main():
    import os
    import shutil
    shutil.rmtree(ROOT, ignore_errors=True)
    mav = os.path.join(ROOT, "mav0")
    ds = SyntheticDataset(SyntheticConfig(
        n_frames=N, height=H, width=W, stereo=True, baseline=BASELINE,
        deg_per_frame=3.0))
    T_B_c0 = np.eye(4)
    T_B_c1 = np.eye(4)
    T_B_c1[0, 3] = BASELINE
    gt = ["#t,px,py,pz,qw,qx,qy,qz,v,v,v,bw,bw,bw,ba,ba,ba"]
    for cam, key, tbs in (("cam0", "images", T_B_c0),
                          ("cam1", "images_right", T_B_c1)):
        os.makedirs(os.path.join(mav, cam, "data"))
        csv = ["#timestamp [ns],filename"]
        for k in range(N):
            pkt = ds[k]
            t_ns = int(round(pkt["t_cams"] * 1e9))
            name = f"{t_ns}.png"
            cv2.imwrite(os.path.join(mav, cam, "data", name),
                        cv2.cvtColor(pkt[key], cv2.COLOR_RGB2BGR))
            csv.append(f"{t_ns},{name}")
            if cam == "cam0":
                c2w = pkt["poses"]
                qw, qx, qy, qz = rot_to_quat_wxyz(c2w[:3, :3])
                gt.append(f"{t_ns},{c2w[0,3]},{c2w[1,3]},{c2w[2,3]},"
                          f"{qw},{qx},{qy},{qz},0,0,0,0,0,0,0,0,0")
        with open(os.path.join(mav, cam, "data.csv"), "w") as f:
            f.write("\n".join(csv))
        with open(os.path.join(mav, cam, "sensor.yaml"), "w") as f:
            f.write(yaml_cam(tbs, ds.K, (W, H)))
    gdir = os.path.join(mav, "state_groundtruth_estimate0")
    os.makedirs(gdir)
    with open(os.path.join(gdir, "data.csv"), "w") as f:
        f.write("\n".join(gt))
    print("fixture at", ROOT)


if __name__ == "__main__":
    main()
