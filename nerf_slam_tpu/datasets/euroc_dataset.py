"""EuRoC MAV dataset loader (mono path + IMU).

Equivalent of /root/reference/datasets/euroc_dataset.py: YAML sensor
calibration (cam0/imu0/ground-truth), CSV parsing, radial-tangential
undistortion + resize for the mono pipeline, nearest-timestamp GT lookup.
Stereo rectification lands with the stereo component batch.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .base import (CameraCalibration, Dataset, ImuCalibration,
                   PinholeCameraModel, RadTanDistortionModel, Resolution)


def _load_yaml(path: str) -> dict:
    import yaml
    with open(path) as f:
        txt = f.read()
    # euroc files start with a %YAML directive pyyaml rejects
    lines = [ln for ln in txt.splitlines() if not ln.startswith("%YAML")]
    return yaml.safe_load("\n".join(lines))


def _quat_wxyz_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class EurocDataset(Dataset):
    def __init__(self, dataset_dir: str, initial_k: int = 0,
                 final_k: int = -1, img_stride: int = 1,
                 buffer: int = 512, target_hw=(384, 512)):
        super().__init__("euroc", dataset_dir, initial_k, final_k,
                         img_stride, buffer=buffer)
        self.target_hw = target_hw
        self._parse()

    def _mav(self, *parts) -> str:
        d = self.dataset_dir
        if os.path.isdir(os.path.join(d, "mav0")):
            return os.path.join(d, "mav0", *parts)
        return os.path.join(d, *parts)

    def _parse(self):
        cam = _load_yaml(self._mav("cam0", "sensor.yaml"))
        fx, fy, cx, cy = cam["intrinsics"]
        k1, k2, p1, p2 = cam["distortion_coefficients"]
        W, H = cam["resolution"]
        body_T_cam = np.array(cam["T_BS"]["data"]).reshape(4, 4)

        h1 = self.target_hw[0] - self.target_hw[0] % 8
        w1 = self.target_hw[1] - self.target_hw[1] % 8
        self.out_hw = (h1, w1)
        sx, sy = w1 / W, h1 / H
        self.K_orig = PinholeCameraModel(fx, fy, cx, cy)
        self.dist = RadTanDistortionModel(k1, k2, p1, p2)
        self.calib = CameraCalibration(
            camera_model=self.K_orig.scale_intrinsics(sx, sy),
            distortion_model=RadTanDistortionModel(),  # undistorted output
            resolution=Resolution(w1, h1), body_T_cam=body_T_cam,
            rate_hz=float(cam.get("rate_hz", 20.0)))

        # image list
        csv = np.genfromtxt(self._mav("cam0", "data.csv"), delimiter=",",
                            dtype=str, skip_header=1)
        final = self.final_k if self.final_k > 0 else csv.shape[0]
        csv = csv[self.initial_k:final:self.img_stride]
        self.timestamps = csv[:, 0].astype(np.int64)
        self.image_files = [self._mav("cam0", "data", name.strip())
                            for name in csv[:, 1]]

        # IMU
        self.imu = None
        imu_yaml = self._mav("imu0", "sensor.yaml")
        if os.path.exists(imu_yaml):
            iy = _load_yaml(imu_yaml)
            self.imu = ImuCalibration(
                body_T_imu=np.array(iy["T_BS"]["data"]).reshape(4, 4),
                a_n=float(iy.get("accelerometer_noise_density", 2e-3)),
                a_b=float(iy.get("accelerometer_random_walk", 3e-3)),
                g_n=float(iy.get("gyroscope_noise_density", 1.7e-4)),
                g_b=float(iy.get("gyroscope_random_walk", 2e-5)),
                rate_hz=float(iy.get("rate_hz", 200.0)))
            imu_csv = self._mav("imu0", "data.csv")
            if os.path.exists(imu_csv):
                self.imu_data = np.genfromtxt(imu_csv, delimiter=",",
                                              skip_header=1)
            else:
                self.imu_data = None

        # ground truth
        self.gt = None
        gt_csv = self._mav("state_groundtruth_estimate0", "data.csv")
        if os.path.exists(gt_csv):
            self.gt = np.genfromtxt(gt_csv, delimiter=",", skip_header=1)

        self._maps = None

    def _undistort_maps(self):
        if self._maps is None:
            import cv2
            h1, w1 = self.out_hw
            K = self.K_orig.matrix()
            Knew = self.calib.camera_model.matrix()
            self._maps = cv2.initUndistortRectifyMap(
                K, self.dist.numpy(), None, Knew, (w1, h1), cv2.CV_32FC1)
        return self._maps

    def _gt_pose(self, t_ns: int) -> Optional[np.ndarray]:
        if self.gt is None:
            return None
        i = int(np.argmin(np.abs(self.gt[:, 0] - t_ns)))
        row = self.gt[i]
        world_T_body = np.eye(4)
        world_T_body[:3, 3] = row[1:4]
        world_T_body[:3, :3] = _quat_wxyz_to_mat(row[4:8])
        return world_T_body @ self.calib.body_T_cam

    def imu_between(self, t0_ns: int, t1_ns: int) -> Optional[np.ndarray]:
        """IMU rows (t, wx, wy, wz, ax, ay, az) in (t0, t1]."""
        if getattr(self, "imu_data", None) is None:
            return None
        m = (self.imu_data[:, 0] > t0_ns) & (self.imu_data[:, 0] <= t1_ns)
        return self.imu_data[m]

    def __len__(self):
        return len(self.image_files)

    def __getitem__(self, k: int) -> Dict:
        import cv2
        img = cv2.imread(self.image_files[k], cv2.IMREAD_GRAYSCALE)
        m1, m2 = self._undistort_maps()
        img = cv2.remap(img, m1, m2, cv2.INTER_LINEAR)
        img = np.repeat(img[..., None], 3, axis=-1)
        t_ns = int(self.timestamps[k])
        pose = self._gt_pose(t_ns)
        pkt = {
            "k": k,
            "t_cams": t_ns * 1e-9,
            "poses": None if pose is None else pose.astype(np.float32),
            "images": np.ascontiguousarray(img, np.uint8),
            "depths": None,
            "intrinsics": self.calib.camera_model.numpy(),
            "calib": self.calib,
            "is_last_frame": k == len(self) - 1,
        }
        if k > 0:
            # inertial window (t_{k-1}, t_k] for the VIO frontend
            # (reference euroc_dataset.py packet's imu_t0_t1)
            pkt["imu_t0_t1"] = self.imu_between(
                int(self.timestamps[k - 1]), t_ns)
        return pkt
