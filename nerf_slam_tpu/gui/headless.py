"""Headless visualizer: consumes SLAM viz packets, writes artifacts.

Equivalent of /root/reference/gui/open3d_gui.py minus the interactive
window (TPU hosts are headless): per-packet it can export
  - uncertainty-masked colored point clouds (PLY)
  - camera trajectory with pose-covariance ellipsoids (JSON)
  - depth / sigma heatmap PNGs
The packet contract and the sigma-threshold masking semantics
(open3d_gui.py:361-657) are preserved so an interactive viewer can attach
to the same stream later.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from ..utils import viz
from ..utils.conversions import linear_to_srgb


def backproject_packet(packet: Dict[str, Any], sigma_thresh: float = 10.0,
                       stride: int = 2):
    """Viz packet -> (points (N,3), colors (N,3) u8) world-frame cloud,
    masking pixels whose depth sigma exceeds ``sigma_thresh`` (the GUI's
    A/S-key threshold behavior)."""
    import jax.numpy as jnp
    from ..geometry import se3

    nv = int(packet.get("viz_count",
                        np.asarray(packet["viz_idx"]).shape[0]))
    poses7 = jnp.asarray(np.asarray(packet["cam0_poses"])[:nv])
    c2w = np.asarray(se3.matrix(se3.inv(poses7)))
    idepths = np.asarray(packet["cam0_idepths_up"])[:nv]
    covs = np.asarray(packet["cam0_depths_cov_up"])[:nv]
    imgs = np.asarray(packet["cam0_images"])[:nv]
    intr = np.asarray(packet["cam0_intrinsics"])[:nv] * 8.0

    pts_all, col_all = [], []
    n, H, W = idepths.shape
    for i in range(n):
        fx, fy, cx, cy = intr[i]
        u, v = np.meshgrid(np.arange(0, W, stride),
                           np.arange(0, H, stride))
        idep = idepths[i][::stride, ::stride]
        sig = np.sqrt(np.maximum(covs[i][::stride, ::stride], 0))
        ok = (idep > 1e-3) & (sig < sigma_thresh)
        z = 1.0 / np.maximum(idep, 1e-6)
        x = (u + 0.5 - cx) / fx * z
        y = (v + 0.5 - cy) / fy * z
        pts = np.stack([x, y, z], -1)[ok]
        pts = pts @ c2w[i][:3, :3].T + c2w[i][:3, 3]
        cols = imgs[i][::stride, ::stride][ok]
        pts_all.append(pts)
        col_all.append(cols)
    if not pts_all:
        return np.zeros((0, 3)), np.zeros((0, 3), np.uint8)
    return np.concatenate(pts_all), np.concatenate(col_all)


def write_ply(path: str, points: np.ndarray, colors: np.ndarray):
    """Minimal binary-less PLY writer (no open3d dependency)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {points.shape[0]}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for p, c in zip(points, colors):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{int(c[0])} {int(c[1])} {int(c[2])}\n")


class HeadlessGui:
    """Drop-in GuiModule payload (reference gui/gui_module.py)."""

    def __init__(self, out_dir: str = "viz_out", sigma_thresh: float = 10.0,
                 export_every: int = 10, max_cloud_points: int = 500000,
                 end_commands=("mesh", "eval")):
        self.out_dir = out_dir
        self.sigma_thresh = sigma_thresh
        self.export_every = export_every
        self.max_cloud_points = max_cloud_points
        self.n_packets = 0
        self.trajectory = []
        # fusion command back-channel (the reference GUI's key bindings
        # M/N/A/S/T send commands back through an output queue,
        # open3d_gui.py:181-195, 369-383); headless equivalents are
        # queued programmatically and drained by the GuiModule
        self._commands = []
        self.end_commands = list(end_commands or ())
        os.makedirs(out_dir, exist_ok=True)

    # command back-channel (reference key bindings) ---------------------
    def request_mesh(self):                       # 'M'
        self._commands.append({"cmd": "mesh"})

    def request_eval(self):                       # 'N'
        self._commands.append({"cmd": "eval"})

    def adjust_sigma_thresh(self, value: float):  # 'A'/'S'
        self.sigma_thresh = float(value)
        self._commands.append({"cmd": "sigma_thresh",
                               "value": float(value)})

    def toggle_mask(self):                        # 'T'
        self._commands.append({"cmd": "toggle_mask"})

    def request_rebuild(self):                    # 'Z'
        """Replay the TSDF keyframe history at the current sigma
        threshold (reference open3d_gui.py:193)."""
        self._commands.append({"cmd": "rebuild",
                               "value": float(self.sigma_thresh)})

    def pop_commands(self):
        out, self._commands = self._commands, []
        return out

    def visualize(self, packet: Optional[Dict[str, Any]]):
        if packet is None or "cam0_poses" not in packet:
            return packet
        self.n_packets += 1

        # accumulate trajectory + covariance ellipsoids
        import jax.numpy as jnp
        from ..geometry import se3
        nv = int(packet.get("viz_count",
                            np.asarray(packet["viz_idx"]).shape[0]))
        poses7 = jnp.asarray(np.asarray(packet["cam0_poses"])[:nv])
        c2w = np.asarray(se3.matrix(se3.inv(poses7)))
        covs = np.asarray(packet["world_T_body_cov"])[:nv]
        for i, idx in enumerate(np.asarray(packet["viz_idx"])[:nv]):
            radii, axes = viz.pose_cov_ellipsoid(covs[i])
            self.trajectory.append({
                "kf": int(idx),
                "c2w": c2w[i].tolist(),
                "cov_radii": radii.tolist(),
                "cov_axes": axes.tolist(),
            })

        if self.n_packets % self.export_every == 0 or \
                packet.get("is_last_frame"):
            self.export(packet)
        if packet.get("is_last_frame"):
            for cmd in self.end_commands:
                self._commands.append({"cmd": cmd})
        return packet

    def export(self, packet):
        import cv2
        tag = f"{self.n_packets:05d}"
        pts, cols = backproject_packet(packet, self.sigma_thresh)
        if pts.shape[0] > self.max_cloud_points:
            sel = np.random.RandomState(0).choice(
                pts.shape[0], self.max_cloud_points, replace=False)
            pts, cols = pts[sel], cols[sel]
        if pts.shape[0]:
            write_ply(os.path.join(self.out_dir, f"cloud_{tag}.ply"),
                      pts, cols)
        with open(os.path.join(self.out_dir, "trajectory.json"),
                  "w") as f:
            json.dump(self.trajectory, f)

        # depth + sigma heatmaps of the most recent keyframe
        nv = int(packet.get("viz_count",
                            np.asarray(packet["viz_idx"]).shape[0]))
        idep = np.asarray(packet["cam0_idepths_up"])[nv - 1]
        cov = np.asarray(packet["cam0_depths_cov_up"])[nv - 1]
        with np.errstate(divide="ignore"):
            depth = np.where(idep > 1e-3, 1.0 / idep, 0.0)
        cv2.imwrite(os.path.join(self.out_dir, f"depth_{tag}.png"),
                    cv2.cvtColor(viz.depth_to_rgb(depth),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(self.out_dir, f"sigma_{tag}.png"),
                    cv2.cvtColor(viz.sigma_to_rgb(cov),
                                 cv2.COLOR_RGB2BGR))
