"""Trajectory and reconstruction evaluation.

ATE-RMSE with Umeyama (Sim3 or SE3) alignment -- the metric the reference
relies on externally (its in-repo eval is PSNR/L1 only; SURVEY.md 4).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = True
                      ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity transform aligning src -> dst.

    src, dst: (N, 3).  Returns (R, t, s) with dst ~ s * R @ src + t.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / src.shape[0]
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def ate_rmse(est_positions: np.ndarray, gt_positions: np.ndarray,
             align_scale: bool = True) -> float:
    """Absolute trajectory error (RMSE, metres) after Sim3 alignment --
    monocular SLAM is scale-ambiguous so scale alignment is standard."""
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    assert est.shape == gt.shape and est.shape[1] == 3
    R, t, s = umeyama_alignment(est, gt, with_scale=align_scale)
    aligned = (s * (R @ est.T)).T + t
    err = aligned - gt
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def trajectory_from_packet(packet) -> Tuple[np.ndarray, np.ndarray]:
    """(est_positions, gt_positions) from a frontend viz packet."""
    from ..geometry import se3
    import jax.numpy as jnp
    n = int(packet.get("viz_count",
                       np.asarray(packet["cam0_poses"]).shape[0]))
    poses7 = jnp.asarray(np.asarray(packet["cam0_poses"])[:n])
    c2w = np.asarray(se3.matrix(se3.inv(poses7)))
    est = c2w[:, :3, 3]
    gt = np.asarray(packet["gt_poses"])[:n, :3, 3]
    return est, gt
