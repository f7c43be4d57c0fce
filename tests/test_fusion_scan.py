"""Online-eval + extrinsics-schedule integration through the scan-fused
``fit_volume`` (reference fusion/nerf_fusion.py:304-306 eval cadence and
:99 extrinsics refinement): crossing ``eval_every`` boundaries must append
results rows with climbing PSNR, and the coordinate-descent pose schedule
must move every view delta except the pinned gauge view 0.

Promoted from the round-2 root driver `_verify_scan.py` (VERDICT r2
weak #9) with CPU-sized shapes and schedule.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig
from nerf_slam_tpu.fusion.ngp import NGPConfig

H, W = 80, 96


def _fit_fusion(n_views=6, iters=100):
    ds = SyntheticDataset(SyntheticConfig(n_frames=n_views, height=H,
                                          width=W))
    cfg = NerfFusionConfig(
        buffer=n_views, height=H, width=W, batch_rays=1024,
        ngp=NGPConfig(n_uniform=32, n_depth=8),
        iters_per_spin=20, eval_every=20, eval_views=3,
        optimize_extrinsics=True, extrinsics_start=30,
        extrinsics_period=20, extrinsics_pose_iters=5)
    fus = NerfFusion(cfg, seed=0)
    c2w, imgs, depths, covs, intr = [], [], [], [], []
    for k in range(n_views):
        p = ds[k]
        c2w.append(np.asarray(p["poses"]))
        img = np.asarray(p["images"])
        imgs.append((img * 255).astype(np.uint8) if img.max() <= 1.0
                    else img.astype(np.uint8))
        depths.append(np.asarray(p["depths"], np.float32))
        covs.append(0.001 * np.ones((H, W), np.float32))
        intr.append(np.asarray(p["intrinsics"], np.float32))
    fus.update_training_images(
        np.arange(n_views), jnp.asarray(np.stack(c2w)), np.stack(imgs),
        jnp.asarray(np.stack(depths)), jnp.asarray(np.stack(covs)),
        jnp.asarray(np.stack(intr)),
        gt_depths=jnp.asarray(np.stack(depths)))
    loss = None
    for _ in range(iters // cfg.iters_per_spin):
        loss = fus.fit_volume()
    return fus, loss


@pytest.mark.slow
def test_eval_rows_and_extrinsics_schedule():
    fus, loss = _fit_fusion(iters=100)

    rows = fus.results
    # 100 iters, eval_every=20 -> rows at 20,40,60,80,100
    assert len(rows) == 5, rows
    psnrs = [r["psnr"] for r in rows]
    assert psnrs[-1] > psnrs[0] + 1.0, psnrs
    assert np.isfinite(float(loss))
    for r in rows:
        assert np.isfinite(r["psnr"]) and np.isfinite(r["depth_l1_cm"])

    # extrinsics: pose-only phases ran (start=30, period=20 -> iters
    # 45-50, 65-70, 85-90); view 0 anchors the gauge and must stay pinned
    d = np.asarray(fus.pose_deltas)
    assert np.abs(d[0]).max() == 0.0
    assert np.abs(d[1:]).max() > 0.0
