"""Stereo: rig-pinned (i, i) edges through DBA and the frontend.

Reference: stereo edges enter the graph as self-pairs whose correlation
targets the right camera and whose relative pose is pinned to the rig
calibration; in the DBA they constrain depth/scale only
(visual_frontend.py:206, 741, 839-841; droid_kernels.cu:248-258, 367).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
from nerf_slam_tpu.geometry import camera, se3
from nerf_slam_tpu.models import DroidNet
from nerf_slam_tpu.solver import dba
from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig

STEREO_REL = jnp.asarray([-0.1, 0, 0, 0, 0, 0, 1.0], jnp.float32)


@pytest.mark.slow
def test_stereo_dba_recovers_metric_scale():
    """Monocular DBA has a free global scale; stereo (i, i) edges pin it
    to the rig baseline.  Start from a consistently mis-scaled state
    (x2 translations, /2 inverse depths -- a gauge move mono edges
    cannot see) and check the stereo-constrained DBA restores metric
    scale."""
    key = jax.random.PRNGKey(0)
    n, h, w = 5, 12, 16
    ks = jax.random.split(key, 3)
    xi = 0.08 * jax.random.normal(ks[0], (n, 6), dtype=jnp.float32)
    xi = xi.at[0].set(0.0)
    # make translations substantial so mono edges carry parallax
    xi = xi.at[:, :3].mul(3.0)
    poses_gt = se3.exp(xi)
    disps_gt = 0.6 + 0.4 * jax.random.uniform(ks[1], (n, h, w),
                                              dtype=jnp.float32)
    intr = jnp.tile(jnp.array([[25.0, 25.0, w / 2, h / 2]],
                              dtype=jnp.float32), (n, 1))

    ii, jj = [], []
    for a in range(n):
        ii.append(a)            # stereo self-edge
        jj.append(a)
        for b in range(n):
            if a != b and abs(a - b) <= 2:
                ii.append(a)
                jj.append(b)
    ii = np.array(ii)
    jj = np.array(jj)

    target, valid, _ = camera.projective_transform(
        poses_gt, disps_gt, intr, jnp.asarray(ii), jnp.asarray(jj),
        stereo_rel=STEREO_REL)
    weight = jnp.ones_like(target) * valid

    E = 32
    p = dba.plan(ii, jj, kf0=0, kf1=n, E=E, P=n, K=n)
    tpad = jnp.zeros((E, h, w, 2)).at[:ii.shape[0]].set(target)
    wpad = jnp.zeros((E, h, w, 2)).at[:ii.shape[0]].set(weight)

    s = 2.0     # gauge move: world scaled by s
    poses0 = poses_gt.at[:, :3].mul(s).astype(jnp.float32)
    disps0 = (disps_gt / s).astype(jnp.float32)

    eta = 1e-4 * jnp.ones((n, h, w), jnp.float32)
    sens = jnp.zeros((n, h, w), jnp.float32)
    run = jax.jit(lambda po, di: dba.dba_iterations(
        po, di, intr, tpad, wpad, eta, sens, p, iters=12,
        ep=0.01, lm=1e-4, compute_covariances=False,
        stereo_rel=STEREO_REL))

    res = run(poses0, disps0)
    scale0 = float(jnp.mean(disps0 / disps_gt))          # 0.5
    scale1 = float(jnp.mean(res.disps / disps_gt))
    assert abs(scale1 - 1.0) < 0.1, (scale0, scale1)
    # and the mono-consistency residual is still tiny
    assert float(res.flow_rms) < 0.1, float(res.flow_rms)


@pytest.mark.slow
def test_stereo_dba_ignored_without_rig():
    """Without stereo_rel, (i, i) edges see an identity relative pose:
    plan construction still works and mono behavior is unchanged for
    the off-diagonal edges."""
    key = jax.random.PRNGKey(1)
    n, h, w = 4, 10, 14
    poses_gt = se3.exp(0.05 * jax.random.normal(key, (n, 6)))
    poses_gt = poses_gt.at[0].set(jnp.array([0, 0, 0, 0, 0, 0, 1.0]))
    disps = 0.8 * jnp.ones((n, h, w), jnp.float32)
    intr = jnp.tile(jnp.array([[20.0, 20.0, w / 2, h / 2]]), (n, 1))
    ii = np.array([0, 1, 1, 2])
    jj = np.array([1, 0, 2, 1])
    target, valid, _ = camera.projective_transform(
        poses_gt, disps, intr, jnp.asarray(ii), jnp.asarray(jj))
    E = 8
    p = dba.plan(ii, jj, kf0=0, kf1=n, E=E, P=n, K=n)
    tpad = jnp.zeros((E, h, w, 2)).at[:4].set(target)
    wpad = jnp.zeros((E, h, w, 2)).at[:4].set(jnp.ones_like(target) * valid)
    res = dba.dba_iterations(
        poses_gt, disps, intr, tpad, wpad,
        1e-4 * jnp.ones((n, h, w)), jnp.zeros((n, h, w)), p, iters=1,
        ep=0.01, lm=1e-4, compute_covariances=False)
    assert float(res.flow_rms) < 1e-3


@pytest.mark.slow
def test_stereo_frontend_machinery():
    """Frontend in stereo mode: right-camera features stored, (i, i)
    edges live in the graph, outputs finite."""
    H, W = 48, 64
    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
        jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
        jnp.array([0]), 1)
    cfg = FrontendConfig(
        buffer=10, e_active=24, e_inactive=16, p_window=10, k_depth=12,
        keyframe_warmup=4, max_factors=20, motion_filter_thresh=-1.0,
        keyframe_thresh=-1.0, iters1=1, iters2=1, gn_iters=1,
        stereo=True, stereo_rel=(-0.1, 0, 0, 0, 0, 0, 1.0))
    fe = RaftVisualFrontend(params, cfg, (H, W))
    ds = SyntheticDataset(SyntheticConfig(
        n_frames=8, height=H, width=W, stereo=True, baseline=0.1))
    packets = []
    for k, pkt in enumerate(ds):
        assert "images_right" in pkt
        out = fe(k, pkt)
        if out is not None:
            packets.append(out)

    assert fe.is_initialized
    g = fe.graph
    stereo_edges = int(((g.ii == g.jj).sum()))
    assert stereo_edges > 0, "no stereo self-edges in the graph"
    # right-camera features actually stored (non-zero buffer)
    assert float(jnp.abs(fe.state.features1).sum()) > 0
    final = packets[-1]
    assert np.isfinite(np.asarray(final["cam0_poses"])).all()
    assert np.isfinite(np.asarray(final["cam0_idepths"])).all()
