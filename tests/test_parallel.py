"""Multi-device sharding tests on the 8-virtual-CPU mesh."""
import jax
import numpy as np
import pytest

from nerf_slam_tpu.parallel import mapping, tracking


def test_have_virtual_devices():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("n", [2, 8])
def test_mapping_dp_dryrun(n):
    loss = mapping.dryrun(n)
    assert np.isfinite(loss)


@pytest.mark.parametrize("n", [2, 4])
def test_tracking_edge_sharded_dba(n):
    ratio = tracking.dryrun(n)
    # one GN step must reduce the pose error
    assert ratio < 0.7, ratio


def test_sharded_dba_matches_single_device():
    """Edge-sharded DBA must be numerically equivalent to the reference
    single-device path (same plan, same inputs)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from nerf_slam_tpu.geometry import camera, se3
    from nerf_slam_tpu.solver import dba

    n, h, w = 4, 6, 8
    key = jax.random.PRNGKey(0)
    poses_gt = se3.exp(0.05 * jax.random.normal(key, (n, 6)))
    disps = 0.8 * jnp.ones((n, h, w))
    intr = jnp.tile(jnp.array([[10.0, 10.0, w / 2, h / 2]]), (n, 1))
    ii = np.array([0, 1, 2, 1, 2, 3])
    jj = np.array([1, 2, 3, 0, 1, 2])
    E = 8
    plan = dba.plan(ii, jj, 0, n, E=E, P=n, K=n)
    target, valid, _ = camera.projective_transform(
        poses_gt, disps, intr, jnp.asarray(ii), jnp.asarray(jj))
    tpad = jnp.zeros((E, h, w, 2)).at[: len(ii)].set(target)
    wpad = jnp.zeros((E, h, w, 2)).at[: len(ii)].set(
        jnp.ones_like(target) * valid)
    poses0 = se3.retr(poses_gt, 0.01 * jax.random.normal(key, (n, 6))
                      .at[0].set(0.0))
    eta = 1e-4 * jnp.ones((n, h, w))
    sens = jnp.zeros((n, h, w))

    # single device oracle: one GN iteration
    res = dba.dba_iterations(poses0, disps, intr, tpad, wpad, eta, sens,
                             plan, iters=1, ep=0.1, lm=1e-4,
                             compute_covariances=False)

    mesh = Mesh(np.array(jax.devices()[:4]), ("edge",))
    step = tracking.make_sharded_dba_step(mesh)
    poses_s, disps_s = step(poses0, disps, intr, tpad, wpad, eta, sens,
                            plan)

    np.testing.assert_allclose(np.asarray(poses_s), np.asarray(res.poses),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(disps_s), np.asarray(res.disps),
                               atol=5e-4)


@pytest.mark.slow
def test_sharded_frontend_matches_single_device():
    """The PRODUCT path: RaftVisualFrontend with cfg.edge_shards > 1
    runs its fused GRU+DBA update shard_map'd over a device mesh and
    must track identically to the single-device frontend."""
    import jax.numpy as jnp
    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig

    H, W = 48, 64
    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
        jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
        jnp.array([0]), 1)
    kw = dict(buffer=10, e_active=24, e_inactive=16, p_window=10,
              k_depth=12, keyframe_warmup=4, max_factors=20,
              motion_filter_thresh=-1.0, keyframe_thresh=-1.0,
              iters1=1, iters2=1, gn_iters=1)
    ds = SyntheticDataset(SyntheticConfig(n_frames=8, height=H, width=W))

    def track(shards):
        fe = RaftVisualFrontend(
            params, FrontendConfig(edge_shards=shards, **kw), (H, W))
        for k, pkt in enumerate(ds):
            fe(k, pkt)
        n = fe.kf_idx
        return (np.asarray(fe.state.cam_T_world[:n]),
                np.asarray(fe.state.idepths[:n]),
                np.asarray(fe.state.pose_cov[:n]), n)

    poses1, disps1, cov1, n1 = track(1)
    poses4, disps4, cov4, n4 = track(4)
    assert n1 == n4
    # not bitwise: psum reduction order + bf16 GRU divergence compounds
    # over 8 frames of fused updates; 1e-3 still rules out any real
    # topology/assembly mismatch (wrong edges diverge at O(1))
    np.testing.assert_allclose(poses4, poses1, atol=1e-3)
    np.testing.assert_allclose(disps4, disps1, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(cov4, cov1, rtol=0.15, atol=1e-6)
