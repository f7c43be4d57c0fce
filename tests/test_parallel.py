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
