"""Production DBA: convergence, masking, covariance sanity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_slam_tpu.geometry import camera, se3
from nerf_slam_tpu.solver import dba


def make_problem(key, n=6, h=10, w=14):
    ks = jax.random.split(key, 3)
    xi = 0.06 * jax.random.normal(ks[0], (n, 6), dtype=jnp.float32)
    xi = xi.at[0].set(0.0)
    poses_gt = se3.exp(xi)
    disps_gt = 0.6 + 0.4 * jax.random.uniform(ks[1], (n, h, w),
                                              dtype=jnp.float32)
    intr = jnp.tile(
        jnp.array([[30.0, 30.0, w / 2, h / 2]], dtype=jnp.float32), (n, 1))
    ii, jj = [], []
    for a in range(n):
        for b in range(n):
            if a != b and abs(a - b) <= 2:
                ii.append(a)
                jj.append(b)
    ii = np.array(ii)
    jj = np.array(jj)
    target, valid, _ = camera.projective_transform(
        poses_gt, disps_gt, intr, jnp.asarray(ii), jnp.asarray(jj))
    weight = jnp.ones_like(target) * valid
    return poses_gt, disps_gt, intr, ii, jj, target, weight


def test_plan_indices():
    ii = np.array([0, 1, 2, 3])
    jj = np.array([1, 2, 3, 0])
    p = dba.plan(ii, jj, kf0=1, kf1=4, E=8, P=4, K=6)
    # depth slots: unique(arange(1,4) U ii) = {0,1,2,3}
    np.testing.assert_array_equal(np.asarray(p.kx)[:4], [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(p.k_valid),
                                  [1, 1, 1, 1, 0, 0])
    # pose slots px = [1,2,3,4]; slot for kf 4 invalid
    np.testing.assert_array_equal(np.asarray(p.px), [1, 2, 3, 4])
    np.testing.assert_array_equal(np.asarray(p.p_valid), [1, 1, 1, 0])
    # edge 0: ii=0 out of window -> pi=-1; kk=0
    assert int(p.pi[0]) == -1 and int(p.kk[0]) == 0
    # edge 3: jj=0 out of window -> pj=-1
    assert int(p.pj[3]) == -1
    # no gauge fixing since kf0 != 0
    assert float(p.p_fixed.sum()) == 0.0


@pytest.mark.slow
def test_dba_converges_and_covariances_finite():
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_problem(
        jax.random.PRNGKey(0))
    n, h, w = disps_gt.shape
    p = dba.plan(ii, jj, kf0=0, kf1=n, E=32, P=n, K=n)

    tpad = jnp.zeros((32, h, w, 2)).at[:ii.shape[0]].set(target)
    wpad = jnp.zeros((32, h, w, 2)).at[:ii.shape[0]].set(weight)

    noise = 0.02 * jax.random.normal(jax.random.PRNGKey(1), (n, 6))
    noise = noise.at[0].set(0.0)
    poses = se3.retr(poses_gt, noise).astype(jnp.float32)
    disps = jnp.maximum(
        disps_gt + 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                            disps_gt.shape), 0.1
    ).astype(jnp.float32)

    eta = 1e-4 * jnp.ones((n, h, w), dtype=jnp.float32)
    sens = jnp.zeros((n, h, w), dtype=jnp.float32)

    run = jax.jit(lambda po, di: dba.dba_iterations(
        po, di, intr, tpad, wpad, eta, sens, p, iters=6,
        ep=0.01, lm=1e-4))
    res = run(poses, disps)

    assert float(res.flow_rms) < 0.02, float(res.flow_rms)
    err = se3.log(se3.mul(res.poses, se3.inv(poses_gt)))
    # gauge-relative: all errors should be small since pose0 anchored
    assert float(jnp.abs(err).max()) < 2e-2, err

    assert bool(jnp.all(jnp.isfinite(res.pose_cov)))
    assert bool(jnp.all(jnp.isfinite(res.z_cov)))
    assert bool(jnp.all(res.z_cov > 0))
    # anchored pose has (near) zero covariance; later poses more
    tr = jnp.trace(res.pose_cov, axis1=-2, axis2=-1)
    assert float(tr[0]) < float(tr[1:].min()) + 1e-6


@pytest.mark.slow
def test_dba_motion_only():
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_problem(
        jax.random.PRNGKey(3))
    n, h, w = disps_gt.shape
    p = dba.plan(ii, jj, kf0=0, kf1=n, E=32, P=n, K=n)
    tpad = jnp.zeros((32, h, w, 2)).at[:ii.shape[0]].set(target)
    wpad = jnp.zeros((32, h, w, 2)).at[:ii.shape[0]].set(weight)
    noise = 0.02 * jax.random.normal(jax.random.PRNGKey(4), (n, 6))
    noise = noise.at[0].set(0.0)
    poses = se3.retr(poses_gt, noise).astype(jnp.float32)
    eta = 1e-4 * jnp.ones((n, h, w), dtype=jnp.float32)
    sens = jnp.zeros((n, h, w), dtype=jnp.float32)
    res = dba.dba_iterations(poses, disps_gt, intr, tpad, wpad, eta, sens,
                             p, iters=8, ep=0.01, lm=1e-4,
                             compute_covariances=False, motion_only=True)
    err = se3.log(se3.mul(res.poses, se3.inv(poses_gt)))
    assert float(jnp.abs(err).max()) < 2e-3, err
    # disps untouched in motion-only mode
    np.testing.assert_allclose(res.disps, disps_gt, atol=1e-6)


@pytest.mark.slow
def test_dba_window_fixes_out_of_window_poses():
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_problem(
        jax.random.PRNGKey(5))
    n, h, w = disps_gt.shape
    kf0 = 2
    p = dba.plan(ii, jj, kf0=kf0, kf1=n, E=32, P=4, K=n)
    tpad = jnp.zeros((32, h, w, 2)).at[:ii.shape[0]].set(target)
    wpad = jnp.zeros((32, h, w, 2)).at[:ii.shape[0]].set(weight)
    noise = jnp.zeros((n, 6)).at[kf0:].set(
        0.02 * jax.random.normal(jax.random.PRNGKey(6), (n - kf0, 6)))
    poses = se3.retr(poses_gt, noise).astype(jnp.float32)
    eta = 1e-4 * jnp.ones((n, h, w), dtype=jnp.float32)
    sens = jnp.zeros((n, h, w), dtype=jnp.float32)
    res = dba.dba_iterations(poses, disps_gt, intr, tpad, wpad, eta, sens,
                             p, iters=6, ep=0.01, lm=1e-4,
                             compute_covariances=False)
    # first kf0 poses must not move
    np.testing.assert_allclose(res.poses[:kf0], poses[:kf0], atol=1e-7)
    err = se3.log(se3.mul(res.poses, se3.inv(poses_gt)))
    assert float(jnp.abs(err[kf0:]).max()) < 5e-3, err


@pytest.mark.slow
def test_sparse_schur_matches_dense():
    """The interaction-list Schur assembly must equal the dense path."""
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_problem(
        jax.random.PRNGKey(7))
    n, h, w = disps_gt.shape
    plan_sparse = dba.plan(ii, jj, kf0=1, kf1=n, E=32, P=n, K=n)
    plan_dense = plan_sparse._replace(pair_a=None, pair_b=None,
                                      pair_valid=None)
    tpad = jnp.zeros((32, h, w, 2)).at[:ii.shape[0]].set(target)
    wpad = jnp.zeros((32, h, w, 2)).at[:ii.shape[0]].set(weight)
    noise = 0.02 * jax.random.normal(jax.random.PRNGKey(8), (n, 6))
    poses = se3.retr(poses_gt, noise).astype(jnp.float32)
    disps = disps_gt
    eta = 1e-4 * jnp.ones((n, h, w), dtype=jnp.float32)
    sens = jnp.zeros((n, h, w), dtype=jnp.float32)

    r_s = dba.dba_iterations(poses, disps, intr, tpad, wpad, eta, sens,
                             plan_sparse, iters=2, ep=0.05, lm=1e-4)
    r_d = dba.dba_iterations(poses, disps, intr, tpad, wpad, eta, sens,
                             plan_dense, iters=2, ep=0.05, lm=1e-4)
    np.testing.assert_allclose(np.asarray(r_s.poses),
                               np.asarray(r_d.poses), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_s.disps),
                               np.asarray(r_d.disps), atol=1e-4)
    # fp32 summation-order differences only
    np.testing.assert_allclose(np.asarray(r_s.pose_cov),
                               np.asarray(r_d.pose_cov), rtol=1e-2,
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(r_s.z_cov),
                               np.asarray(r_d.z_cov), rtol=1e-3,
                               atol=1e-6)


@pytest.mark.slow
def test_linearize_cm_matches_nhwc_reference():
    import numpy as np
    rng = np.random.RandomState(5)
    N, H, W = 5, 6, 8
    E, P, K = 8, 5, 5
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (N, 1))
    poses[:, :3] = 0.2 * rng.randn(N, 3).astype(np.float32)
    qs = rng.randn(N, 4).astype(np.float32) * 0.1
    qs[:, 3] += 1.0
    poses[:, 3:] = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    disps = np.clip(1.0 + 0.3 * rng.randn(N, H, W), 0.1,
                    None).astype(np.float32)
    intr = np.tile(np.array([8.0, 8.0, W / 2, H / 2], np.float32), (N, 1))
    ii = np.array([0, 1, 2, 3, 1, 2])
    jj = np.array([1, 2, 3, 4, 0, 1])
    p = dba.plan(ii, jj, 0, N, E, P, K)
    targets = (rng.randn(E, H, W, 2) * 2).astype(np.float32)
    weights = np.abs(rng.rand(E, H, W, 2)).astype(np.float32)

    a = dba.linearize(jnp.asarray(poses), jnp.asarray(disps),
                      jnp.asarray(intr), jnp.asarray(targets),
                      jnp.asarray(weights), p)
    b = dba._linearize_nhwc_ref(jnp.asarray(poses), jnp.asarray(disps),
                                jnp.asarray(intr), jnp.asarray(targets),
                                jnp.asarray(weights), p)
    for ta, tb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_padded_plan_slots_do_not_clobber_real_updates():
    """plan.kx pads invalid slots with 0 and px clips at the top of the
    buffer: padded scatter rows must NOT overwrite the real updates of
    slot 0 / the last slot (regression: keyframe 0's depth was silently
    frozen by a stale duplicate write)."""
    import numpy as np
    rng = np.random.RandomState(3)
    N, H, W = 6, 6, 8
    E, P, K = 16, 8, 10           # K > n_kf -> padded kx rows alias 0
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (N, 1))
    poses[:, 0] = 0.15 * np.arange(N)      # translation along x
    disps = np.ones((N, H, W), np.float32)
    intr = np.tile(np.array([8.0, 8.0, W / 2, H / 2], np.float32), (N, 1))
    ii = np.array([0, 1, 2, 3, 4, 1, 2, 3, 4, 5])
    jj = np.array([1, 2, 3, 4, 5, 0, 1, 2, 3, 4])
    p = dba.plan(ii, jj, 0, N, E, P, K)
    # targets = reprojection shifted 1px -> nonzero residual everywhere
    coords, _, _ = camera_pt(jnp.asarray(poses), jnp.asarray(disps),
                             jnp.asarray(intr), p.ii, p.jj)
    targets = coords + 1.0
    weights = 0.5 * np.ones((E, H, W, 2), np.float32)
    eta = 1e-4 * np.ones((K, H, W), np.float32)
    sens = np.zeros((K, H, W), np.float32)
    res = dba.dba_iterations(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
        jnp.asarray(targets), jnp.asarray(weights), jnp.asarray(eta),
        jnp.asarray(sens), p, iters=1, compute_covariances=False)
    d_delta = np.abs(np.asarray(res.disps) - disps).mean(axis=(1, 2))
    # slot 0 has source edges (0->1): its depth must move
    assert d_delta[0] > 1e-6, d_delta
    # the last pose in the window must move too
    p_delta = np.abs(np.asarray(res.poses) - poses).sum(axis=1)
    assert p_delta[N - 1] > 1e-8, p_delta


def camera_pt(poses, disps, intr, ii, jj):
    from nerf_slam_tpu.geometry import camera
    return camera.projective_transform(poses, disps, intr, ii, jj)
