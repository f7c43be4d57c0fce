import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_slam_tpu.geometry import camera, se3, upsample


@pytest.fixture
def x64():
    with jax.enable_x64(True):
        yield


def make_scene(key, n=4, h=12, w=16, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    # small random poses near identity so reprojections stay in frame
    xi = 0.05 * jax.random.normal(k1, (n, 6), dtype=dtype)
    poses = se3.exp(xi)
    disps = 0.5 + 0.5 * jax.random.uniform(k2, (n, h, w), dtype=dtype)
    intr = jnp.tile(jnp.array([[20.0, 20.0, w / 2, h / 2]], dtype=dtype),
                    (n, 1))
    return poses, disps, intr


def test_iproj_proj_inverse():
    poses, disps, intr = make_scene(jax.random.PRNGKey(0))
    X = camera.iproj(disps, intr)
    coords, _ = camera.proj(X, intr)
    grid = camera.coords_grid(12, 16)
    np.testing.assert_allclose(coords, jnp.broadcast_to(grid, coords.shape),
                               atol=1e-4)


def test_identity_transform_is_identity_flow():
    poses, disps, intr = make_scene(jax.random.PRNGKey(1))
    poses = se3.identity((4,))
    ii = jnp.array([0, 1])
    jj = jnp.array([0, 1])
    flow, valid = camera.induced_flow(poses, disps, intr, ii, jj)
    np.testing.assert_allclose(flow, 0.0, atol=1e-4)
    np.testing.assert_allclose(valid, 1.0)


def _fd_pose_jac(poses, disps, intr, ii, jj, pose_idx, eps=1e-6):
    """finite-difference d(coords)/d(xi) for left perturbation of poses[pose_idx]."""
    cols = []
    for k in range(6):
        xi = jnp.zeros((6,)).at[k].set(eps)
        pp = poses.at[pose_idx].set(se3.retr(poses[pose_idx], xi))
        pm = poses.at[pose_idx].set(se3.retr(poses[pose_idx], -xi))
        cp, _, _ = camera.projective_transform(pp, disps, intr, ii, jj)
        cm, _, _ = camera.projective_transform(pm, disps, intr, ii, jj)
        cols.append((cp - cm) / (2 * eps))
    return jnp.stack(cols, axis=-1)  # (E,H,W,2,6)


@pytest.mark.slow
def test_projective_jacobians_vs_finite_difference(x64):
    poses, disps, intr = make_scene(jax.random.PRNGKey(2),
                                    dtype=jnp.float64)
    ii = jnp.array([0, 2])
    jj = jnp.array([1, 3])
    coords, valid, (Ji, Jj, Jz) = camera.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True)

    # pose j of the first edge (index 1 in buffer)
    fd = _fd_pose_jac(poses, disps, intr, ii, jj, 1)
    mask = valid[0, ..., None]  # ignore invalid pixels
    np.testing.assert_allclose(Jj[0] * mask, fd[0] * mask, atol=1e-5)

    # pose i of the first edge (index 0 in buffer)
    fd = _fd_pose_jac(poses, disps, intr, ii, jj, 0)
    np.testing.assert_allclose(Ji[0] * mask, fd[0] * mask, atol=1e-5)


@pytest.mark.slow
def test_depth_jacobian_vs_finite_difference(x64):
    poses, disps, intr = make_scene(jax.random.PRNGKey(3),
                                    dtype=jnp.float64)
    ii = jnp.array([0])
    jj = jnp.array([1])
    coords, valid, (_, _, Jz) = camera.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True)
    eps = 1e-6
    cp, _, _ = camera.projective_transform(poses, disps + eps, intr, ii, jj)
    cm, _, _ = camera.projective_transform(poses, disps - eps, intr, ii, jj)
    fd = (cp - cm) / (2 * eps)
    mask = valid[0]
    np.testing.assert_allclose(Jz[0, ..., 0] * mask, fd[0] * mask, atol=1e-5)


def test_frame_distance_zero_for_same_frame():
    poses, disps, intr = make_scene(jax.random.PRNGKey(4))
    poses = se3.identity((4,))
    d = camera.frame_distance(poses, disps, intr,
                              jnp.array([0]), jnp.array([0]))
    np.testing.assert_allclose(d, 0.0, atol=1e-4)


def test_frame_distance_increases_with_motion():
    poses, disps, intr = make_scene(jax.random.PRNGKey(5))
    poses = se3.identity((4,))
    shift = se3.exp(jnp.array([0.2, 0.0, 0.0, 0.0, 0.0, 0.0]))
    poses = poses.at[1].set(shift)
    d01 = camera.frame_distance(poses, disps, intr,
                                jnp.array([0]), jnp.array([1]))
    assert float(d01[0]) > 1.0
    big = se3.exp(jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    poses = poses.at[1].set(big)
    d01_big = camera.frame_distance(poses, disps, intr,
                                    jnp.array([0]), jnp.array([1]))
    assert float(d01_big[0]) > float(d01[0])


def test_cvx_upsample_constant_field():
    data = 3.0 * jnp.ones((2, 6, 8, 1))
    mask = jax.random.normal(jax.random.PRNGKey(6), (2, 9 * 64, 6, 8))
    up = upsample.cvx_upsample(data, mask)
    assert up.shape == (2, 48, 64, 1)
    np.testing.assert_allclose(up, 3.0, atol=1e-5)


def test_cvx_upsample_pow_shrinks_weights():
    # pow=2 on softmax weights -> sum of weights < 1 -> value shrinks
    data = jnp.ones((1, 4, 4, 1))
    mask = jnp.zeros((1, 9 * 64, 4, 4))
    up = upsample.cvx_upsample(data, mask, pow=2.0)
    assert float(up.max()) < 1.0


@pytest.mark.slow
def test_depth_filter_counts_consistent_views():
    # identical poses & depths: every valid neighbor agrees
    n, h, w = 8, 10, 12
    poses = se3.identity((n,))
    disps = 0.7 * jnp.ones((n, h, w))
    intr = jnp.tile(jnp.array([[15.0, 15.0, 6.0, 5.0]]), (n, 1))
    counts = camera.depth_filter(poses, disps, intr, jnp.array([4]), 0.1)
    # keyframe 4 has all 6 neighbors in range (1,2,3 below; 7 above w/ n=3
    # -> jx in {3,2,1,7,8(INVALID? 4+4=8 OOB), ...})
    assert counts.shape == (1, h, w)
    inner = np.asarray(counts)[0, 1:-1, 1:-1]
    assert inner.max() >= 4
    # inconsistent depths: zero agreement
    disps_bad = disps.at[3].set(5.0).at[2].set(5.0).at[1].set(5.0)
    disps_bad = disps_bad.at[7].set(5.0)
    counts2 = camera.depth_filter(poses, disps_bad, intr,
                                  jnp.array([4]), 0.01)
    assert np.asarray(counts2).max() <= 2


def test_iproj_points_roundtrip():
    n, h, w = 2, 8, 10
    poses = se3.exp(0.1 * jax.random.normal(jax.random.PRNGKey(0), (n, 6)))
    disps = 0.5 * jnp.ones((n, h, w))
    intr = jnp.tile(jnp.array([[12.0, 12.0, 5.0, 4.0]]), (n, 1))
    pts = camera.iproj_points(poses, disps, intr)
    assert pts.shape == (n, h, w, 3)
    # reproject back: should land on the original pixel grid
    cam = se3.act(poses[:, None, None, :], pts)
    u = intr[0, 0] * cam[..., 0] / cam[..., 2] + intr[0, 2]
    v = intr[0, 1] * cam[..., 1] / cam[..., 2] + intr[0, 3]
    grid = camera.coords_grid(h, w)
    np.testing.assert_allclose(u, grid[..., 0] + 0 * u, atol=1e-3)
    np.testing.assert_allclose(v, grid[..., 1] + 0 * v, atol=1e-3)
