"""rgbd utils: association, trajectory interpolation, flow-distance
matrices, frame-graph construction (reference rgbd_utils/graph_utils)."""
import numpy as np
import pytest

from nerf_slam_tpu.utils.rgbd import (all_pairs_distance_matrix,
                                      associate_frames, build_frame_graph,
                                      compute_distance_matrix_flow,
                                      graph_to_edge_list,
                                      interpolate_poses)


def test_associate_frames():
    t_img = [0.0, 1.0, 2.0]
    t_dep = [0.01, 1.4, 1.99]
    pairs = associate_frames(t_img, t_dep, max_dt=0.1)
    assert pairs == [(0, 0), (2, 2)]
    t_pose = [0.0, 1.0, 2.0]
    trips = associate_frames(t_img, t_dep, t_pose, max_dt=0.1)
    assert trips == [(0, 0, 0), (2, 2, 2)]


def test_interpolate_poses_midpoint_slerp():
    # 90 deg yaw between samples: midpoint must be 45 deg, not the
    # nearest sample
    q0 = np.array([0, 0, 0, 1.0])
    s = np.sin(np.pi / 4)
    q1 = np.array([0, 0, s, np.cos(np.pi / 4)])   # 90 deg about z
    traj = np.array([[0, 0, 0, *q0], [2, 0, 0, *q1]], np.float64)
    out = interpolate_poses([0.5], [0.0, 1.0], traj)
    assert out.shape == (1, 7)
    np.testing.assert_allclose(out[0, :3], [1, 0, 0], atol=1e-6)
    ang = 2 * np.arccos(np.clip(out[0, 6], -1, 1))
    np.testing.assert_allclose(np.degrees(ang), 45.0, atol=1e-4)
    # clamping outside the trajectory
    out = interpolate_poses([-1.0, 5.0], [0.0, 1.0], traj)
    np.testing.assert_allclose(out[0, :3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1, :3], [2, 0, 0], atol=1e-6)


@pytest.mark.slow
def test_all_pairs_distance_matrix():
    poses = np.array([[0, 0, 0, 0, 0, 0, 1],
                      [1, 0, 0, 0, 0, 0, 1],
                      [4, 0, 0, 0, 0, 0, 1]], np.float32)
    d = all_pairs_distance_matrix(poses, beta=2.0)
    assert d.shape == (3, 3)
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)
    np.testing.assert_allclose(d, d.T, atol=1e-5)
    assert d[0, 1] < d[0, 2]
    np.testing.assert_allclose(d[0, 1], 2.0, atol=1e-5)  # beta * |t|


def _orbit(n, h=16, w=24):
    """n inward-looking poses on a small orbit + constant-depth disps."""
    from nerf_slam_tpu.geometry import se3
    import jax.numpy as jnp
    poses = []
    for k in range(n):
        a = 0.25 * k
        c2w = np.eye(4)
        c2w[0, 3] = np.sin(a)
        c2w[2, 3] = -2.0 + (1 - np.cos(a))
        poses.append(np.linalg.inv(c2w))
    poses7 = np.asarray(se3.from_matrix(jnp.asarray(np.stack(poses))))
    disps = np.full((n, h, w), 0.5, np.float32)
    intr = np.array([20.0, 20.0, w / 2, h / 2], np.float32)
    return poses7, disps, intr


@pytest.mark.slow
def test_flow_distance_matrix_orders_pairs():
    poses, disps, intr = _orbit(4)
    d = compute_distance_matrix_flow(poses, disps, intr, chunk=8)
    assert d.shape == (4, 4)
    assert np.all(np.isfinite(d[0, 1:3]))
    # adjacent frames are closer in flow than distant ones
    assert d[0, 1] < d[0, 3] or not np.isfinite(d[0, 3])
    # v2 (translation-dominant) variant also runs
    d2 = compute_distance_matrix_flow(poses, disps, intr, beta=0.4,
                                      chunk=8)
    assert d2.shape == (4, 4)
    assert np.isfinite(d2[0, 1])


def test_build_frame_graph_and_edge_list():
    poses, disps, intr = _orbit(5)
    d = compute_distance_matrix_flow(poses, disps, intr, chunk=32)
    g = build_frame_graph(poses, disps, intr, num=12, thresh=1e9,
                          r=1, d=d.copy())
    # temporal radius-1 edges always present
    for i in range(5):
        for j in (i - 1, i + 1):
            if 0 <= j < 5:
                assert j in g[i]
    ii, jj, kk = graph_to_edge_list(g)
    assert len(ii) == sum(len(v) for v in g.values())
    assert ii.dtype == np.int32
    # nms variant terminates and keeps temporal edges
    g2 = build_frame_graph(poses, disps, intr, thresh=0.5, r=1,
                           nms=True, d=d.copy())
    assert 1 in g2[0]
