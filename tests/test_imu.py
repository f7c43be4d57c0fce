"""IMU preintegration: analytic trajectories and factor consistency."""
import numpy as np
import jax.numpy as jnp
import pytest

from nerf_slam_tpu.datasets.base import ImuCalibration
from nerf_slam_tpu.geometry import se3
from nerf_slam_tpu.slam.imu import (BiasBetweenFactor, ImuBias, ImuFactor,
                                    NavState, PreintegratedImuMeasurements)
from nerf_slam_tpu.solver.factor_graph import (FactorGraph, Key,
                                               PriorFactor, SE3_VAR,
                                               Variables, VECTOR)
from nerf_slam_tpu.solver.nonlinear import GaussNewton


def calib():
    return ImuCalibration(n_gravity=np.array([0.0, 0.0, -9.81]))


def test_static_body_measures_gravity():
    """A static body measures +g upward specific force: prediction stays
    put."""
    pim = PreintegratedImuMeasurements(calib())
    for _ in range(100):
        pim.integrate(np.array([0.0, 0.0, 9.81]), np.zeros(3), 0.01)
    s0 = NavState(pose=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                  vel=np.zeros(3))
    s1 = pim.predict(s0)
    np.testing.assert_allclose(s1.pose[:3], 0.0, atol=1e-6)
    np.testing.assert_allclose(s1.vel, 0.0, atol=1e-6)


def test_constant_acceleration():
    """1 m/s^2 forward for 1 s -> p = 0.5, v = 1."""
    pim = PreintegratedImuMeasurements(calib())
    for _ in range(1000):
        pim.integrate(np.array([1.0, 0.0, 9.81]), np.zeros(3), 0.001)
    s0 = NavState(pose=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                  vel=np.zeros(3))
    s1 = pim.predict(s0)
    np.testing.assert_allclose(s1.pose[0], 0.5, atol=1e-3)
    np.testing.assert_allclose(s1.vel[0], 1.0, atol=1e-3)


def test_constant_rotation():
    """Rotate about z at 90 deg/s for 1 s."""
    pim = PreintegratedImuMeasurements(calib())
    w = np.pi / 2
    for _ in range(1000):
        # accelerometer measures gravity in the rotating body frame
        # (body z stays aligned with world z)
        pim.integrate(np.array([0.0, 0.0, 9.81]),
                      np.array([0.0, 0.0, w]), 0.001)
    s0 = NavState(pose=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                  vel=np.zeros(3))
    s1 = pim.predict(s0)
    R = np.asarray(se3.quat_to_matrix(jnp.asarray(s1.pose[3:7])))
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(R, expect, atol=1e-3)


def test_bias_changes_prediction():
    pim0 = PreintegratedImuMeasurements(calib())
    pim1 = PreintegratedImuMeasurements(
        calib(), bias=ImuBias(acc=np.array([0.5, 0, 0])))
    for _ in range(100):
        meas = np.array([1.0, 0.0, 9.81])
        pim0.integrate(meas, np.zeros(3), 0.01)
        pim1.integrate(meas, np.zeros(3), 0.01)
    assert pim1.dp[0] < pim0.dp[0]  # bias subtracted


def test_imu_factor_zero_at_truth():
    pim = PreintegratedImuMeasurements(calib())
    for _ in range(200):
        pim.integrate(np.array([0.5, 0.0, 9.81]), np.zeros(3), 0.005)
    s0 = NavState(pose=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                  vel=np.array([0.2, 0, 0]))
    s1 = pim.predict(s0)

    f = ImuFactor(Key("x", 0), Key("v", 0), Key("x", 1), Key("v", 1), pim)
    r = f.residual(jnp.asarray(s0.pose), jnp.asarray(s0.vel),
                   jnp.asarray(s1.pose), jnp.asarray(s1.vel))
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)


@pytest.mark.slow
def test_imu_factor_in_graph_recovers_state():
    """Prior on (pose0, vel0) + IMU factor: solving recovers state 1."""
    pim = PreintegratedImuMeasurements(calib())
    for _ in range(200):
        pim.integrate(np.array([0.8, 0.2, 9.81]),
                      np.array([0.0, 0.0, 0.3]), 0.005)
    s0 = NavState(pose=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                  vel=np.array([0.1, 0, 0]))
    s1 = pim.predict(s0)

    g = FactorGraph()
    g.add(PriorFactor(Key("x", 0), s0.pose, SE3_VAR, sigma=1e-4))
    g.add(PriorFactor(Key("v", 0), s0.vel, VECTOR(3), sigma=1e-4))
    g.add(ImuFactor(Key("x", 0), Key("v", 0), Key("x", 1), Key("v", 1),
                    pim))

    v = Variables()
    v.insert(Key("x", 0), s0.pose, SE3_VAR)
    v.insert(Key("v", 0), s0.vel, VECTOR(3))
    # bad initial guess for state 1
    v.insert(Key("x", 1), np.array([0, 0, 0, 0, 0, 0, 1.0]), SE3_VAR)
    v.insert(Key("v", 1), np.zeros(3), VECTOR(3))

    res = GaussNewton(max_iters=20).solve(g, v)
    np.testing.assert_allclose(np.asarray(res.variables.at(Key("x", 1)))[:3],
                               s1.pose[:3], atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.variables.at(Key("v", 1))),
                               s1.vel, atol=1e-3)
