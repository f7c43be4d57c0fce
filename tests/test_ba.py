"""Toy bundle-adjustment convergence tests (BASELINE.json config #1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_slam_tpu.geometry import camera, se3
from nerf_slam_tpu.solver import ba, schur


def make_problem(key, n=5, h=10, w=14, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    xi = 0.08 * jax.random.normal(ks[0], (n, 6), dtype=dtype)
    xi = xi.at[0].set(0.0)
    poses_gt = se3.exp(xi)
    disps_gt = 0.6 + 0.4 * jax.random.uniform(ks[1], (n, h, w), dtype=dtype)
    intr = jnp.tile(jnp.array([[30.0, 30.0, w / 2, h / 2]], dtype=dtype),
                    (n, 1))
    # chain + skip edges, bidirectional
    ii, jj = [], []
    for a in range(n):
        for b in range(n):
            if a != b and abs(a - b) <= 2:
                ii.append(a)
                jj.append(b)
    ii = jnp.array(ii)
    jj = jnp.array(jj)
    target, valid, _ = camera.projective_transform(
        poses_gt, disps_gt, intr, ii, jj)
    weight = jnp.ones_like(target) * valid
    return poses_gt, disps_gt, intr, ii, jj, target, weight


@pytest.mark.slow
def test_schur_solve_matches_dense():
    key = jax.random.PRNGKey(0)
    P, M, D, HW = 3, 4, 6, 5
    A = jax.random.normal(key, (P * D, P * D + M * HW))
    # build an SPD full system via A A^T partitioning
    ks = jax.random.split(key, 4)
    J = jax.random.normal(ks[0], (40, P * D + M * HW))
    Hfull = J.T @ J + 0.5 * jnp.eye(P * D + M * HW)
    v_full = jax.random.normal(ks[1], (P * D + M * HW,))

    Hpp = Hfull[:P * D, :P * D]
    Epm = Hfull[:P * D, P * D:]
    # schur path assumes a *diagonal* depth block; make it dominant so the
    # diagonalized system stays PD
    Cmm = jnp.diagonal(Hfull[P * D:, P * D:]) + 50.0
    # rebuild a consistent system with diagonal depth block
    Hs = Hpp.reshape(P, D, P, D).transpose(0, 2, 1, 3)
    E = Epm.reshape(P, D, M, HW).transpose(0, 2, 1, 3)
    C = Cmm.reshape(M, HW)
    v = v_full[:P * D].reshape(P, D)
    w = v_full[P * D:].reshape(M, HW)

    dx, dz = schur.schur_solve(Hs, E, C, v, w, ep=0.0, lm=0.0)

    # oracle: solve the block-diagonal-C full system densely
    Hd = jnp.block([[Hpp, Epm], [Epm.T, jnp.diag(Cmm)]])
    sol = jnp.linalg.solve(Hd, v_full)
    np.testing.assert_allclose(dx.reshape(-1), sol[:P * D], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(dz.reshape(-1), sol[P * D:], rtol=1e-4,
                               atol=1e-4)


@pytest.mark.slow
def test_moba_recovers_poses():
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_problem(
        jax.random.PRNGKey(1))
    # perturb all but the first pose
    noise = 0.03 * jax.random.normal(jax.random.PRNGKey(2), (5, 6))
    noise = noise.at[0].set(0.0)
    poses = se3.retr(poses_gt, noise)

    for _ in range(10):
        poses = ba.moba_step(target, weight, poses, disps_gt, intr, ii, jj,
                             fixedp=1, ep=0.01, lm=1e-4)

    err = se3.log(se3.mul(poses, se3.inv(poses_gt)))
    assert float(jnp.abs(err).max()) < 1e-3, err


def test_full_ba_reduces_error():
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_problem(
        jax.random.PRNGKey(3))
    noise = 0.02 * jax.random.normal(jax.random.PRNGKey(4), (5, 6))
    noise = noise.at[0].set(0.0)
    poses = se3.retr(poses_gt, noise)
    dnoise = 0.05 * jax.random.normal(jax.random.PRNGKey(5), disps_gt.shape)
    disps = jnp.maximum(disps_gt + dnoise, 0.1)

    eta = 1e-4 * jnp.ones_like(disps_gt)

    def flow_rms(p, d):
        c, valid, _ = camera.projective_transform(p, d, intr, ii, jj)
        return float(jnp.sqrt(jnp.mean(((target - c) * valid) ** 2)))

    before = flow_rms(poses, disps)
    for _ in range(10):
        poses, disps = ba.ba_step(target, weight, eta, poses, disps, intr,
                                  ii, jj, fixedp=1, ep=0.01, lm=1e-4)
    after = flow_rms(poses, disps)
    assert after < 0.05 * before, (before, after)

    err = se3.log(se3.mul(poses, se3.inv(poses_gt)))
    assert float(jnp.abs(err).max()) < 5e-3, err


@pytest.mark.slow
def test_ba_step_is_jittable_with_masked_edges():
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_problem(
        jax.random.PRNGKey(6))
    # pad edges to a static max with zero-weight entries
    E_max = 24
    pad = E_max - ii.shape[0]
    ii_p = jnp.concatenate([ii, jnp.zeros(pad, dtype=ii.dtype)])
    jj_p = jnp.concatenate([jj, jnp.ones(pad, dtype=jj.dtype)])
    target_p = jnp.concatenate(
        [target, jnp.zeros((pad,) + target.shape[1:])], 0)
    weight_p = jnp.concatenate(
        [weight, jnp.zeros((pad,) + weight.shape[1:])], 0)

    eta = 1e-4 * jnp.ones_like(disps_gt)
    step = jax.jit(lambda p, d: ba.ba_step(
        target_p, weight_p, eta, p, d, intr, ii_p, jj_p, fixedp=1,
        ep=0.01, lm=1e-4))

    noise = 0.02 * jax.random.normal(jax.random.PRNGKey(7), (5, 6))
    noise = noise.at[0].set(0.0)
    poses = se3.retr(poses_gt, noise)
    disps = disps_gt
    for _ in range(8):
        poses, disps = step(poses, disps)
    err = se3.log(se3.mul(poses, se3.inv(poses_gt)))
    assert float(jnp.abs(err).max()) < 5e-3, err
