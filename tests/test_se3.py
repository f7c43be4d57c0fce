import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_slam_tpu.geometry import se3


def random_poses(key, n):
    k1, k2 = jax.random.split(key)
    t = jax.random.normal(k1, (n, 3))
    q = jax.random.normal(k2, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([t, q], axis=-1)


def test_identity_mul_inv():
    g = random_poses(jax.random.PRNGKey(0), 8)
    eye = se3.identity((8,))
    np.testing.assert_allclose(se3.mul(g, eye), g, atol=1e-6)
    np.testing.assert_allclose(se3.mul(eye, g), g, atol=1e-6)
    gi = se3.inv(g)
    prod = se3.mul(g, gi)
    np.testing.assert_allclose(prod[..., :3], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(prod[..., 6]), 1.0, atol=1e-6)


def test_act_matches_matrix():
    key = jax.random.PRNGKey(1)
    g = random_poses(key, 5)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    y1 = se3.act(g, x)
    M = se3.matrix(g)
    xh = jnp.concatenate([x, jnp.ones((5, 1))], axis=-1)
    y2 = jnp.einsum("nij,nj->ni", M, xh)[:, :3]
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_from_matrix_roundtrip():
    g = random_poses(jax.random.PRNGKey(3), 16)
    g2 = se3.from_matrix(se3.matrix(g))
    # quaternions are sign-ambiguous: compare rotation action + translation
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 3))
    np.testing.assert_allclose(se3.act(g, x), se3.act(g2, x), atol=1e-5)


def test_exp_log_roundtrip():
    xi = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (32, 6))
    g = se3.exp(xi)
    xi2 = se3.log(g)
    np.testing.assert_allclose(xi, xi2, atol=1e-5)


def test_exp_small_angle():
    xi = 1e-6 * jax.random.normal(jax.random.PRNGKey(6), (4, 6))
    g = se3.exp(xi)
    np.testing.assert_allclose(g[..., :3], xi[..., :3], atol=1e-8)
    np.testing.assert_allclose(g[..., 3:6], 0.5 * xi[..., 3:6], atol=1e-8)
    np.testing.assert_allclose(g[..., 6], 1.0, atol=1e-8)


def test_exp_matches_finite_rotation():
    # exp of pure rotation about z by theta
    theta = 0.7
    xi = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, theta])
    g = se3.exp(xi)
    x = jnp.array([1.0, 0.0, 0.0])
    y = se3.act(g, x)
    np.testing.assert_allclose(
        y, [np.cos(theta), np.sin(theta), 0.0], atol=1e-6)


def test_retr_left_convention():
    g = random_poses(jax.random.PRNGKey(7), 3)
    xi = 0.1 * jax.random.normal(jax.random.PRNGKey(8), (3, 6))
    r = se3.retr(g, xi)
    expected = se3.mul(se3.exp(xi), g)
    np.testing.assert_allclose(r, expected, atol=1e-6)


def test_adjoint_identity():
    # exp(Adj(g) xi) == g exp(xi) g^-1
    g = random_poses(jax.random.PRNGKey(9), 4)
    xi = 0.3 * jax.random.normal(jax.random.PRNGKey(10), (4, 6))
    Adj = se3.adj_matrix(g)
    lhs = se3.exp(jnp.einsum("nij,nj->ni", Adj, xi))
    rhs = se3.mul(se3.mul(g, se3.exp(xi)), se3.inv(g))
    x = jax.random.normal(jax.random.PRNGKey(11), (4, 3))
    np.testing.assert_allclose(se3.act(lhs, x), se3.act(rhs, x), atol=1e-4)


def test_adjT_apply_matches_matrix():
    g = random_poses(jax.random.PRNGKey(12), 4)
    row = jax.random.normal(jax.random.PRNGKey(13), (4, 6))
    out = se3.adjT_apply(g, row)
    AdjT = jnp.swapaxes(se3.adj_matrix(g), -1, -2)
    expected = jnp.einsum("nij,nj->ni", AdjT, row)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_relpose():
    gi = random_poses(jax.random.PRNGKey(14), 4)
    gj = random_poses(jax.random.PRNGKey(15), 4)
    gij = se3.relpose(gi, gj)
    # gij * gi == gj (as actions)
    x = jax.random.normal(jax.random.PRNGKey(16), (4, 3))
    np.testing.assert_allclose(
        se3.act(se3.mul(gij, gi), x), se3.act(gj, x), atol=1e-5)
