"""Factor-graph abstraction: pose-graph optimization, robust losses,
incremental solving (BASELINE.json config #1)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_slam_tpu.geometry import se3
from nerf_slam_tpu.solver.factor_graph import (
    BetweenFactorSE3, CauchyLoss, FactorGraph, Key, PriorFactor, SE3_VAR,
    Variables, VECTOR, Factor)
from nerf_slam_tpu.solver.nonlinear import (GaussNewton, IncrementalSolver,
                                            LevenbergMarquardt, LinearLS)


def make_pose_chain(n=5, seed=0):
    key = jax.random.PRNGKey(seed)
    xi = 0.3 * jax.random.normal(key, (n, 6))
    poses = [se3.identity()]
    for i in range(1, n):
        poses.append(se3.mul(se3.exp(xi[i]), poses[-1]))
    return poses


def build_graph(poses, noise_seed=1):
    g = FactorGraph()
    g.add(PriorFactor(Key("x", 0), poses[0], SE3_VAR, sigma=1e-3))
    for i in range(len(poses) - 1):
        meas = se3.mul(poses[i + 1], se3.inv(poses[i]))
        g.add(BetweenFactorSE3(Key("x", i), Key("x", i + 1), meas,
                               sigma=0.01))
    # loop closure
    meas = se3.mul(poses[-1], se3.inv(poses[0]))
    g.add(BetweenFactorSE3(Key("x", 0), Key("x", len(poses) - 1), meas,
                           sigma=0.01))
    return g


@pytest.mark.slow
def test_pose_graph_gauss_newton():
    poses = make_pose_chain(5)
    g = build_graph(poses)
    x0 = Variables()
    k = jax.random.PRNGKey(2)
    for i, p in enumerate(poses):
        noise = 0.05 * jax.random.normal(jax.random.fold_in(k, i), (6,))
        x0.insert(Key("x", i), se3.retr(p, noise) if i else p, SE3_VAR)
    res = GaussNewton(max_iters=15).solve(g, x0)
    assert res.error < 1e-6, res.error
    for i, p in enumerate(poses):
        err = se3.log(se3.mul(res.variables.at(Key("x", i)), se3.inv(p)))
        assert float(jnp.abs(err).max()) < 1e-3


def test_pose_graph_lm():
    poses = make_pose_chain(4, seed=3)
    g = build_graph(poses)
    x0 = Variables()
    for i, p in enumerate(poses):
        x0.insert(Key("x", i),
                  se3.retr(p, 0.1 * jnp.ones(6)) if i else p, SE3_VAR)
    res = LevenbergMarquardt().solve(g, x0)
    assert res.error < 1e-6, res.error


def test_robust_loss_rejects_outlier():
    """Line fit y = a x + b with one large outlier: Cauchy beats L2."""
    class PointFactor(Factor):
        def __init__(self, key, x, y, loss=None):
            super().__init__([key], loss, sigma=0.1)
            self.x, self.y = x, y

        def residual(self, ab):
            return jnp.array([ab[0] * self.x + ab[1] - self.y])

    rng = np.random.RandomState(0)
    xs = np.linspace(0, 1, 20)
    ys = 2.0 * xs + 1.0 + 0.01 * rng.randn(20)
    ys[7] += 5.0  # outlier
    kab = Key("ab")

    def fit(loss):
        g = FactorGraph()
        for x, y in zip(xs, ys):
            g.add(PointFactor(kab, float(x), float(y), loss=loss))
        v = Variables().insert(kab, jnp.zeros(2), VECTOR(2))
        return GaussNewton(max_iters=20).solve(g, v).variables.at(kab)

    ab_l2 = fit(None)
    ab_robust = fit(CauchyLoss(k=0.5))
    err_l2 = abs(float(ab_l2[0]) - 2.0) + abs(float(ab_l2[1]) - 1.0)
    err_rb = abs(float(ab_robust[0]) - 2.0) + abs(float(ab_robust[1]) - 1.0)
    assert err_rb < 0.3 * err_l2, (err_l2, err_rb)


@pytest.mark.slow
def test_incremental_solver():
    poses = make_pose_chain(4, seed=5)
    solver = IncrementalSolver()
    g = FactorGraph()
    g.add(PriorFactor(Key("x", 0), poses[0], SE3_VAR, sigma=1e-3))
    v = Variables().insert(Key("x", 0), poses[0], SE3_VAR)
    solver.update(g, v)
    for i in range(1, 4):
        meas = se3.mul(poses[i], se3.inv(poses[i - 1]))
        g.add(BetweenFactorSE3(Key("x", i - 1), Key("x", i), meas,
                               sigma=0.01))
        nv = Variables().insert(Key("x", i),
                                se3.retr(poses[i], 0.05 * jnp.ones(6)),
                                SE3_VAR)
        res = solver.update(g, nv)
    for i, p in enumerate(poses):
        err = se3.log(se3.mul(res.variables.at(Key("x", i)), se3.inv(p)))
        assert float(jnp.abs(err).max()) < 1e-3, (i, err)


@pytest.mark.slow
def test_incremental_solver_is_actually_incremental():
    """Fluid relinearization: once the back of the chain has converged,
    growing the graph must not relinearize old factors, and the result
    must match a batch Gauss-Newton solve."""
    n = 8
    poses = make_pose_chain(n, seed=7)
    solver = IncrementalSolver()
    g = FactorGraph()
    g.add(PriorFactor(Key("x", 0), poses[0], SE3_VAR, sigma=1e-3))
    v = Variables().insert(Key("x", 0), poses[0], SE3_VAR)
    solver.update(g, v)
    for i in range(1, n):
        meas = se3.mul(poses[i], se3.inv(poses[i - 1]))
        g.add(BetweenFactorSE3(Key("x", i - 1), Key("x", i), meas,
                               sigma=0.01))
        nv = Variables().insert(Key("x", i),
                                se3.retr(poses[i], 0.05 * jnp.ones(6)),
                                SE3_VAR)
        res = solver.update(g, nv)
        # steady state: each update linearizes O(1) factors (the new
        # one, plus at most its immediate neighbourhood while the new
        # pose's lin point settles), never the whole graph
        if i >= 3:
            assert res.iterations <= 4, (i, res.iterations,
                                         solver.stats)

    assert solver.stats["reused"] > solver.stats["relinearized"], \
        solver.stats

    # parity with a batch solve from the same initialization
    vb = Variables()
    for i in range(n):
        init = poses[i] if i == 0 else se3.retr(poses[i],
                                                0.05 * jnp.ones(6))
        vb.insert(Key("x", i), init, SE3_VAR)
    batch = GaussNewton(max_iters=10).solve(g, vb)
    for i in range(n):
        d = se3.log(se3.mul(res.variables.at(Key("x", i)),
                            se3.inv(batch.variables.at(Key("x", i)))))
        assert float(jnp.abs(d).max()) < 1e-3, (i, d)


def test_linear_ls():
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(30, 4).astype(np.float32))
    x_true = jnp.asarray(rng.randn(4).astype(np.float32))
    b = A @ x_true
    x = LinearLS.solve_cholesky(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               atol=1e-4)
    # weighted: zero-weight rows are ignored
    b_bad = b.at[0].add(100.0)
    w = jnp.ones(30).at[0].set(0.0)
    xw = LinearLS.solve_cholesky(A, b_bad, w)
    np.testing.assert_allclose(np.asarray(xw), np.asarray(x_true),
                               atol=1e-4)
