"""Nonlinear solvers over the factor-graph abstraction.

Equivalent of /root/reference/solvers/nonlinear_solver.py: a Solver
interface with Gauss-Newton (NonlinearLS), Levenberg-Marquardt, and an
incremental solver slot (the reference's iSAM2; ours re-linearizes the
affected window each call -- proper Bayes-tree incrementalization is an
optimization, not an API change).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from .factor_graph import FactorGraph, Variables


@dataclass
class SolverResult:
    variables: Variables
    error: float
    iterations: int
    converged: bool


class Solver:
    def solve(self, graph: FactorGraph, x0: Variables) -> SolverResult:
        raise NotImplementedError


class GaussNewton(Solver):
    """Plain GN with fixed damping (solvers/nonlinear_solver.py:114-203
    NonlinearLS equivalent)."""

    def __init__(self, max_iters: int = 10, tol: float = 1e-8,
                 damping: float = 1e-8):
        self.max_iters = max_iters
        self.tol = tol
        self.damping = damping

    def solve(self, graph, x0):
        x = x0.copy()
        err = graph.error(x)
        it = 0
        for it in range(self.max_iters):
            H, b = graph.linearize_dense(x)
            H = H + self.damping * jnp.eye(H.shape[0])
            c, low = cho_factor(H)
            dx = cho_solve((c, low), b)
            x_new = x.retract(dx)
            err_new = graph.error(x_new)
            if not jnp.isfinite(err_new):
                break
            x = x_new
            if abs(err - err_new) < self.tol * max(err, 1.0):
                err = err_new
                return SolverResult(x, err, it + 1, True)
            err = err_new
        return SolverResult(x, err, it + 1, False)


class LevenbergMarquardt(Solver):
    """Adaptive-damping LM (solvers/nonlinear_solver.py:88-111)."""

    def __init__(self, max_iters: int = 20, tol: float = 1e-8,
                 lambda0: float = 1e-4, lambda_factor: float = 10.0):
        self.max_iters = max_iters
        self.tol = tol
        self.lambda0 = lambda0
        self.factor = lambda_factor

    def solve(self, graph, x0):
        x = x0.copy()
        lam = self.lambda0
        err = graph.error(x)
        it = 0
        for it in range(self.max_iters):
            H, b = graph.linearize_dense(x)
            improved = False
            for _ in range(8):
                Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-10))
                try:
                    c, low = cho_factor(Hd)
                    dx = cho_solve((c, low), b)
                except Exception:
                    lam *= self.factor
                    continue
                x_new = x.retract(dx)
                err_new = graph.error(x_new)
                if jnp.isfinite(err_new) and err_new < err:
                    x = x_new
                    rel = abs(err - err_new) / max(err, 1.0)
                    err = err_new
                    lam = max(lam / self.factor, 1e-12)
                    improved = True
                    if rel < self.tol:
                        return SolverResult(x, err, it + 1, True)
                    break
                lam *= self.factor
            if not improved:
                return SolverResult(x, err, it + 1, True)
        return SolverResult(x, err, it + 1, False)


class IncrementalSolver(Solver):
    """iSAM2-equivalent interface (solvers/nonlinear_solver.py:28-74):
    persistent estimate updated as factors arrive.  Implementation
    re-solves with GN seeded at the previous estimate -- correct, with
    incrementalization left as a performance upgrade."""

    def __init__(self, inner: Optional[Solver] = None):
        self.inner = inner or GaussNewton(max_iters=5)
        self.estimate: Optional[Variables] = None

    def update(self, graph: FactorGraph,
               new_values: Optional[Variables] = None) -> SolverResult:
        if self.estimate is None:
            assert new_values is not None
            self.estimate = new_values.copy()
        elif new_values is not None:
            for k in new_values.keys():
                if k not in self.estimate._vals:
                    self.estimate.insert(k, new_values.at(k),
                                         new_values._types[k])
        if len(graph) == 0:
            return SolverResult(self.estimate, 0.0, 0, True)
        res = self.inner.solve(graph, self.estimate)
        self.estimate = res.variables
        return res

    def solve(self, graph, x0):
        return self.update(graph, x0)


class LinearLS:
    """Batched weighted linear least squares
    (solvers/linear_solver.py:17-86): solve argmin ||W^0.5 (A x - b)||."""

    @staticmethod
    def solve_cholesky(A: jnp.ndarray, b: jnp.ndarray,
                       w: Optional[jnp.ndarray] = None,
                       damping: float = 1e-10) -> jnp.ndarray:
        if w is not None:
            Aw = A * w[..., :, None]
        else:
            Aw = A
        H = jnp.swapaxes(Aw, -1, -2) @ A
        g = jnp.swapaxes(Aw, -1, -2) @ b[..., None]
        H = H + damping * jnp.eye(H.shape[-1])
        c, low = cho_factor(H)
        return cho_solve((c, low), g[..., 0])
