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

import jax
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
    """Incremental smoother (the reference's iSAM2 slot,
    solvers/nonlinear_solver.py:28-74), implemented with iSAM2's *fluid
    relinearization* semantics rather than a full re-solve:

    - every variable carries a persistent linearization point ``x_lin``
      and a tangent delta ``d``; the running estimate is
      ``retract(x_lin, d)``;
    - every factor caches its whitened linearization ``(r0, {J_k})``
      taken at its keys' linearization points; the quadratic model is
      ``r(d) ~= r0 + sum_k J_k d_k``;
    - ``update()`` linearizes ONLY new/changed factors and factors
      touching variables whose delta exceeded ``relin_thresh`` (those
      variables' lin points are first advanced and their deltas reset,
      exactly iSAM2's relinearization rule); everything else reuses the
      cache;
    - the normal equations are then assembled from cached blocks and
      solved with one damped dense Cholesky.  (The Bayes-tree's
      *incremental factorization* is deliberately replaced by a dense
      solve: at this framework's scales -- tens of poses, <=6 dof each,
      T <= a few hundred -- a dense Cholesky is microseconds on TPU and
      far below one linearization in cost; the expensive part that IS
      incrementalized here is relinearization, which autodiffs through
      retractions.)

    ``stats`` exposes per-update relinearization counts so tests (and
    benchmarks) can assert the incremental behavior is real.
    """

    def __init__(self, relin_thresh: float = 0.02, damping: float = 1e-8,
                 inner_iters: int = 2):
        self.relin_thresh = relin_thresh
        self.damping = damping
        self.inner_iters = inner_iters
        self.estimate: Optional[Variables] = None    # current estimate
        self._lin_point: Optional[Variables] = None  # per-var lin points
        self._delta: dict = {}        # Key -> tangent vec (host numpy)
        self._cache: dict = {}   # fid -> (r0, [J_k], version tuple), numpy
        self._ver: dict = {}     # Key -> int, bumped on relinearization
        self.stats = {"relinearized": 0, "reused": 0, "updates": 0}

    def _absorb_new(self, new_values: Optional[Variables]):
        if self.estimate is None:
            assert new_values is not None, "first update needs values"
            self.estimate = Variables()
            self._lin_point = Variables()
        if new_values is None:
            return
        import numpy as np
        for k in new_values.keys():
            if k not in self.estimate._vals:
                t = new_values._types[k]
                self.estimate.insert(k, new_values.at(k), t)
                self._lin_point.insert(k, new_values.at(k), t)
                self._delta[k] = np.zeros(t.tangent_dim, np.float64)
                self._ver[k] = 0

    def _batch_retract(self, keys, deltas_np):
        """Retract lin-point values at ``keys`` by ``deltas_np`` with ONE
        vmapped dispatch per variable type (not one per variable).
        Returns {key: new value}."""
        import numpy as np
        by_type: dict = {}
        for k, d in zip(keys, deltas_np):
            by_type.setdefault(id(self._lin_point._types[k]),
                               []).append((k, d))
        out = {}
        for group in by_type.values():
            ks = [k for k, _ in group]
            t = self._lin_point._types[ks[0]]
            vals = jnp.stack([self._lin_point.at(k) for k in ks])
            ds = jnp.asarray(np.stack([d for _, d in group]),
                             jnp.float32)
            new = jax.vmap(t.retract)(vals, ds)
            for i, k in enumerate(ks):
                out[k] = new[i]
        return out

    def update(self, graph: FactorGraph,
               new_values: Optional[Variables] = None) -> SolverResult:
        """iSAM2-style incremental update.

        Assembly runs vectorized on the HOST: cached whitened blocks are
        numpy, factors sharing a (key-arity, block-shape) signature are
        stacked and contracted with one einsum per signature, and
        scattered into (H, b) with np.add.at -- no per-factor device
        dispatches and no per-variable host syncs (the deltas live in
        numpy).  At this layer's scales (T <= a few hundred; GTSAM runs
        the same solve on CPU in the reference) a host Cholesky is
        microseconds; the expensive step that stays on device is factor
        relinearization, which autodiffs through retractions and is
        fetched in ONE device_get per inner iteration.
        """
        import numpy as np
        self._absorb_new(new_values)
        if len(graph) == 0:
            return SolverResult(self.estimate, 0.0, 0, True)
        self.stats["updates"] += 1
        live = set(graph.factors.keys())
        for fid in [f for f in self._cache if f not in live]:
            del self._cache[fid]     # removed/replaced factors

        relin_count = 0
        for _ in range(self.inner_iters):
            # 1. advance lin points of variables whose delta got large
            #    (numpy deltas: threshold checks cost no device syncs)
            moved = [k for k, d in self._delta.items()
                     if np.max(np.abs(d)) > self.relin_thresh]
            if moved:
                new_vals = self._batch_retract(
                    moved, [self._delta[k] for k in moved])
                for k in moved:
                    self._lin_point._vals[k] = new_vals[k]
                    self._delta[k] = np.zeros_like(self._delta[k])
                    self._ver[k] += 1

            # 2. (re)linearize new factors + factors touching moved vars;
            #    fetch all fresh linearizations in ONE device_get
            pending = {}
            for fid, f in graph.factors.items():
                ver = tuple(self._ver[k] for k in f.keys)
                hit = self._cache.get(fid)
                if hit is not None and hit[2] == ver:
                    self.stats["reused"] += 1
                    continue
                r0, Js = f.linearize(self._lin_point)
                pending[fid] = (r0, Js, ver)
                self.stats["relinearized"] += 1
                relin_count += 1
            if pending:
                fetched = jax.device_get(
                    {fid: (r0, Js) for fid, (r0, Js, _) in
                     pending.items()})
                for fid, (r0, Js, ver) in pending.items():
                    fr0, fJs = fetched[fid]
                    self._cache[fid] = (
                        np.asarray(fr0, np.float64),
                        [np.asarray(J, np.float64) for J in fJs], ver)

            # 3. assemble normal equations in the joint tangent space
            #    (absolute deltas wrt the lin points, not increments):
            #    group factors by block signature, one einsum per group
            offs = self._lin_point.tangent_offsets()
            T = self._lin_point.tangent_dim
            H = np.zeros((T, T), np.float64)
            b = np.zeros((T,), np.float64)
            groups: dict = {}
            for fid, f in graph.factors.items():
                r0, Js, _ = self._cache[fid]
                sig = (r0.shape[0],) + tuple(J.shape[1] for J in Js)
                g = groups.setdefault(sig, ([], [], []))
                g[0].append(r0)
                g[1].append(Js)
                g[2].append([offs[k][0] for k in f.keys])
            Hf = H.reshape(-1)
            for sig, (r0s, Js_list, offs_list) in groups.items():
                A = len(sig) - 1                    # key arity
                R = np.stack(r0s)                   # (F, m)
                O = np.asarray(offs_list)           # (F, A)
                Jb = [np.stack([Js[a] for Js in Js_list])
                      for a in range(A)]            # A x (F, m, d_a)
                for a in range(A):
                    da = sig[1 + a]
                    ia = O[:, a:a + 1] + np.arange(da)      # (F, d_a)
                    np.add.at(b, ia.ravel(),
                              -np.einsum('frd,fr->fd', Jb[a], R).ravel())
                    for c in range(A):
                        dc = sig[1 + c]
                        ic = O[:, c:c + 1] + np.arange(dc)  # (F, d_c)
                        blk = np.einsum('fra,frc->fac', Jb[a], Jb[c])
                        flat = (ia[:, :, None] * T
                                + ic[:, None, :]).ravel()
                        np.add.at(Hf, flat, blk.ravel())
            H[np.diag_indices(T)] += self.damping
            try:
                d_full = np.linalg.solve(H, b)
            except np.linalg.LinAlgError:
                break
            if not np.all(np.isfinite(d_full)):
                break
            for k, (o, dk) in offs.items():
                self._delta[k] = d_full[o:o + dk]

        # 4. estimate = retract(lin_point, delta) -- batched per type
        ks = self._lin_point.keys()
        new_vals = self._batch_retract(ks, [self._delta[k] for k in ks])
        est = Variables()
        for k in ks:
            est.insert(k, new_vals[k], self._lin_point._types[k])
        self.estimate = est
        err = graph.error(est)
        return SolverResult(est, err, relin_count, True)

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
