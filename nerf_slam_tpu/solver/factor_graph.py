"""Generic factor-graph abstraction (JAX autodiff Jacobians).

Equivalent of the reference's torch factor-graph layer
(/root/reference/factor_graph/{factor,variables,key,loss_function,
factor_graph}.py): hashable keys, a Variables container with per-type
retraction, Factor ABC whose Jacobian comes from autodiff, robust loss
weights, and a graph that stacks residuals/whitened Jacobians for the
nonlinear solvers.  GTSAM's role in the reference reduces to dense
Hessian accumulation + Cholesky + retract (SURVEY.md 2.2), which this
layer provides natively.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3


@dataclass(frozen=True)
class Key:
    """Hashable variable key (factor_graph/key.py)."""
    name: str
    idx: int = 0

    def __repr__(self):
        return f"{self.name}{self.idx}"


class VariableType:
    """Manifold spec: ambient dim, tangent dim, retraction."""

    def __init__(self, dim: int, tangent_dim: int,
                 retract: Callable[[jax.Array, jax.Array], jax.Array]):
        self.dim = dim
        self.tangent_dim = tangent_dim
        self.retract = retract


VECTOR = lambda d: VariableType(d, d, lambda x, dx: x + dx)  # noqa: E731
SE3_VAR = VariableType(7, 6, se3.retr)


class Variables:
    """Ordered key -> (value, type) store with block retraction
    (factor_graph/variables.py:9-51)."""

    def __init__(self):
        self._vals: Dict[Key, jax.Array] = {}
        self._types: Dict[Key, VariableType] = {}

    def insert(self, key: Key, value, vtype: VariableType):
        self._vals[key] = jnp.asarray(value)
        self._types[key] = vtype
        return self

    def at(self, key: Key) -> jax.Array:
        return self._vals[key]

    def keys(self) -> List[Key]:
        return list(self._vals.keys())

    def tangent_offsets(self) -> Dict[Key, Tuple[int, int]]:
        out = {}
        o = 0
        for k in self._vals:
            d = self._types[k].tangent_dim
            out[k] = (o, d)
            o += d
        return out

    @property
    def tangent_dim(self) -> int:
        return sum(t.tangent_dim for t in self._types.values())

    def retract(self, delta: jax.Array) -> "Variables":
        out = Variables()
        for k, (o, d) in self.tangent_offsets().items():
            out.insert(k, self._types[k].retract(self._vals[k],
                                                 delta[o:o + d]),
                       self._types[k])
        return out

    def copy(self) -> "Variables":
        out = Variables()
        out._vals = dict(self._vals)
        out._types = dict(self._types)
        return out


class LossFunction:
    """Robust weight rho'(r^2) (factor_graph/loss_function.py)."""

    def weight(self, sq_norm: jax.Array) -> jax.Array:
        return jnp.ones_like(sq_norm)


class TrivialLoss(LossFunction):
    pass


class CauchyLoss(LossFunction):
    def __init__(self, k: float = 1.0):
        self.k2 = k * k

    def weight(self, sq_norm):
        return self.k2 / (self.k2 + sq_norm)


class GemanMcClureLoss(LossFunction):
    def __init__(self, k: float = 1.0):
        self.k2 = k * k

    def weight(self, sq_norm):
        return (self.k2 / (self.k2 + sq_norm)) ** 2


class Factor:
    """Residual factor over a set of keys (factor_graph/factor.py).

    Subclasses implement ``residual(*values) -> (r,)`` in ambient space;
    the tangent-space Jacobian comes from autodiff through each
    variable's retraction at zero.
    """

    def __init__(self, keys: Sequence[Key],
                 loss: Optional[LossFunction] = None,
                 sigma: float = 1.0):
        self.keys = list(keys)
        self.loss = loss or TrivialLoss()
        self.sigma = sigma

    def residual(self, *values) -> jax.Array:
        raise NotImplementedError

    def linearize(self, variables: Variables):
        """Returns (r (m,), [J_k (m, t_k)]) whitened by 1/sigma and the
        robust weight sqrt."""
        vals = [variables.at(k) for k in self.keys]
        types = [variables._types[k] for k in self.keys]

        def res_of_deltas(*deltas):
            retr = [t.retract(v, d) for v, t, d in zip(vals, types,
                                                       deltas)]
            return self.residual(*retr)

        zeros = [jnp.zeros(t.tangent_dim) for t in types]
        r = res_of_deltas(*zeros)
        Js = jax.jacfwd(res_of_deltas, argnums=tuple(range(len(zeros))))(
            *zeros)
        w = self.loss.weight(jnp.sum(r * r))
        scale = jnp.sqrt(w) / self.sigma
        return scale * r, [scale * J for J in Js]


class PriorFactor(Factor):
    """||local(prior^-1 x)|| for SE3 or x - prior for vectors."""

    def __init__(self, key: Key, prior, vtype: VariableType,
                 sigma: float = 1.0, loss=None):
        super().__init__([key], loss, sigma)
        self.prior = jnp.asarray(prior)
        self.vtype = vtype

    def residual(self, x):
        if self.vtype is SE3_VAR:
            return se3.log(se3.mul(x, se3.inv(self.prior)))
        return x - self.prior


class BetweenFactorSE3(Factor):
    """Relative-pose factor: log(meas^-1 * (xj xi^-1))."""

    def __init__(self, ki: Key, kj: Key, measured, sigma: float = 1.0,
                 loss=None):
        super().__init__([ki, kj], loss, sigma)
        self.measured = jnp.asarray(measured)

    def residual(self, xi, xj):
        rel = se3.mul(xj, se3.inv(xi))
        return se3.log(se3.mul(rel, se3.inv(self.measured)))


class FactorGraph:
    """Nonlinear factor graph (factor_graph/factor_graph.py:64-150).

    add/replace/remove by id, stacked linearization into dense (H, b).
    """

    def __init__(self):
        self.factors: Dict[int, Factor] = {}
        self._next = 0

    def add(self, factor) -> int:
        """Add a factor or a list of factors; returns (first) id."""
        if isinstance(factor, (list, tuple)):
            return [self.add(f) for f in factor][0]
        fid = self._next
        self.factors[fid] = factor
        self._next += 1
        return fid

    def replace(self, fid: int, factor: Factor):
        self.factors[fid] = factor

    def remove(self, fid: int):
        self.factors.pop(fid, None)

    def reset(self):
        self.factors.clear()

    def __len__(self):
        return len(self.factors)

    def error(self, variables: Variables) -> float:
        tot = 0.0
        for f in self.factors.values():
            r = f.residual(*[variables.at(k) for k in f.keys])
            tot += float(jnp.sum((r / f.sigma) ** 2))
        return tot

    def linearize_dense(self, variables: Variables):
        """Gauss-Newton normal equations: H (T,T), b (T,)."""
        offs = variables.tangent_offsets()
        T = variables.tangent_dim
        H = jnp.zeros((T, T))
        b = jnp.zeros((T,))
        for f in self.factors.values():
            r, Js = f.linearize(variables)
            for k_a, J_a in zip(f.keys, Js):
                oa, da = offs[k_a]
                b = b.at[oa:oa + da].add(-J_a.T @ r)
                for k_b, J_b in zip(f.keys, Js):
                    ob, db = offs[k_b]
                    H = H.at[oa:oa + da, ob:ob + db].add(J_a.T @ J_b)
        return H, b
