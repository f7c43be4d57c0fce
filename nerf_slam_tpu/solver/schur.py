"""Damped block-Cholesky and Schur-complement solvers (pure JAX).

TPU-native equivalent of the reference ``networks/geom/chol.py``:
``block_solve`` solves the pose-only normal equations, ``schur_solve``
eliminates per-pixel depth variables first.  Dense Cholesky on TPU is
cheap at these sizes (P*6 <= a few hundred), so no sparse path is needed
(the reference's Eigen SimplicialLLT disappears, SURVEY.md section 2.2).

Differentiable: jax.scipy cho_factor/cho_solve have well-defined VJPs, so
these can sit inside a training loop like the reference's CholeskySolver
autograd Function.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


def damp(H: jax.Array, ep: float = 0.1, lm: float = 1e-4) -> jax.Array:
    """H + (ep + lm*diag(H)) on the diagonal (chol.py:32-40 damping),
    batched over leading dims."""
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    n = H.shape[-1]
    eye = jnp.eye(n, dtype=H.dtype)
    return H + eye * (ep + lm * diag)[..., None, :]


def block_solve(H: jax.Array, b: jax.Array, ep: float = 0.1,
                lm: float = 1e-4) -> jax.Array:
    """Solve the pose-only normal equations.

    H: (N, N, D, D) block Hessian; b: (N, D).  Returns dx (N, D).
    Equivalent of chol.py:32-43.
    """
    N, _, D, _ = H.shape
    Hd = jnp.transpose(H, (0, 2, 1, 3)).reshape(N * D, N * D)
    Hd = damp(Hd, ep, lm)
    bd = b.reshape(N * D)
    c, low = cho_factor(Hd)
    x = cho_solve((c, low), bd)
    return x.reshape(N, D)


def schur_solve(H: jax.Array, E: jax.Array, C: jax.Array, v: jax.Array,
                w: jax.Array, ep: float = 0.1, lm: float = 1e-4):
    """Solve the full (pose, depth) system by eliminating depths.

    H: (P, P, D, D)   pose-pose block Hessian
    E: (P, M, D, HW)  pose-depth coupling blocks
    C: (M, HW)        depth-depth diagonal
    v: (P, D)         pose rhs
    w: (M, HW)        depth rhs
    Returns (dx (P, D), dz (M, HW)).  Equivalent of chol.py:46-73.
    """
    P, M, D, HW = E.shape
    Hd = jnp.transpose(H, (0, 2, 1, 3)).reshape(P * D, P * D)
    Ed = jnp.transpose(E, (0, 2, 1, 3)).reshape(P * D, M * HW)
    Q = 1.0 / C.reshape(M * HW)

    Hd = damp(Hd, ep, lm)
    vd = v.reshape(P * D)
    wd = w.reshape(M * HW)

    S = Hd - Ed @ (Q[:, None] * Ed.T)
    rhs = vd - Ed @ (Q * wd)

    c, low = cho_factor(S)
    dx = cho_solve((c, low), rhs)
    # failure tolerance as in the reference CholeskySolver
    # (chol.py:8-18): a non-PSD reduced system (untrained weights early
    # in BA-in-the-loop training) yields NaN -- return a zero step
    # instead of poisoning the unroll
    ok = jnp.all(jnp.isfinite(dx))
    dx = jnp.where(ok, dx, 0.0)
    dz = Q * (wd - Ed.T @ dx)
    dz = jnp.where(ok, dz, 0.0)
    return dx.reshape(P, D), dz.reshape(M, HW)
