"""Pure-JAX SE(3) / SO(3) library on quaternion+translation 7-vectors.

TPU-native replacement for the reference's `lietorch` submodule and the
quaternion device math in the reference CUDA kernels
(/root/reference/src/droid_kernels.cu:66-188, 994-1012).

Conventions (identical to DROID / lietorch):
  - A pose is a length-7 vector ``[tx, ty, tz, qx, qy, qz, qw]`` (xyzw quat).
  - ``act``: ``Y = R @ X + t`` (and homogeneous variant for [x,y,z,d] points).
  - Tangent vectors are ``[v(3), w(3)]`` -- translation first (DROID order).
  - ``retr(xi, g) = exp(xi) * g`` (left retraction, as retrSE3 in the
    reference kernels).

All functions are shape-polymorphic over leading batch dims: a "pose" arg
has shape (..., 7), a tangent (..., 6), a point (..., 3) or (..., 4).
Everything is jit/vmap/grad-compatible and fp32 by design (geometry must
not run in bf16).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# quaternion primitives (xyzw)
# ---------------------------------------------------------------------------


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2, xyzw convention."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_inv(q: jax.Array) -> jax.Array:
    """Conjugate (== inverse for unit quaternions)."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q: jax.Array, x: jax.Array) -> jax.Array:
    """Rotate 3-vector(s) x by unit quaternion(s) q.

    Matches actSO3 in the reference kernels: uv = 2 q_v x x;
    y = x + q_w uv + q_v x uv.
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, x)
    return x + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion (xyzw), branch-free.

    Uses the 4-candidate construction, picking the numerically best via
    one-hot selection so it stays jit-friendly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four squared magnitudes (up to constant)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # scale-free candidate quaternions, one per dominant component; each is
    # the true quaternion times a positive scalar, normalized at the end
    cand_w = jnp.stack([m21 - m12, m02 - m20, m10 - m01, qw2], axis=-1)
    cand_x = jnp.stack([qx2, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    cand_y = jnp.stack([m01 + m10, qy2, m12 + m21, m02 - m20], axis=-1)
    cand_z = jnp.stack([m02 + m20, m12 + m21, qz2, m10 - m01], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (...,4cand,4)
    onehot = jax.nn.one_hot(best, 4, dtype=m.dtype)[..., None]
    q = jnp.sum(cands * onehot, axis=-2)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q


# ---------------------------------------------------------------------------
# SE(3) on 7-vectors
# ---------------------------------------------------------------------------

def identity(shape=(), dtype=jnp.float32) -> jax.Array:
    """Identity pose(s) with the given leading batch shape."""
    out = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return out.at[..., 6].set(1.0)


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose: (a * b) acts as a(b(x))."""
    ta, qa = a[..., :3], a[..., 3:7]
    tb, qb = b[..., :3], b[..., 3:7]
    q = quat_mul(qa, qb)
    t = ta + quat_act(qa, tb)
    return jnp.concatenate([t, q], axis=-1)


def inv(g: jax.Array) -> jax.Array:
    t, q = g[..., :3], g[..., 3:7]
    qi = quat_inv(q)
    return jnp.concatenate([-quat_act(qi, t), qi], axis=-1)


def act(g: jax.Array, x: jax.Array) -> jax.Array:
    """Apply to 3-points: R x + t."""
    return quat_act(g[..., 3:7], x) + g[..., :3]


def act4(g: jax.Array, X: jax.Array) -> jax.Array:
    """Apply to homogeneous [x, y, z, d] points (DROID convention):
    Y[:3] = R X[:3] + d t ; Y[3] = d.   (actSE3 in the reference kernels)
    """
    x3 = quat_act(g[..., 3:7], X[..., :3]) + X[..., 3:4] * g[..., :3]
    return jnp.concatenate([x3, X[..., 3:4]], axis=-1)


def relpose(gi: jax.Array, gj: jax.Array) -> jax.Array:
    """Gij = gj * gi^{-1}  (relSE3 in the reference kernels)."""
    return mul(gj, inv(gi))


def matrix(g: jax.Array) -> jax.Array:
    """Pose 7-vector -> 4x4 homogeneous matrix."""
    R = quat_to_matrix(g[..., 3:7])
    t = g[..., :3]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m: jax.Array) -> jax.Array:
    """4x4 homogeneous matrix -> pose 7-vector."""
    q = matrix_to_quat(m[..., :3, :3])
    t = m[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


# ---------------------------------------------------------------------------
# exp / log / retr / adj
# ---------------------------------------------------------------------------

def exp_so3(phi: jax.Array) -> jax.Array:
    """so(3) -> unit quaternion, with the same small-angle series as the
    reference expSO3 (droid_kernels.cu:123-145)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < 1e-8
    imag_small = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_p4
    real_small = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_p4
    # guard INSIDE the sqrt: d(sqrt)/dx at 0 is inf, and inf * 0 = NaN
    # would leak through the where-select into gradients at phi = 0
    theta_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq),
                                    theta_sq))
    imag_big = jnp.sin(0.5 * theta_safe) / theta_safe
    real_big = jnp.cos(0.5 * theta_safe)
    imag = jnp.where(small, imag_small, imag_big)
    real = jnp.where(small, real_small, real_big)
    return jnp.concatenate([imag * phi, real], axis=-1)


def exp(xi: jax.Array) -> jax.Array:
    """se(3) tangent [v, w] -> pose 7-vector (expSE3 semantics)."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = exp_so3(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    # sqrt guarded inside (see exp_so3): keeps grads finite at xi = 0
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta_safe = jnp.sqrt(theta_sq_safe)
    # V(theta) tau = tau + a (phi x tau) + b (phi x (phi x tau))
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta_safe)) / theta_sq_safe)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta_safe - jnp.sin(theta_safe)) / (theta_safe * theta_sq_safe))
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = tau + a * c1 + b * c2
    return jnp.concatenate([t, q], axis=-1)


def log_so3(q: jax.Array) -> jax.Array:
    """Unit quaternion -> so(3) vector."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # enforce positive hemisphere for a principal log
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sign
    qw = qw * sign
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = n_sq < 1e-16
    # sqrt guarded inside (see exp_so3): finite grads at identity
    n_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(n_sq), n_sq))
    # the small branch of `scale` never consumes `angle`, so n_safe can
    # stand in for n everywhere
    angle = 2.0 * jnp.arctan2(n_safe, qw)
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-8), angle / n_safe)
    return scale * qv


def log(g: jax.Array) -> jax.Array:
    """Pose -> se(3) tangent [v, w] (inverse of exp)."""
    t = g[..., :3]
    phi = log_so3(g[..., 3:7])
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    # sqrt guarded inside (see exp_so3): finite grads at identity
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta_safe = jnp.sqrt(theta_sq_safe)
    half = 0.5 * theta_safe
    # V^{-1} = I - 1/2 [phi]_x + e [phi]_x^2 with
    # e = (1 - theta/2 * cot(theta/2)) / theta^2
    cot_term = half * jnp.cos(half) / jnp.sin(half)
    e = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0,
                  (1.0 - cot_term) / theta_sq_safe)
    c1 = jnp.cross(phi, t)
    c2 = jnp.cross(phi, c1)
    tau = t - 0.5 * c1 + e * c2
    return jnp.concatenate([tau, phi], axis=-1)


def retr(g: jax.Array, xi: jax.Array) -> jax.Array:
    """Left retraction exp(xi) * g (retrSE3 in the reference kernels;
    also lietorch's SE3.retr)."""
    return mul(exp(xi), g)


def adj_matrix(g: jax.Array) -> jax.Array:
    """6x6 adjoint of g acting on [v, w] tangents:
    Adj = [[R, [t]x R], [0, R]].
    """
    R = quat_to_matrix(g[..., 3:7])
    t = g[..., :3]
    tx = skew(t)
    top = jnp.concatenate([R, tx @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def skew(v: jax.Array) -> jax.Array:
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def adjT_apply(g: jax.Array, row: jax.Array) -> jax.Array:
    """Apply the *transposed* adjoint to a row covector: row @ Adj(g).

    Matches adjSE3 in the reference kernels (droid_kernels.cu:88-105) and
    lietorch's ``adjT``: used to transport a Jacobian row from the j-frame
    to the i-frame.  ``row`` has shape (..., 6) = [v_part, w_part].
    """
    t, q = g[..., :3], g[..., 3:7]
    qi = quat_inv(q)
    a = quat_act(qi, row[..., :3])       # R^T v
    b = quat_act(qi, row[..., 3:6])      # R^T w
    # w part gains -R^T (t x v): Adj^T = [[R^T, 0], [-R^T [t]x, R^T]]
    u = jnp.cross(row[..., :3], t)
    b = b + quat_act(qi, u)
    return jnp.concatenate([a, b], axis=-1)


def normalize(g: jax.Array) -> jax.Array:
    """Renormalise the quaternion part (drift control after many retr)."""
    q = g[..., 3:7]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([g[..., :3], q], axis=-1)
