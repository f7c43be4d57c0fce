"""Dense bundle adjustment, training-style API (pure JAX).

Equivalent of the reference ``networks/geom/ba.py`` (BA / MoBA): one
Gauss-Newton step on (keyframe poses, per-pixel inverse depths) given GRU
flow targets and confidence weights.  torch_scatter's scatter_sum becomes
``jax.ops.segment_sum``; lietorch retractions become geometry.se3.

All shapes are static; edges may be masked out by zeroing their weights,
which makes this jit-stable for padded edge sets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import camera, se3
from .schur import block_solve, schur_solve


def _scatter_mat(A, ii, jj, n, m):
    """Sum (E, D1, D2) blocks into an (n, m, D1, D2) grid by (ii, jj);
    out-of-range indices are dropped (ba.py:12-14 safe_scatter_add_mat)."""
    valid = (ii >= 0) & (jj >= 0) & (ii < n) & (jj < m)
    idx = jnp.where(valid, ii * m + jj, n * m)
    out = jax.ops.segment_sum(A, idx, num_segments=n * m + 1)
    return out[:n * m].reshape((n, m) + A.shape[1:])


def _scatter_vec(b, ii, n):
    valid = (ii >= 0) & (ii < n)
    idx = jnp.where(valid, ii, n)
    out = jax.ops.segment_sum(b, idx, num_segments=n + 1)
    return out[:n]


def build_system(target, weight, poses, disps, intrinsics, ii, jj):
    """Linearize reprojection residuals for all edges.

    target/weight: (E, H, W, 2); returns the per-edge blocks
    (Hii, Hij, Hji, Hjj (E,6,6)), (vi, vj (E,6)), (Ei, Ej (E,6,HW)),
    (Ck, wk (E,HW)), r (E,HW,2) -- the same quantities as
    projective_transform_kernel (droid_kernels.cu:192-536), in DROID
    tangent order.
    """
    E = ii.shape[0]
    H, W = disps.shape[-2:]
    HW = H * W

    coords, valid, (Ji, Jj, Jz) = camera.projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=True)

    r = (target - coords)                           # (E,H,W,2)
    w = 0.001 * (valid * weight)                    # (E,H,W,2), kernel:344

    # flatten pixels+coords into one residual axis of length HW*2
    Jif = Ji.reshape(E, HW * 2, 6)
    Jjf = Jj.reshape(E, HW * 2, 6)
    Jzf = Jz.reshape(E, HW, 2)
    rf = r.reshape(E, HW * 2)
    wf = w.reshape(E, HW * 2)

    wJi = wf[..., None] * Jif
    wJj = wf[..., None] * Jjf

    Hii = jnp.einsum("enc,end->ecd", wJi, Jif)
    Hij = jnp.einsum("enc,end->ecd", wJi, Jjf)
    Hji = jnp.einsum("enc,end->ecd", wJj, Jif)
    Hjj = jnp.einsum("enc,end->ecd", wJj, Jjf)

    vi = jnp.einsum("enc,en->ec", wJi, rf)
    vj = jnp.einsum("enc,en->ec", wJj, rf)

    w2 = w.reshape(E, HW, 2)
    r2 = r.reshape(E, HW, 2)
    Ei = jnp.einsum("ehx,ehx,ehxc->ech", w2, Jzf,
                    Ji.reshape(E, HW, 2, 6))
    Ej = jnp.einsum("ehx,ehx,ehxc->ech", w2, Jzf,
                    Jj.reshape(E, HW, 2, 6))

    Ck = jnp.einsum("ehx,ehx,ehx->eh", w2, Jzf, Jzf)
    wk = jnp.einsum("ehx,ehx,ehx->eh", w2, r2, Jzf)

    return (Hii, Hij, Hji, Hjj), (vi, vj), (Ei, Ej), (Ck, wk)


def ba_step(target, weight, eta, poses, disps, intrinsics, ii, jj,
            fixedp: int = 1, ep: float = 0.1, lm: float = 1e-4):
    """One full-BA Gauss-Newton step (ba.py:31-106 semantics).

    eta: (K, H, W) per-depth-map damping where K = number of unique source
    frames; the caller supplies ``kx``/``kk`` implicitly via jnp.unique --
    to stay jit-friendly we instead require ii to already index depth slots
    0..N-1 of the *full buffer* and eta to cover the buffer: depth maps
    untouched by any edge simply receive no update.
    """
    N = poses.shape[0]
    H, W = disps.shape[-2:]
    HW = H * W

    (Hii, Hij, Hji, Hjj), (vi, vj), (Ei, Ej), (Ck, wk) = build_system(
        target, weight, poses, disps, intrinsics, ii, jj)

    # pose indices shifted so the first `fixedp` poses are fixed
    P = N - fixedp
    iis = ii - fixedp
    jjs = jj - fixedp

    Hb = (_scatter_mat(Hii, iis, iis, P, P)
          + _scatter_mat(Hij, iis, jjs, P, P)
          + _scatter_mat(Hji, jjs, iis, P, P)
          + _scatter_mat(Hjj, jjs, jjs, P, P))
    vb = _scatter_vec(vi, iis, P) + _scatter_vec(vj, jjs, P)

    # depth maps: one slot per buffer entry (static shapes; untouched
    # slots have C=eta only and w=0 -> dz=0)
    Eb = (_scatter_mat(Ei, iis, ii, P, N)
          + _scatter_mat(Ej, jjs, ii, P, N))          # (P,N,6,HW)
    C = _scatter_vec(Ck, ii, N) + eta.reshape(N, HW) + 1e-7
    w = _scatter_vec(wk, ii, N)

    dx, dz = schur_solve(Hb, Eb, C, vb, w, ep=ep, lm=lm)

    # retract
    dx_full = jnp.zeros((N, 6), dtype=dx.dtype).at[fixedp:].set(dx)
    poses = se3.retr(poses, dx_full)
    disps = disps + dz.reshape(N, H, W)
    disps = jnp.where(disps > 10.0, jnp.zeros_like(disps), disps)
    disps = jnp.maximum(disps, 0.0)
    return poses, disps


def moba_step(target, weight, poses, disps, intrinsics, ii, jj,
              fixedp: int = 1, ep: float = 0.1, lm: float = 1e-4):
    """Motion-only BA step (ba.py:109-157)."""
    N = poses.shape[0]
    (Hii, Hij, Hji, Hjj), (vi, vj), _, _ = build_system(
        target, weight, poses, disps, intrinsics, ii, jj)

    P = N - fixedp
    iis = ii - fixedp
    jjs = jj - fixedp

    Hb = (_scatter_mat(Hii, iis, iis, P, P)
          + _scatter_mat(Hij, iis, jjs, P, P)
          + _scatter_mat(Hji, jjs, iis, P, P)
          + _scatter_mat(Hjj, jjs, jjs, P, P))
    vb = _scatter_vec(vi, iis, P) + _scatter_vec(vj, jjs, P)

    dx = block_solve(Hb, vb, ep=ep, lm=lm)
    dx_full = jnp.zeros((N, 6), dtype=dx.dtype).at[fixedp:].set(dx)
    return se3.retr(poses, dx_full)
