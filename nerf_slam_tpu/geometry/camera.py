"""Pinhole projective geometry with analytic Jacobians (pure JAX).

TPU-native equivalent of the reference's
``networks/geom/projective_ops.py`` and the linearization half of
``src/droid_kernels.cu:192-536`` (projective_transform_kernel).

All functions operate on a *keyframe buffer*:
  poses      : (N, 7)   cam_T_world, [t, q_xyzw] (see geometry.se3)
  disps      : (N, H, W) inverse depths at feature resolution
  intrinsics : (N, 4)   [fx, fy, cx, cy] at feature resolution
  ii, jj     : (E,)     int32 edge lists (source -> target keyframe)

Jacobians are in the DROID convention: tangent = [v(3), w(3)], left
retraction ``exp(xi) * cam_T_world``.  (The reference additionally
reorders/sign-flips for GTSAM at visual_frontend.py:383-403; our solver is
DROID-native so we keep the clean convention and convert only at the
covariance-output boundary.)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import se3

MIN_DEPTH = 0.2  # same clamp as reference projective_ops.py:8


def coords_grid(ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """(H, W, 2) grid of pixel coordinates [x, y]."""
    y, x = jnp.meshgrid(jnp.arange(ht, dtype=dtype),
                        jnp.arange(wd, dtype=dtype), indexing="ij")
    return jnp.stack([x, y], axis=-1)


def iproj(disps: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Inverse-project to homogeneous points [X, Y, 1, d].

    disps: (..., H, W); intrinsics: (..., 4) broadcastable over leading dims.
    Returns (..., H, W, 4).
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    x = grid[..., 0]
    y = grid[..., 1]
    X = (x - cx) / fx
    Y = (y - cy) / fy
    ones = jnp.ones_like(disps)
    return jnp.stack([X, Y, ones, disps], axis=-1)


def proj(Xs: jax.Array, intrinsics: jax.Array, jacobian: bool = False,
         return_depth: bool = False):
    """Pinhole projection of homogeneous points (..., H, W, 4) -> pixels.

    Returns coords (..., H, W, 2 or 3) and (optionally) the 2x4 projection
    Jacobian d(u,v)/d(X,Y,Z,D).
    """
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    X, Y, Z, D = jnp.moveaxis(Xs, -1, 0)

    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z

    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        coords = jnp.stack([x, y, D * d], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)

    if not jacobian:
        return coords, None

    o = jnp.zeros_like(d)
    Jp = jnp.stack(
        [fx * d, o, -fx * X * d * d, o,
         o, fy * d, -fy * Y * d * d, o], axis=-1)
    Jp = Jp.reshape(Jp.shape[:-1] + (2, 4))
    return coords, Jp


def actp(Gij: jax.Array, X0: jax.Array, jacobian: bool = False):
    """SE(3) action on homogeneous point clouds with optional Jacobian.

    Gij: (..., 7) poses (broadcast against X0's pixel dims).
    X0:  (..., H, W, 4).
    Jacobian Ja is (..., H, W, 4, 6) wrt left-perturbation of Gij, DROID
    tangent order [v, w] (projective_ops.py:69-96).
    """
    X1 = se3.act4(Gij[..., None, None, :], X0)
    if not jacobian:
        return X1, None
    X, Y, Z, d = jnp.moveaxis(X1, -1, 0)
    o = jnp.zeros_like(d)
    Ja = jnp.stack(
        [d, o, o, o, Z, -Y,
         o, d, o, -Z, o, X,
         o, o, d, Y, -X, o,
         o, o, o, o, o, o], axis=-1)
    Ja = Ja.reshape(Ja.shape[:-1] + (4, 6))
    return X1, Ja


def projective_transform(poses: jax.Array, disps: jax.Array,
                         intrinsics: jax.Array, ii: jax.Array,
                         jj: jax.Array, jacobian: bool = False,
                         return_depth: bool = False,
                         stereo_rel: Optional[jax.Array] = None):
    """Map pixels of keyframes ii into keyframes jj.

    Returns (coords (E,H,W,2[,3]), valid (E,H,W,1), (Ji, Jj, Jz)) where
    Ji/Jj are (E,H,W,2,6) Jacobians wrt left-perturbations of
    cam_T_world[ii] / cam_T_world[jj], and Jz is (E,H,W,2,1) wrt the
    source inverse depth.  Mirrors projective_ops.py:98-145 minus the
    GTSAM reordering.

    ``stereo_rel``: optional (7,) cam1_T_cam0 rig pose; edges with
    ii == jj are STEREO edges whose relative pose is pinned to it
    (reference projective_ops.py:100-110, droid_kernels.cu:248-258).
    """
    X0 = iproj(disps[ii], intrinsics[ii])
    Gij = se3.relpose(poses[ii], poses[jj])
    if stereo_rel is not None:
        Gij = jnp.where((ii == jj)[:, None], stereo_rel[None, :], Gij)
    X1, Ja = actp(Gij, X0, jacobian=jacobian)
    x1, Jp = proj(X1, intrinsics[jj], jacobian=jacobian,
                  return_depth=return_depth)

    valid = ((X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH))
    valid = valid.astype(disps.dtype)[..., None]

    if not jacobian:
        return x1, valid, (None, None, None)

    # Jj = Jp @ Ja : (E,H,W,2,6) wrt perturbation of Gij (== of pose jj)
    Jj = jnp.einsum("...ik,...kj->...ij", Jp, Ja)
    # Ji transforms via the (negative) transposed adjoint of Gij
    Ji = -se3.adjT_apply(Gij[..., None, None, None, :], Jj)

    # Jz: chain rule through the homogeneous transform; only the disp
    # channel of X0 moves: dX1/dd = [t_ij, 0] under act4, i.e. se3.act4 on
    # the unit-disp basis vector -> [t, 1].
    tij = Gij[..., None, None, :3]
    dX1_dd = jnp.concatenate([tij * jnp.ones_like(X1[..., :3]),
                              jnp.ones_like(X1[..., 3:4])], axis=-1)
    Jz = jnp.einsum("...ik,...k->...i", Jp, dX1_dd)[..., None]

    return x1, valid, (Ji, Jj, Jz)


def projective_transform_cm(poses, disps, intrinsics, ii, jj,
                            stereo_rel: Optional[jax.Array] = None):
    """Channel-major projective transform with analytic Jacobians.

    Same math as :func:`projective_transform` (jacobian=True), but every
    tensor keeps the pixel axis LAST -- (E, C, HW) "planes" with HW on
    TPU lanes -- instead of trailing (2, 6) Jacobian dims that pad
    6 lanes to 128.  Used by the DBA linearization (solver/dba.py),
    where the NHWC layout made linearize ~15 ms vs ~1 ms of real work.

    Returns (coords (E,2,HW), valid (E,1,HW),
             Ji (E,6,2,HW), Jj (E,6,2,HW), Jz (E,2,HW)).
    """
    E = ii.shape[0]
    ht, wd = disps.shape[-2:]
    HW = ht * wd

    fx_i, fy_i, cx_i, cy_i = jnp.moveaxis(intrinsics[ii], -1, 0)
    fx_j, fy_j, cx_j, cy_j = jnp.moveaxis(intrinsics[jj], -1, 0)
    fx_i = fx_i[:, None]
    fy_i = fy_i[:, None]
    cx_i = cx_i[:, None]
    cy_i = cy_i[:, None]
    fx_j = fx_j[:, None]
    fy_j = fy_j[:, None]
    cx_j = cx_j[:, None]
    cy_j = cy_j[:, None]

    grid = coords_grid(ht, wd, dtype=disps.dtype).reshape(HW, 2)
    gx = grid[None, :, 0]
    gy = grid[None, :, 1]
    d0 = disps[ii].reshape(E, HW)

    X0x = (gx - cx_i) / fx_i
    X0y = (gy - cy_i) / fy_i

    Gij = se3.relpose(poses[ii], poses[jj])              # (E, 7)
    if stereo_rel is not None:
        # stereo edges (ii == jj): rig-calibrated relative pose
        # (droid_kernels.cu:248-258 pins tij/qij to the baseline)
        Gij = jnp.where((ii == jj)[:, None], stereo_rel[None, :], Gij)
    t = Gij[:, :3]
    q = Gij[:, 3:7]
    R = se3.quat_to_matrix(q)                            # (E, 3, 3)

    # X1 = R [X0x, X0y, 1] + d0 t
    X1x = (R[:, 0, 0][:, None] * X0x + R[:, 0, 1][:, None] * X0y
           + R[:, 0, 2][:, None] + d0 * t[:, 0][:, None])
    X1y = (R[:, 1, 0][:, None] * X0x + R[:, 1, 1][:, None] * X0y
           + R[:, 1, 2][:, None] + d0 * t[:, 1][:, None])
    X1z = (R[:, 2, 0][:, None] * X0x + R[:, 2, 1][:, None] * X0y
           + R[:, 2, 2][:, None] + d0 * t[:, 2][:, None])

    valid = (X1z > MIN_DEPTH).astype(disps.dtype)[:, None, :]

    Zs = jnp.where(X1z < 0.5 * MIN_DEPTH, jnp.ones_like(X1z), X1z)
    iz = 1.0 / Zs

    u = fx_j * (X1x * iz) + cx_j
    v = fy_j * (X1y * iz) + cy_j
    coords = jnp.stack([u, v], axis=1)                   # (E, 2, HW)

    gu = fx_j * iz
    hu = -fx_j * X1x * iz * iz
    gv = fy_j * iz
    hv = -fy_j * X1y * iz * iz

    o = jnp.zeros_like(iz)
    # Jj rows (wrt left perturbation of Gij, DROID [v, w] order)
    Jj_u = [gu * d0, o, hu * d0,
            hu * X1y, gu * X1z - hu * X1x, -gu * X1y]
    Jj_v = [o, gv * d0, hv * d0,
            -gv * X1z + hv * X1y, -hv * X1x, gv * X1x]
    Jj = jnp.stack([jnp.stack(Jj_u, axis=1),
                    jnp.stack(Jj_v, axis=1)], axis=2)    # (E, 6, 2, HW)

    # Ji = -(Jj row) @ Adj(Gij): contract channels with the 6x6 adjoint
    A = se3.adj_matrix(Gij)                              # (E, 6, 6)
    Ji = -jnp.einsum("edc,edxh->ecxh", A, Jj)

    # Jz (wrt source inverse depth)
    Jz = jnp.stack([gu * t[:, 0][:, None] + hu * t[:, 2][:, None],
                    gv * t[:, 1][:, None] + hv * t[:, 2][:, None]],
                   axis=1)                               # (E, 2, HW)

    return coords, valid, Ji, Jj, Jz


def induced_flow(poses, disps, intrinsics, ii, jj):
    """Optical flow induced by camera motion (projective_ops.py:147-158)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid, _ = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid


def frame_distance(poses, disps, intrinsics, ii, jj, beta: float = 0.3):
    """Mean reprojection-flow magnitude between frame pairs.

    TPU-native equivalent of frame_distance_kernel
    (droid_kernels.cu:630-769): blends full-SE(3) flow with a
    translation-only flow by ``beta``; returns 1000.0 when fewer than 75%
    of pixels remain valid.  Output: (E,) distances.
    """
    ht, wd = disps.shape[-2:]
    grid = coords_grid(ht, wd, dtype=disps.dtype)

    X0 = iproj(disps[ii], intrinsics[ii])
    Gij = se3.relpose(poses[ii], poses[jj])
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[ii][..., None, None, :], -1, 0)

    def flow_mag(X1):
        Z = X1[..., 2]
        u = fx * (X1[..., 0] / Z) + cx - grid[..., 0]
        v = fy * (X1[..., 1] / Z) + cy - grid[..., 1]
        d = jnp.sqrt(u * u + v * v)
        val = (Z > MIN_DEPTH).astype(disps.dtype)
        return d, val

    # full SE(3) flow
    X1 = se3.act4(Gij[..., None, None, :], X0)
    d1, v1 = flow_mag(X1)
    # translation-only flow
    X1t = X0.at[..., :3].add(X0[..., 3:4] * Gij[..., None, None, :3])
    d2, v2 = flow_mag(X1t)

    accum = beta * jnp.sum(d1 * v1, axis=(-2, -1)) + \
        (1 - beta) * jnp.sum(d2 * v2, axis=(-2, -1))
    valid = beta * jnp.sum(v1, axis=(-2, -1)) + \
        (1 - beta) * jnp.sum(v2, axis=(-2, -1))
    total = float(ht * wd)  # beta + (1-beta) per pixel

    frac = valid / (total + 1e-8)
    dist = accum / jnp.maximum(valid, 1e-8)
    return jnp.where(frac < 0.75, 1000.0, dist)


def frame_distance_bidirectional(poses, disps, intrinsics, ii, jj,
                                 beta: float = 0.3):
    """0.5 * (d(ii->jj) + d(jj->ii)), as visual_frontend.py:788-792."""
    d1 = frame_distance(poses, disps, intrinsics, ii, jj, beta)
    d2 = frame_distance(poses, disps, intrinsics, jj, ii, beta)
    return 0.5 * (d1 + d2)


def iproj_points(poses, disps, intrinsics):
    """Back-project inverse depths to world-frame 3D points
    (iproj_kernel, droid_kernels.cu:896-967 equivalent).

    poses: (N, 7) cam_T_world; returns (N, H, W, 3) world points.
    """
    X = iproj(disps, intrinsics)                   # [x, y, 1, d] cam
    d = jnp.maximum(X[..., 3:4], 1e-8)
    pts_cam = X[..., :3] / d
    c2w = se3.inv(poses)
    return se3.act(c2w[..., None, None, :], pts_cam)


def depth_filter(poses, disps, intrinsics, ix, thresh):
    """Multi-view depth consistency counter
    (depth_filter_kernel, droid_kernels.cu:773-891).

    For each keyframe in ``ix``, reproject its inverse depths into the 6
    neighbouring keyframes (ix-3..ix-1, ix+3..ix+5 per the CUDA neighbor
    schedule jx = ix-n-1 for n<3 else ix+n) and count how many neighbors
    agree within ``thresh`` (comparing depths at the 4 surrounding
    pixels, like the kernel).  Returns (len(ix), H, W) counts.
    """
    N, H, W = disps.shape
    ix = jnp.asarray(ix, jnp.int32)
    thresh = jnp.broadcast_to(jnp.asarray(thresh, disps.dtype),
                              (ix.shape[0],))

    def one_pair(i_kf, j_kf, t):
        valid_j = (j_kf >= 0) & (j_kf < N)
        j_safe = jnp.clip(j_kf, 0, N - 1)
        Gij = se3.relpose(poses[i_kf], poses[j_safe])
        X0 = iproj(disps[i_kf], intrinsics[i_kf])
        X1 = se3.act4(Gij[None, None], X0)
        fx, fy, cx, cy = intrinsics[j_safe]
        Z = jnp.where(X1[..., 2] > 0.01, X1[..., 2], 1e6)
        uj = fx * X1[..., 0] / Z + cx
        vj = fy * X1[..., 1] / Z + cy
        dj = X1[..., 3] / Z
        u0 = jnp.floor(uj).astype(jnp.int32)
        v0 = jnp.floor(vj).astype(jnp.int32)
        inb = (u0 >= 0) & (v0 >= 0) & (u0 < W - 1) & (v0 < H - 1) & \
            (X1[..., 2] > 0.01)
        u0c = jnp.clip(u0, 0, W - 2)
        v0c = jnp.clip(v0, 0, H - 2)
        dmap = disps[j_safe]
        agree = jnp.zeros(dj.shape, bool)
        zj = 1.0 / jnp.maximum(dj, 1e-8)
        for dv in (0, 1):
            for du in (0, 1):
                dn = dmap[v0c + dv, u0c + du]
                agree |= jnp.abs(zj - 1.0 / jnp.maximum(dn, 1e-8)) < t
        return (agree & inb & valid_j).astype(disps.dtype)

    def one_kf(i_kf, t):
        count = jnp.zeros((H, W), disps.dtype)
        for n in range(6):
            j_kf = jnp.where(n < 3, i_kf - n - 1, i_kf + n)
            count = count + one_pair(i_kf, j_kf, t)
        return count

    return jax.vmap(one_kf)(ix, thresh)
