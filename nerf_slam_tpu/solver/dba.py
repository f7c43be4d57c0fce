"""Production dense bundle adjustment with marginal covariances.

TPU-native re-design of the reference's DBA hot path:

  - ``projective_transform_kernel`` + ``reduced_camera_matrix_cuda``
    (/root/reference/src/droid_kernels.cu:192-536, 1681-1768)
  - the GTSAM solve + covariance extraction
    (/root/reference/slam/visual_frontends/visual_frontend.py:1071-1232)

Everything is fused into one jit-compiled Gauss-Newton iteration over
*static-shape* padded arrays:

  P  pose slots in the optimization window   (fixed/invalid -> masked)
  K  depth-map slots (unique source frames)  (padded)
  E  edge slots                              (padded, ``edge_valid`` mask)

The host (see :func:`plan`) precomputes tiny int32 index arrays per graph
change; the device never sees dynamic shapes, so XLA compiles one program
per (P, K, E, H, W) signature.  The Schur complement is assembled as a
dense (P, K, 6, HW) coupling tensor and contracted with einsums -- the
MXU-friendly formulation (SURVEY.md section 7.4 hard-part #1); this also
makes the depth covariances nearly free, where the reference needed a
separate "HUGE MEMORY" Ej build (visual_frontend.py:1204).

Solver conventions: DROID tangent order [v, w], left retraction on
cam_T_world (geometry/se3.py).  Gauge is fixed by freezing pose slot 0
whenever the window includes keyframe 0 (the reference instead adds a
sigma=1e-4 GTSAM prior -- equivalent up to 1e-8).

Note on depth covariance: the reference computes ``sum_c (Q E^T L^-1)^2``
(visual_frontend.py:1215-1217) which uses L^-T where the marginal
``C^-1 + C^-1 E^T H^-1 E C^-1`` requires ``||L^-1 E||^2``; we implement
the latter (exact) via a triangular solve.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..geometry import camera, se3


class DBAPlan(NamedTuple):
    """Static-shape index plan for one factor-graph topology.

    All arrays are device-ready int32/float32; build with :func:`plan`.

    The optional pair arrays enable the sparse-coupled Schur assembly:
    couplings are the 2E (pose-slot, depth-slot) incidences [Eiz ++ Ejz];
    (pair_a, pair_b) enumerates coupling pairs sharing a depth slot --
    the interaction list the reference builds on the CPU in schur_block
    (droid_kernels.cu:1349-1438).  When absent, the dense (P,K) coupling
    tensor is contracted instead.
    """
    ii: jax.Array          # (E,) global source kf per edge (clipped >= 0)
    jj: jax.Array          # (E,) global target kf per edge
    pi: jax.Array          # (E,) window pose slot of ii, or -1 (fixed/out)
    pj: jax.Array          # (E,) window pose slot of jj, or -1
    kk: jax.Array          # (E,) depth slot of ii, or -1 (invalid edge)
    edge_valid: jax.Array  # (E,) float 0/1
    px: jax.Array          # (P,) global kf per pose slot (clipped)
    p_valid: jax.Array     # (P,) float 0/1
    p_fixed: jax.Array     # (P,) float 0/1 -- gauge-fixed slots (solve dx=0)
    kx: jax.Array          # (K,) global kf per depth slot (clipped)
    k_valid: jax.Array     # (K,) float 0/1
    pair_a: Optional[jax.Array] = None   # (L,) coupling index
    pair_b: Optional[jax.Array] = None   # (L,) coupling index
    pair_valid: Optional[jax.Array] = None  # (L,) float 0/1


def compute_pairs(pi: np.ndarray, pj: np.ndarray, kk: np.ndarray,
                  valid: np.ndarray, pad_to: int = 512):
    """Host-side interaction list for the sparse Schur assembly.

    Couplings are indexed 0..2E-1: coupling e couples (pi[e], kk[e]) via
    Eiz, coupling E+e couples (pj[e], kk[e]) via Ejz.  Returns padded
    (pair_a, pair_b, pair_valid) enumerating all ordered coupling pairs
    that share a depth slot (both poses in-window).  Mirrors the CPU
    loop in schur_block (droid_kernels.cu:1384-1399).
    """
    E = pi.shape[0]
    cp_pose = np.concatenate([pi, pj])
    cp_k = np.concatenate([kk, kk])
    cp_ok = np.concatenate([valid, valid]) & (cp_pose >= 0) & (cp_k >= 0)

    by_k = {}
    for c in np.nonzero(cp_ok)[0]:
        by_k.setdefault(int(cp_k[c]), []).append(int(c))
    pairs = []
    for members in by_k.values():
        for a in members:
            for b in members:
                pairs.append((a, b))
    n = len(pairs)
    L = max(pad_to, int(2 ** np.ceil(np.log2(max(n, 1)))))
    pa = np.zeros(L, np.int32)
    pb = np.zeros(L, np.int32)
    pv = np.zeros(L, np.float32)
    if n:
        arr = np.asarray(pairs, np.int32)
        pa[:n] = arr[:, 0]
        pb[:n] = arr[:, 1]
        pv[:n] = 1.0
    return pa, pb, pv


def plan(ii: np.ndarray, jj: np.ndarray, kf0: int, kf1: int,
         E: int, P: int, K: int) -> DBAPlan:
    """Host-side: build the padded index plan for edges (ii, jj) with the
    optimization window [kf0, kf1).  Mirrors the CPU graph bookkeeping in
    accum_cuda / schur_block (droid_kernels.cu:1065-1115, 1349-1438).
    """
    ii = np.asarray(ii, dtype=np.int64)
    jj = np.asarray(jj, dtype=np.int64)
    n_edges = ii.shape[0]
    if n_edges > E:
        raise ValueError(f"{n_edges} edges > edge capacity {E}")
    if kf1 - kf0 > P:
        raise ValueError(f"window {kf1 - kf0} > pose capacity {P}")

    # depth slots: unique source frames, in sorted order (matches
    # torch.unique on cat([arange(kf0,kf1), ii]))
    kf_ids = np.unique(np.concatenate([np.arange(kf0, kf1), ii]))
    if kf_ids.shape[0] > K:
        raise ValueError(f"{kf_ids.shape[0]} depth maps > capacity {K}")
    kmap = {int(k): i for i, k in enumerate(kf_ids)}

    def pad_i(arr, size, fill):
        out = np.full((size,), fill, dtype=np.int32)
        out[:arr.shape[0]] = arr
        return out

    pi = np.where((ii >= kf0) & (ii < kf1), ii - kf0, -1)
    pj = np.where((jj >= kf0) & (jj < kf1), jj - kf0, -1)
    kk = np.array([kmap[int(i)] for i in ii], dtype=np.int32)

    px = np.arange(kf0, kf0 + P, dtype=np.int32)
    p_valid = (px < kf1).astype(np.float32)
    px = np.clip(px, 0, None)
    p_fixed = np.zeros((P,), dtype=np.float32)
    if kf0 == 0:
        p_fixed[0] = 1.0  # gauge anchor (reference: strong prior on X(0))

    kx = pad_i(kf_ids.astype(np.int32), K, 0)
    k_valid = np.zeros((K,), dtype=np.float32)
    k_valid[:kf_ids.shape[0]] = 1.0

    pi_p = pad_i(pi.astype(np.int32), E, -1)
    pj_p = pad_i(pj.astype(np.int32), E, -1)
    kk_p = pad_i(kk, E, -1)
    valid_p = pad_i(np.ones(n_edges, np.int32), E, 0).astype(bool)
    pa, pb, pv = compute_pairs(pi_p, pj_p, kk_p, valid_p)

    return DBAPlan(
        ii=jnp.asarray(pad_i(ii.astype(np.int32), E, 0)),
        jj=jnp.asarray(pad_i(jj.astype(np.int32), E, 0)),
        pi=jnp.asarray(pi_p),
        pj=jnp.asarray(pj_p),
        kk=jnp.asarray(kk_p),
        edge_valid=jnp.asarray(valid_p.astype(np.float32)),
        px=jnp.asarray(px),
        p_valid=jnp.asarray(p_valid),
        p_fixed=jnp.asarray(p_fixed),
        kx=jnp.asarray(kx),
        k_valid=jnp.asarray(k_valid),
        pair_a=jnp.asarray(pa),
        pair_b=jnp.asarray(pb),
        pair_valid=jnp.asarray(pv),
    )


# ---------------------------------------------------------------------------
# device-side solver
# ---------------------------------------------------------------------------

def _seg_mat(A, idx, nseg):
    """segment-sum (E, ...) blocks by idx; idx<0 is dropped."""
    safe = jnp.where(idx < 0, nseg, idx)
    return jax.ops.segment_sum(A, safe, num_segments=nseg + 1)[:nseg]


def kx_scatter(buf, kx, k_valid, new):
    """Write ``new[s]`` into ``buf[kx[s]]`` for VALID depth slots only.

    plan.kx pads invalid slots with 0, so a plain ``buf.at[kx].set(...)``
    makes the padded rows write index 0 TOO -- and a stale duplicate can
    win over slot 0's real update (this silently froze keyframe 0's
    depth state).  Invalid rows are routed out of range and dropped.
    """
    B = buf.shape[0]
    safe = jnp.where(k_valid > 0, kx, B)
    return buf.at[safe].set(new, mode="drop")


def linearize(poses, disps, intrinsics, targets, weights, p: DBAPlan,
              stereo_rel=None):
    """Per-edge Gauss-Newton blocks; the projective_transform_kernel
    equivalent.  Returns (Hs quadrants, vs, Eiz, Ejz, Cii, bz).

    Channel-major internally: all Jacobians are (E, C, HW) planes with
    the pixel axis on TPU lanes, and the 12x12 per-edge Hessian comes
    from ONE batched (12, 2HW)@(2HW, 12) contraction -- the NHWC
    formulation with trailing (2, 6) dims padded 6 lanes to 128 and
    cost ~15 ms/call at frontend sizes; this one is ~1 ms.

    ``stereo_rel``: optional (7,) rig pose enabling STEREO edges
    (ii == jj): their relative pose is pinned to the rig and they
    contribute ONLY to the depth blocks Cii/bz -- the pose Hessian,
    rhs and couplings are zeroed, exactly like the reference kernel
    (droid_kernels.cu:367, 415-421, 432, 478-484).
    """
    Ec = p.ii.shape[0]
    H, W = disps.shape[-2:]
    HW = H * W

    coords, valid, Ji, Jj, Jz = camera.projective_transform_cm(
        poses, disps, intrinsics, p.ii, p.jj, stereo_rel=stereo_rel)
    # (E,2,HW), (E,1,HW), (E,6,2,HW), (E,6,2,HW), (E,2,HW)

    t_cm = jnp.moveaxis(targets.reshape(Ec, HW, 2), -1, 1)
    w_cm = jnp.moveaxis(weights.reshape(Ec, HW, 2), -1, 1)
    r = t_cm - coords                                    # (E,2,HW)
    w = 0.001 * valid * w_cm * p.edge_valid[:, None, None]

    # depth data blocks use the FULL weight (before stereo zeroing)
    wJz_d = w * Jz                                       # (E,2,HW)
    Cii = jnp.sum(wJz_d * Jz, axis=1)                    # (E,HW)
    bz = jnp.sum(wJz_d * r, axis=1)

    if stereo_rel is not None:
        # stereo edges constrain depth/scale only: zero their weight
        # for every pose-coupled block (H, v, Eiz, Ejz)
        w = w * (p.ii != p.jj).astype(w.dtype)[:, None, None]

    J2 = jnp.concatenate([Ji, Jj], axis=1).reshape(Ec, 12, 2 * HW)
    wflat = w.reshape(Ec, 1, 2 * HW)
    rflat = r.reshape(Ec, 2 * HW)
    wJ2 = wflat * J2

    H12 = jnp.einsum("eck,edk->ecd", wJ2, J2)            # (E,12,12)
    v12 = jnp.einsum("eck,ek->ec", wJ2, rflat)           # (E,12)
    Hii = H12[:, :6, :6]
    Hij = H12[:, :6, 6:]
    Hjj = H12[:, 6:, 6:]
    vi = v12[:, :6]
    vj = v12[:, 6:]

    wJz = w * Jz                                         # (E,2,HW)
    Eiz = jnp.einsum("exh,ecxh->ech", wJz, Ji)
    Ejz = jnp.einsum("exh,ecxh->ech", wJz, Jj)

    return (Hii, Hij, Hjj), (vi, vj), (Eiz, Ejz), (Cii, bz)


def _linearize_nhwc_ref(poses, disps, intrinsics, targets, weights,
                        p: DBAPlan):
    """Reference NHWC formulation (kept for parity testing)."""
    Ec = p.ii.shape[0]
    H, W = disps.shape[-2:]
    HW = H * W

    coords, valid, (Ji, Jj, Jz) = camera.projective_transform(
        poses, disps, intrinsics, p.ii, p.jj, jacobian=True)

    r = targets - coords
    w = 0.001 * valid * weights * p.edge_valid[:, None, None, None]

    Jif = Ji.reshape(Ec, HW * 2, 6)
    Jjf = Jj.reshape(Ec, HW * 2, 6)
    rf = r.reshape(Ec, HW * 2)
    wf = w.reshape(Ec, HW * 2)

    wJi = wf[..., None] * Jif
    wJj = wf[..., None] * Jjf

    Hii = jnp.einsum("enc,end->ecd", wJi, Jif)
    Hij = jnp.einsum("enc,end->ecd", wJi, Jjf)
    Hjj = jnp.einsum("enc,end->ecd", wJj, Jjf)
    vi = jnp.einsum("enc,en->ec", wJi, rf)
    vj = jnp.einsum("enc,en->ec", wJj, rf)

    w2 = w.reshape(Ec, HW, 2)
    r2 = r.reshape(Ec, HW, 2)
    Jz2 = Jz.reshape(Ec, HW, 2)
    Eiz = jnp.einsum("ehx,ehx,ehxc->ech", w2, Jz2, Ji.reshape(Ec, HW, 2, 6))
    Ejz = jnp.einsum("ehx,ehx,ehxc->ech", w2, Jz2, Jj.reshape(Ec, HW, 2, 6))
    Cii = jnp.einsum("ehx,ehx->eh", w2 * Jz2, Jz2)
    bz = jnp.einsum("ehx,ehx->eh", w2 * r2, Jz2)

    return (Hii, Hij, Hjj), (vi, vj), (Eiz, Ejz), (Cii, bz)


def assemble(blocks, p: DBAPlan, disps, eta, disps_sens, alpha=0.05,
             axis_name=None):
    """Assemble the window-local dense system.

    Returns Hd (P6, P6), vd (P6,), Ehat (P, K, 6, HW), C (K, HW), w (K, HW).

    ``axis_name``: set when the per-edge blocks are sharded over a
    device mesh axis (shard_map): the linear edge-sums are psum'd so the
    assembled system is replicated across shards.
    """
    (Hii, Hij, Hjj), (vi, vj), (Eiz, Ejz), (Cii, bz) = blocks
    P = p.px.shape[0]
    K = p.kx.shape[0]
    HW = Cii.shape[-1]

    # pose-pose blocks: keep only pairs fully inside the window
    # (SparseBlock.update_lhs drops negative indices)
    def pair_idx(a, b):
        ok = (a >= 0) & (b >= 0)
        return jnp.where(ok, a * P + b, -1)

    Hgrid = (_seg_mat(Hii, pair_idx(p.pi, p.pi), P * P)
             + _seg_mat(Hij, pair_idx(p.pi, p.pj), P * P)
             + _seg_mat(jnp.swapaxes(Hij, -1, -2), pair_idx(p.pj, p.pi), P * P)
             + _seg_mat(Hjj, pair_idx(p.pj, p.pj), P * P))
    Hgrid = Hgrid.reshape(P, P, 6, 6)
    v = _seg_mat(vi, p.pi, P) + _seg_mat(vj, p.pj, P)

    # depth data terms per depth slot
    C = _seg_mat(Cii, p.kk, K)
    w = _seg_mat(bz, p.kk, K)

    # pose-depth coupling tensor (summed here so one psum covers all
    # five edge-linear accumulators)
    def couple_idx(pp):
        ok = (pp >= 0) & (p.kk >= 0)
        return jnp.where(ok, pp * K + p.kk, -1)

    Ehat = (_seg_mat(Eiz, couple_idx(p.pi), P * K)
            + _seg_mat(Ejz, couple_idx(p.pj), P * K))

    if axis_name is not None:
        Hgrid, v, C, w, Ehat = jax.lax.psum((Hgrid, v, C, w, Ehat),
                                            axis_name)

    d_k = disps[p.kx].reshape(K, HW)
    s_k = disps_sens.reshape(K, HW)
    m = (s_k > 0).astype(C.dtype)
    C = C + m * alpha + (1 - m) * eta.reshape(K, HW)
    w = w - m * alpha * (d_k - s_k)
    # keep padded depth slots harmless
    C = jnp.where(p.k_valid[:, None] > 0, C, 1.0)
    w = w * p.k_valid[:, None]

    Ehat = Ehat.reshape(P, K, 6, HW)

    Hd = jnp.transpose(Hgrid, (0, 2, 1, 3)).reshape(P * 6, P * 6)
    vd = v.reshape(P * 6)
    return Hd, vd, Ehat, C, w


def _gauge_mask(Hd, vd, p: DBAPlan):
    """Freeze invalid + gauge-fixed pose slots: identity rows/cols, rhs 0."""
    P = p.px.shape[0]
    free = ((p.p_valid > 0) & (p.p_fixed == 0)).astype(Hd.dtype)
    fm = jnp.repeat(free, 6)                       # (P6,)
    Hd = Hd * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
    vd = vd * fm
    return Hd, vd, fm


def _sparse_schur(E_blocks, Q, w, p: DBAPlan, fm, P, D):
    """S and v_s from the coupling interaction list (EEt6x6/Ev6x1
    equivalent): O(pairs * 36 * HW) instead of O((PD)^2 * K * HW)."""
    Ec = p.pi.shape[0]
    cp_pose = jnp.concatenate([p.pi, p.pj])              # (2E,)
    cp_k = jnp.concatenate([p.kk, p.kk])
    E_all = jnp.concatenate(E_blocks, axis=0)            # (2E, 6, HW)

    free = fm.reshape(P, D)[:, 0]                        # (P,)
    cp_ok = ((cp_pose >= 0) & (cp_k >= 0)).astype(E_all.dtype)
    cp_ok = cp_ok * free[jnp.clip(cp_pose, 0, P - 1)]
    E_all = E_all * cp_ok[:, None, None]
    cp_pose_c = jnp.clip(cp_pose, 0, P - 1)
    cp_k_c = jnp.clip(cp_k, 0, Q.shape[0] - 1)

    # v_s = sum_c E_c (Q w)_k at cp_pose
    Qw = Q * w                                           # (K,HW)
    vs_c = jnp.einsum("cdh,ch->cd", E_all, Qw[cp_k_c])
    vs = _seg_mat(vs_c, jnp.where(cp_ok > 0, cp_pose_c, -1), P)

    # S: chunked pair contraction
    L = p.pair_a.shape[0]
    Lc = min(512, L)
    nch = L // Lc
    pa = p.pair_a.reshape(nch, Lc)
    pb = p.pair_b.reshape(nch, Lc)
    pv = p.pair_valid.reshape(nch, Lc)

    def body(acc, sl):
        pa_c, pb_c, pv_c = sl
        A = E_all[pa_c]                                  # (Lc, 6, HW)
        Bq = E_all[pb_c] * Q[cp_k_c[pb_c]][:, None, :]
        Sp = jnp.einsum("lch,ldh->lcd", A, Bq) * pv_c[:, None, None]
        idx = cp_pose_c[pa_c] * P + cp_pose_c[pb_c]
        idx = jnp.where(pv_c > 0, idx, -1)
        return acc + _seg_mat(Sp, idx, P * P), None

    S_grid, _ = jax.lax.scan(
        body, jnp.zeros((P * P, D, D), E_all.dtype), (pa, pb, pv))
    S = jnp.transpose(S_grid.reshape(P, P, D, D),
                      (0, 2, 1, 3)).reshape(P * D, P * D)
    return S, vs.reshape(P * D)


def solve_system(Hd, vd, Ehat, C, w, p: DBAPlan, ep=0.1, lm=1e-4,
                 E_blocks=None):
    """Schur-eliminate depths, solve the reduced camera system, and
    back-substitute.  Returns dx (P, 6), dz (K, HW), plus (S, L) of the
    damped RCM for covariance reuse.

    When the plan carries an interaction list and the raw per-edge
    coupling blocks (Eiz, Ejz) are provided, S is assembled sparsely
    (reference schur_block strategy) -- orders of magnitude fewer FLOPs
    than the dense (P,K) contraction at frontend sizes."""
    P, K, D, HW = Ehat.shape
    Q = 1.0 / C                                         # (K,HW)

    Hd, vd, fm = _gauge_mask(Hd, vd, p)
    # zero coupling rows of frozen poses
    Ehat = Ehat * fm.reshape(P, D)[:, None, :, None]

    if (p.pair_a is not None and p.pair_a.shape[0] > 0
            and E_blocks is not None):
        S, vs = _sparse_schur(E_blocks, Q, w, p, fm, P, D)
    else:
        # S = E Q E^T, v_s = E Q w (dense contraction)
        EQ = Ehat * Q[None, :, None, :]
        S = jnp.einsum("pkdh,qkeh->pdqe", EQ, Ehat).reshape(P * D, P * D)
        vs = jnp.einsum("pkdh,kh->pd", EQ, w).reshape(P * D)

    RCM = Hd - S
    rhs = vd - vs
    # damping as in SparseBlock::solve (droid_kernels.cu:1318-1340)
    diag = jnp.diagonal(RCM)
    RCMd = RCM + jnp.diag(ep + lm * diag)

    L = jnp.linalg.cholesky(RCMd)
    y = solve_triangular(L, rhs, lower=True)
    dx = solve_triangular(L.T, y, lower=False).reshape(P, D)
    # Cholesky failure tolerance (reference visual_frontend.py:1167-1176,
    # chol.py:8-18): zero step instead of NaN propagation
    dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)

    # dz = Q (w - E^T dx)   (EvT6x1 + accum, solve_depth_cuda)
    Etdx = jnp.einsum("pkdh,pd->kh", Ehat, dx.reshape(P, D))
    dz = Q * (w - Etdx) * p.k_valid[:, None]
    return dx, dz, L, Q


def covariances(L, Ehat, Q, p: DBAPlan):
    """Marginal pose and depth covariances from the damped RCM Cholesky.

    Returns pose_cov (P, 6, 6) (left-perturbation of cam_T_world, [v,w]
    order) and z_cov (K, HW) (inverse-depth variance).  Equivalent of
    visual_frontend.py:1164-1230 without materializing the (K,K,6,HW)
    tensor.
    """
    P, K, D, HW = Ehat.shape
    PD = P * D
    eye = jnp.eye(PD, dtype=L.dtype)
    Linv = solve_triangular(L, eye, lower=True)          # L^-1
    Sigma = Linv.T @ Linv                                # (L L^T)^-1
    pose_cov = jnp.diagonal(
        Sigma.reshape(P, D, P, D), axis1=0, axis2=2)     # (D, D, P)
    pose_cov = jnp.transpose(pose_cov, (2, 0, 1))
    # frozen/invalid slots carry a gauge identity row, not a real marginal;
    # report them as (near) perfectly known, like the reference's 1e-4-sigma
    # prior would
    free = ((p.p_valid > 0) & (p.p_fixed == 0)).astype(L.dtype)
    eye6 = jnp.eye(D, dtype=L.dtype)
    pose_cov = jnp.where(free[:, None, None] > 0, pose_cov, 1e-8 * eye6)

    # G = L^-1 E  -> z_cov = Q + Q^2 * sum_c G[c, k, h]^2
    Emat = jnp.transpose(Ehat, (0, 2, 1, 3)).reshape(PD, K * HW)
    G = Linv @ Emat                                      # (PD, K*HW)
    delta = jnp.sum(G * G, axis=0).reshape(K, HW)
    z_cov = Q + Q * Q * delta

    # Cholesky-failure tolerance, matching the solve path's zero-step
    # guard (solve_system): a non-finite factorization must not export
    # NaN covariances into persistent frontend state (ADVICE r1 #3).
    # Fall back to the data-term marginal Q and a loose pose prior.
    ok = jnp.all(jnp.isfinite(L))
    pose_cov = jnp.where(ok, pose_cov, eye6)
    z_cov = jnp.where(ok & jnp.isfinite(z_cov), z_cov, Q)
    return pose_cov, z_cov


class DBAResult(NamedTuple):
    poses: jax.Array       # (N, 7) updated buffer
    disps: jax.Array       # (N, H, W) updated buffer
    pose_cov: jax.Array    # (P, 6, 6)
    z_cov: jax.Array       # (K, H, W) inverse-depth variances
    flow_rms: jax.Array    # scalar diagnostic


def dba_iterations(poses, disps, intrinsics, targets, weights, eta,
                   disps_sens, p: DBAPlan, iters: int = 2,
                   ep: float = 0.1, lm: float = 1e-4,
                   compute_covariances: bool = True,
                   motion_only: bool = False,
                   with_final: bool = True,
                   stereo_rel=None, axis_name=None) -> DBAResult:
    """Run `iters` relinearized GN steps and (optionally) covariances.

    poses/disps are full keyframe buffers (N,7)/(N,H,W); only window
    slots are updated.  eta: (K, H, W) damping per depth slot,
    disps_sens: (K, H, W) sensed inverse depths (0 where absent).
    Static over (N, E, P, K, H, W, iters) -- jit-cache friendly.

    ``axis_name``: run edge-sharded under shard_map -- the plan's edge
    arrays and targets/weights hold the LOCAL shard, keyframe-major
    arrays are replicated, and assembly psums over the axis (the solve
    runs replicated on every shard).
    """
    Hh, Ww = disps.shape[-2:]
    K = p.kx.shape[0]

    def body(_, state):
        poses, disps = state
        blocks = linearize(poses, disps, intrinsics, targets, weights, p,
                           stereo_rel=stereo_rel)
        Hd, vd, Ehat, C, w = assemble(blocks, p, disps, eta, disps_sens,
                                      axis_name=axis_name)
        if motion_only:
            Hm, vm, fm = _gauge_mask(Hd, vd, p)
            diag = jnp.diagonal(Hm)
            Lm = jnp.linalg.cholesky(Hm + jnp.diag(ep + lm * diag))
            y = solve_triangular(Lm, vm, lower=True)
            dx = solve_triangular(Lm.T, y, lower=False).reshape(-1, 6)
            dz = jnp.zeros((K, Hh * Ww), dtype=disps.dtype)
        else:
            dx, dz, _, _ = solve_system(Hd, vd, Ehat, C, w, p, ep, lm,
                                        E_blocks=blocks[2])

        # retract poses (scatter into buffer at window slots).  px pads
        # by clipping at the top of the buffer, so invalid rows ALIAS the
        # last slot -- route them out of range (same hazard as kx_scatter)
        upd = se3.retr(poses[p.px], dx)
        mask = (p.p_valid * (1 - p.p_fixed))[:, None]
        upd = jnp.where(mask > 0, upd, poses[p.px])
        px_safe = jnp.where(p.p_valid > 0, p.px, poses.shape[0])
        poses = poses.at[px_safe].set(upd, mode="drop")

        # retract depths
        dnew = disps[p.kx] + dz.reshape(K, Hh, Ww)
        dnew = jnp.maximum(dnew, 0.001)  # clamp (visual_frontend.py:1162)
        disps = kx_scatter(disps, p.kx, p.k_valid, dnew)
        return poses, disps

    poses, disps = jax.lax.fori_loop(0, iters, body, (poses, disps))

    if not (with_final or compute_covariances):
        # hot loop: the caller only needs the retracted states
        P = p.px.shape[0]
        return DBAResult(
            poses=poses, disps=disps,
            pose_cov=jnp.zeros((P, 6, 6), dtype=poses.dtype),
            z_cov=jnp.ones((K, Hh, Ww), dtype=disps.dtype),
            flow_rms=jnp.zeros((), dtype=disps.dtype))

    # final linearization for covariances + diagnostics
    blocks = linearize(poses, disps, intrinsics, targets, weights, p,
                       stereo_rel=stereo_rel)
    Hd, vd, Ehat, C, w = assemble(blocks, p, disps, eta, disps_sens,
                                  axis_name=axis_name)
    coords, valid, _ = camera.projective_transform(
        poses, disps, intrinsics, p.ii, p.jj, stereo_rel=stereo_rel)
    r = (targets - coords) * valid * p.edge_valid[:, None, None, None]
    num = jnp.sum(r * r)
    den = jnp.sum(valid) * 2.0
    if axis_name is not None:
        num, den = jax.lax.psum((num, den), axis_name)
    flow_rms = jnp.sqrt(num / jnp.maximum(den, 1.0))

    if compute_covariances:
        eb = None if axis_name is not None else blocks[2]
        _, _, L, Q = solve_system(Hd, vd, Ehat, C, w, p, ep, lm,
                                  E_blocks=eb)
        pose_cov, z_cov = covariances(L, Ehat, Q, p)
    else:
        P = p.px.shape[0]
        pose_cov = jnp.zeros((P, 6, 6), dtype=poses.dtype)
        z_cov = jnp.ones((K, Hh * Ww), dtype=disps.dtype)

    return DBAResult(poses=poses, disps=disps, pose_cov=pose_cov,
                     z_cov=z_cov.reshape(K, Hh, Ww), flow_rms=flow_rms)


# ---------------------------------------------------------------------------
# packed plan transport
#
# On a remote-TPU link every host->device upload costs ~35 ms of stream
# time regardless of size, so the ~14 small index arrays of a DBAPlan are
# packed into ONE int32 vector host-side and unpacked with static slices
# inside the jitted consumer.
# ---------------------------------------------------------------------------

def pack_plan(plan_arrays, E: int, P: int, K: int, L: int) -> np.ndarray:
    """plan_arrays: dict of numpy arrays with DBAPlan field names
    (validity flags as 0/1).  Returns one int32 vector."""
    a = plan_arrays
    parts = [a["ii"], a["jj"], a["pi"], a["pj"], a["kk"],
             a["edge_valid"], a["px"], a["p_valid"], a["p_fixed"],
             a["kx"], a["k_valid"], a["pair_a"], a["pair_b"],
             a["pair_valid"]]
    sizes = [E, E, E, E, E, E, P, P, P, K, K, L, L, L]
    out = np.empty(sum(sizes), np.int32)
    o = 0
    for arr, n in zip(parts, sizes):
        assert arr.shape[0] == n, (arr.shape, n)
        out[o:o + n] = arr.astype(np.int32)
        o += n
    return out


def unpack_plan(vec: jax.Array, E: int, P: int, K: int) -> DBAPlan:
    """Inverse of pack_plan (jit-traceable; L inferred from length)."""
    L = (vec.shape[0] - 6 * E - 3 * P - 2 * K) // 3
    o = 0

    def take(n):
        nonlocal o
        out = vec[o:o + n]
        o += n
        return out

    f32 = jnp.float32
    return DBAPlan(
        ii=take(E), jj=take(E), pi=take(E), pj=take(E), kk=take(E),
        edge_valid=take(E).astype(f32),
        px=take(P), p_valid=take(P).astype(f32),
        p_fixed=take(P).astype(f32),
        kx=take(K), k_valid=take(K).astype(f32),
        pair_a=take(L), pair_b=take(L),
        pair_valid=take(L).astype(f32))
