"""RAFT visual frontend: the TPU-native tracking core.

Re-design of the reference ``RaftVisualFrontend``
(/root/reference/slam/visual_frontends/visual_frontend.py) for JAX:

  - all keyframe state lives in preallocated device buffers (the reference
    already preallocates, visual_frontend.py:162-237 -- a gift for XLA);
  - per-edge state (correlation pyramids, GRU hidden, flow targets) lives
    in padded (E_max, ...) buffers with host-side slot bookkeeping;
  - the hot loop -- reproject, corr lookup, ConvGRU, dense BA with
    covariances, convex upsampling -- is ONE jitted function
    (:meth:`_update_once`) whose shape signature never changes, so XLA
    compiles it exactly once per geometry;
  - keyframe accept/reject, graph edits and windowing are host decisions
    between jitted segments (SURVEY.md section 7.4 hard-part #3).

Differences from the reference, by design:
  - GTSAM is gone: the DBA solves the reduced camera system natively
    (solver/dba.py) in DROID [v,w]/left-retraction convention; pose
    covariances are exported in GTSAM [w,v] block order for packet parity.
  - correlation volumes are rebuilt (one batched matmul) on topology
    changes instead of incrementally concatenated -- cheaper on TPU than
    the bookkeeping it replaces.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import camera, se3, upsample
from ..models import DroidNet
from ..ops import corr
from ..solver import dba
from . import graph as graphlib


@dataclass(frozen=True)
class FrontendConfig:
    # capacities (static shapes)
    buffer: int = 64                 # keyframe buffer (reference arg)
    e_active: int = 64               # active edge slots (>= max_factors)
    e_inactive: int = 64             # inactive edge slots for BA reuse
    p_window: int = 32               # pose window slots
    k_depth: int = 48                # depth-map slots

    # reference frontend parameters (visual_frontend.py:92-131)
    keyframe_warmup: int = 8
    max_age: int = 25
    max_factors: int = 48
    motion_filter_thresh: float = 2.4
    keyframe_thresh: float = 4.0
    frontend_thresh: float = 16.0
    frontend_window: int = 25
    frontend_radius: int = 2
    frontend_nms: int = 1
    beta: float = 0.3
    iters1: int = 4
    iters2: int = 2
    gn_iters: int = 2
    dsf: int = 8
    lm: float = 1e-4
    ep: float = 0.1
    compute_covariances: bool = True
    # initial depth-variance prior (visual_frontend.py:148-151)
    sigma_idepth: float = 0.1


class KeyframeState(NamedTuple):
    """Per-keyframe device buffers (B = cfg.buffer)."""
    timestamps: jax.Array      # (B,)
    images: jax.Array          # (B, H, W, 3) uint8
    intrinsics: jax.Array      # (B, 4) at feature resolution
    gt_poses: jax.Array        # (B, 4, 4)
    gt_depths: jax.Array       # (B, H, W)
    cam_T_world: jax.Array     # (B, 7)
    pose_cov: jax.Array        # (B, 6, 6) [w,v] order (gtsam-style export)
    idepths: jax.Array         # (B, h, w)
    idepths_cov: jax.Array     # (B, h, w)
    depths_cov: jax.Array      # (B, h, w)
    idepths_sensed: jax.Array  # (B, h, w)
    idepths_up: jax.Array      # (B, H, W)
    depths_cov_up: jax.Array   # (B, H, W)
    damping: jax.Array         # (B, h, w) GRU-predicted eta
    features: jax.Array        # (B, h, w, 128) bf16
    contexts: jax.Array        # (B, h, w, 128) bf16 (tanh'd)
    cst_contexts: jax.Array    # (B, h, w, 128) bf16 (relu'd)


class EdgeState(NamedTuple):
    """Per-active-edge device buffers (Ea = cfg.e_active)."""
    hidden: jax.Array          # (Ea, h, w, 128) bf16 GRU hidden
    flow: jax.Array            # (Ea, h, w, 2) fp32 GRU flow targets
    flow_weight: jax.Array     # (Ea, h, w, 2) fp32
    corr_levels: Tuple[jax.Array, ...]   # pyramid, (Ea, h, w, h_l, w_l) bf16


class InactiveState(NamedTuple):
    flow: jax.Array            # (Ei, h, w, 2)
    flow_weight: jax.Array     # (Ei, h, w, 2)


def _cov_droid_to_gtsam(cov: jax.Array) -> jax.Array:
    """Reorder a 6x6 covariance from DROID [v,w] to GTSAM [w,v] blocks."""
    perm = jnp.array([3, 4, 5, 0, 1, 2])
    return cov[..., perm, :][..., :, perm]


class RaftVisualFrontend:
    """Tracking state machine.  Not a flax module: it owns device buffers
    and a DroidNet parameter pytree, and orchestrates jitted steps."""

    def __init__(self, params, cfg: FrontendConfig, image_size,
                 world_T_cam0_t0: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.net = DroidNet(dtype=jnp.bfloat16)
        self.params = params
        self.H, self.W = image_size
        self.h, self.w = self.H // cfg.dsf, self.W // cfg.dsf

        self.kf_idx = 0
        self.last_kf_idx = 0
        self.last_k: Optional[int] = None
        self.is_initialized = False
        self.stop = False
        self.kf_idx_to_f_idx: Dict[int, int] = {}
        self.f_idx_to_kf_idx: Dict[int, int] = {}

        self.graph = graphlib.CovisibilityGraph(max_factors=cfg.max_factors)
        self.world_T_cam0_t0 = (np.eye(4, dtype=np.float32)
                                if world_T_cam0_t0 is None
                                else np.asarray(world_T_cam0_t0))

        self.state = self._alloc_buffers()
        self.edges = self._alloc_edges()
        self.inactive = InactiveState(
            flow=jnp.zeros((cfg.e_inactive, self.h, self.w, 2)),
            flow_weight=jnp.zeros((cfg.e_inactive, self.h, self.w, 2)))
        self.viz_idx = np.zeros(cfg.buffer, dtype=bool)

        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # allocation
    # ------------------------------------------------------------------
    def _alloc_buffers(self) -> KeyframeState:
        cfg = self.cfg
        B, H, W, h, w = cfg.buffer, self.H, self.W, self.h, self.w
        f32 = jnp.float32
        init_pose = se3.from_matrix(
            jnp.asarray(np.linalg.inv(self.world_T_cam0_t0),
                        dtype=np.float32))
        idepth_cov0 = cfg.sigma_idepth ** 2
        return KeyframeState(
            timestamps=jnp.zeros((B,), f32),
            images=jnp.zeros((B, H, W, 3), jnp.uint8),
            intrinsics=jnp.zeros((B, 4), f32),
            gt_poses=jnp.tile(jnp.eye(4, dtype=f32), (B, 1, 1)),
            gt_depths=jnp.zeros((B, H, W), f32),
            cam_T_world=jnp.tile(init_pose, (B, 1)),
            pose_cov=jnp.tile(1e-4 * jnp.eye(6, dtype=f32), (B, 1, 1)),
            idepths=jnp.ones((B, h, w), f32),
            idepths_cov=idepth_cov0 * jnp.ones((B, h, w), f32),
            depths_cov=jnp.ones((B, h, w), f32),
            idepths_sensed=jnp.zeros((B, h, w), f32),
            idepths_up=jnp.zeros((B, H, W), f32),
            depths_cov_up=jnp.ones((B, H, W), f32),
            damping=1e-6 * jnp.ones((B, h, w), f32),
            features=jnp.zeros((B, h, w, 128), jnp.bfloat16),
            contexts=jnp.zeros((B, h, w, 128), jnp.bfloat16),
            cst_contexts=jnp.zeros((B, h, w, 128), jnp.bfloat16),
        )

    def _alloc_edges(self) -> EdgeState:
        cfg = self.cfg
        Ea, h, w = cfg.e_active, self.h, self.w
        levels = []
        hl, wl = h, w
        for _ in range(4):
            levels.append(jnp.zeros((Ea, h, w, hl, wl), jnp.bfloat16))
            hl, wl = hl // 2, wl // 2
        return EdgeState(
            hidden=jnp.zeros((Ea, h, w, 128), jnp.bfloat16),
            flow=jnp.zeros((Ea, h, w, 2)),
            flow_weight=jnp.zeros((Ea, h, w, 2)),
            corr_levels=tuple(levels))

    # ------------------------------------------------------------------
    # jitted primitives
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _encode(self, params, image_norm):
        """image_norm: (1, H, W, 3) -> features/context/cst (h, w, 128)."""
        f = self.net.apply(params, image_norm, method=DroidNet.features)
        c, ci = self.net.apply(params, image_norm, method=DroidNet.context)
        return f[0], c[0], ci[0]

    @partial(jax.jit, static_argnums=0)
    def _motion_mag(self, params, feat_last, feat_cur, ctx, cst):
        """Mean GRU flow-delta magnitude for the motion filter
        (visual_frontend.py:976-1007)."""
        f1 = feat_last.transpose(2, 0, 1)[None].astype(jnp.bfloat16)
        f2 = feat_cur.transpose(2, 0, 1)[None].astype(jnp.bfloat16)
        cp = corr.CorrPyramid.build(f1, f2)
        coords0 = camera.coords_grid(self.h, self.w)[None]
        cvals = cp(coords0).transpose(0, 2, 3, 1).astype(jnp.bfloat16)
        _, delta, _ = self.net.apply(
            params, ctx[None], cst[None], cvals, method=DroidNet.update)
        return jnp.mean(jnp.linalg.norm(delta, axis=-1))

    @partial(jax.jit, static_argnums=0)
    def _build_corr(self, features, ii, jj):
        """Rebuild the padded correlation pyramid for edges (ii, jj)."""
        f = features.transpose(0, 3, 1, 2)      # (B,128,h,w)
        return tuple(
            lv.astype(jnp.bfloat16)
            for lv in corr.build_pyramid(corr.build_volume(f[ii], f[jj])))

    @partial(jax.jit, static_argnums=0)
    def _distance(self, cam_T_world, idepths, intrinsics, ii, jj, beta):
        return camera.frame_distance_bidirectional(
            cam_T_world, idepths, intrinsics, ii, jj, beta)

    # the hot fused step ------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _update_once(self, params, state: KeyframeState, edges: EdgeState,
                     inactive: InactiveState, plan: dba.DBAPlan,
                     ii_act, jj_act, edge_on, seg, kx_up):
        """One GRU+DBA iteration over the active graph.

        ii_act/jj_act: (Ea,) active edge endpoints (padded); edge_on: (Ea,)
        1/0 validity; seg: (Ea,) depth-slot segment per active edge for
        GraphAgg pooling; kx_up: (K,) keyframe ids receiving upsampled
        depth products.  `plan` covers active+inactive slots (Ea+Ei),
        slot-aligned with [edges.flow ++ inactive.flow].
        Mirrors visual_frontend.update() (:370-470).
        """
        cfg = self.cfg
        h, w = self.h, self.w
        K = plan.kx.shape[0]

        # 1. reproject active edges
        coords1, _, _ = camera.projective_transform(
            state.cam_T_world, state.idepths, state.intrinsics,
            ii_act, jj_act)
        coords0 = camera.coords_grid(h, w)
        motion = jnp.concatenate(
            [coords1 - coords0, edges.flow - coords1], axis=-1)
        motion = jnp.clip(motion, -64.0, 64.0)

        # 2. correlation lookup
        cp = corr.CorrPyramid(list(edges.corr_levels))
        cvals = cp(coords1).transpose(0, 2, 3, 1)

        # 3. ConvGRU update
        hidden, delta, weight, eta, upmask = self.net.apply(
            params, edges.hidden,
            state.cst_contexts[ii_act],
            cvals.astype(jnp.bfloat16), motion.astype(jnp.bfloat16),
            seg, K, method=DroidNet.update)

        on = edge_on[:, None, None, None]
        flow = jnp.where(on > 0, coords1 + delta, edges.flow)
        flow_weight = jnp.where(on > 0, weight, edges.flow_weight)
        hidden = jnp.where(on > 0, hidden, edges.hidden)

        # damping buffer scatter (visual_frontend.py:411)
        damping = state.damping.at[kx_up].set(
            jnp.where(plan.k_valid[:, None, None] > 0, eta,
                      state.damping[kx_up]))

        # 4. DBA over active + inactive edges
        targets = jnp.concatenate([flow, inactive.flow], axis=0)
        weights = jnp.concatenate([flow_weight, inactive.flow_weight],
                                  axis=0)
        eta_k = 0.2 * damping[plan.kx] + 1e-7
        res = dba.dba_iterations(
            state.cam_T_world, state.idepths, state.intrinsics,
            targets, weights, eta_k, state.idepths_sensed[plan.kx],
            plan, iters=cfg.gn_iters, ep=cfg.ep, lm=cfg.lm,
            compute_covariances=cfg.compute_covariances)

        # 5. covariance export (touched keyframes only)
        pose_cov_g = _cov_droid_to_gtsam(res.pose_cov)
        pose_cov = state.pose_cov.at[plan.px].set(
            jnp.where((plan.p_valid[:, None, None] > 0), pose_cov_g,
                      state.pose_cov[plan.px]))
        idepths_cov = state.idepths_cov.at[plan.kx].set(
            jnp.where(plan.k_valid[:, None, None] > 0, res.z_cov,
                      state.idepths_cov[plan.kx]))
        d4 = jnp.maximum(res.disps[plan.kx], 1e-3) ** 4
        depths_cov_k = res.z_cov / d4
        depths_cov = state.depths_cov.at[plan.kx].set(
            jnp.where(plan.k_valid[:, None, None] > 0, depths_cov_k,
                      state.depths_cov[plan.kx]))

        # 6. convex upsampling of idepths + depth covs (:444-446)
        up_d = upsample.upsample_disp(res.disps[kx_up],
                                      upmask.transpose(0, 3, 1, 2)
                                      .reshape(K, 576, h, w))
        up_c = upsample.upsample_disp(depths_cov_k,
                                      upmask.transpose(0, 3, 1, 2)
                                      .reshape(K, 576, h, w), pow=1.0)
        kmask = plan.k_valid[:, None, None] > 0
        idepths_up = state.idepths_up.at[kx_up].set(
            jnp.where(kmask, up_d, state.idepths_up[kx_up]))
        depths_cov_up = state.depths_cov_up.at[kx_up].set(
            jnp.where(kmask, up_c, state.depths_cov_up[kx_up]))

        state = state._replace(
            cam_T_world=res.poses, idepths=res.disps, damping=damping,
            pose_cov=pose_cov, idepths_cov=idepths_cov,
            depths_cov=depths_cov, idepths_up=idepths_up,
            depths_cov_up=depths_cov_up)
        edges = edges._replace(hidden=hidden, flow=flow,
                               flow_weight=flow_weight)
        return state, edges, res.flow_rms

    # ------------------------------------------------------------------
    # host orchestration
    # ------------------------------------------------------------------
    def _normalize(self, image: np.ndarray) -> jax.Array:
        """uint8 (H,W,3) -> normalized float (1,H,W,3)
        (visual_frontend.py:964-973)."""
        x = jnp.asarray(image, dtype=jnp.float32) / 255.0
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        return ((x - mean) / std)[None]

    def _store_frame(self, k: int, slot: int, batch: Dict[str, Any],
                     encoded=None):
        """Write an incoming frame into keyframe buffers."""
        st = self.state
        img = np.asarray(batch["images"])[..., :3]
        updates = dict(
            timestamps=st.timestamps.at[slot].set(
                float(batch["t_cams"]) if batch.get("t_cams") is not None
                else float(k)),
            images=st.images.at[slot].set(jnp.asarray(img, jnp.uint8)),
            intrinsics=st.intrinsics.at[slot].set(
                jnp.asarray(batch["intrinsics"], jnp.float32)
                / self.cfg.dsf),
        )
        if batch.get("poses") is not None:
            updates["gt_poses"] = st.gt_poses.at[slot].set(
                jnp.asarray(batch["poses"], jnp.float32))
        if batch.get("depths") is not None:
            updates["gt_depths"] = st.gt_depths.at[slot].set(
                jnp.asarray(batch["depths"], jnp.float32))
            # sensed inverse depth at feature resolution (if provided)
        if batch.get("idepths_sensed") is not None:
            updates["idepths_sensed"] = st.idepths_sensed.at[slot].set(
                jnp.asarray(batch["idepths_sensed"], jnp.float32))
        self.state = st._replace(**updates)

        if encoded is None:
            encoded = self._encode(self.params, self._normalize(img))
        f, c, ci = encoded
        st = self.state
        self.state = st._replace(
            features=st.features.at[slot].set(f.astype(jnp.bfloat16)),
            contexts=st.contexts.at[slot].set(c.astype(jnp.bfloat16)),
            cst_contexts=st.cst_contexts.at[slot].set(
                ci.astype(jnp.bfloat16)))

    def has_enough_motion(self, feat_cur) -> bool:
        st = self.state
        mag = self._motion_mag(
            self.params, st.features[self.last_kf_idx].astype(jnp.float32),
            feat_cur, st.contexts[self.last_kf_idx],
            st.cst_contexts[self.last_kf_idx])
        return float(mag) > self.cfg.motion_filter_thresh

    # edge-state management --------------------------------------------
    def _pad_e(self, arr: np.ndarray, fill=0) -> jax.Array:
        out = np.full((self.cfg.e_active,), fill, dtype=np.int32)
        out[: arr.shape[0]] = arr
        return jnp.asarray(out)

    def _sync_edges_after_change(self, keep: Optional[np.ndarray],
                                 new_ii: np.ndarray, new_jj: np.ndarray,
                                 n_before: int):
        """Compact surviving per-edge state and append new edges."""
        cfg = self.cfg
        Ea = cfg.e_active
        g = self.graph
        n_now = g.n_edges

        # gather surviving slots to the front
        if keep is not None and (len(keep) != n_before
                                 or not np.all(keep == np.arange(n_before))):
            idx = np.zeros(Ea, dtype=np.int32)
            idx[:len(keep)] = keep
            gidx = jnp.asarray(idx)
            self.edges = EdgeState(
                hidden=self.edges.hidden[gidx],
                flow=self.edges.flow[gidx],
                flow_weight=self.edges.flow_weight[gidx],
                corr_levels=self.edges.corr_levels)  # rebuilt below

        n_new = new_ii.shape[0]
        if n_new:
            s0 = n_now - n_new
            slots = jnp.arange(s0, n_now)
            st = self.state
            ii_j = jnp.asarray(new_ii.astype(np.int32))
            # init hidden from contexts, flow from reprojection (:846-862)
            target, _, _ = camera.projective_transform(
                st.cam_T_world, st.idepths, st.intrinsics,
                ii_j, jnp.asarray(new_jj.astype(np.int32)))
            self.edges = self.edges._replace(
                hidden=self.edges.hidden.at[slots].set(
                    st.contexts[ii_j]),
                flow=self.edges.flow.at[slots].set(target),
                flow_weight=self.edges.flow_weight.at[slots].set(0.0))

        # rebuild corr pyramid for the active set (one batched matmul)
        ii_pad = self._pad_e(g.ii.astype(np.int32))
        jj_pad = self._pad_e(g.jj.astype(np.int32))
        levels = self._build_corr(self.state.features, ii_pad, jj_pad)
        self.edges = self.edges._replace(corr_levels=levels)

    def add_factors(self, ii, jj, remove: bool = False):
        """visual_frontend.py:806-862."""
        g = self.graph
        cfg = self.cfg
        ii, jj = g.filter_repeated(np.asarray(ii), np.asarray(jj))
        if ii.shape[0] == 0:
            return
        keep = np.arange(g.n_edges)
        n_before = g.n_edges
        if (cfg.max_factors > 0
                and g.n_edges + ii.shape[0] > cfg.max_factors and remove):
            # drop the oldest edges to make room (visual_frontend.py:826-828)
            rank = np.empty(g.n_edges, np.int64)
            rank[np.argsort(g.age, kind="stable")] = np.arange(g.n_edges)
            drop = rank >= (cfg.max_factors - ii.shape[0])
            self._store_inactive_flows(np.nonzero(drop)[0])
            keep = g.rm_edges(drop, store=True)
            self._spill_inactive()
        g.add_edges(ii, jj)
        self._sync_edges_after_change(keep, ii, jj, n_before)

    def _spill_inactive(self):
        """Move stored flows of newly-inactivated edges into the padded
        inactive buffers (FIFO capped at e_inactive)."""
        g = self.graph
        n = min(g.n_inactive, self.cfg.e_inactive)
        if g.n_inactive > self.cfg.e_inactive:
            # FIFO: keep the most recent
            g.ii_inactive = g.ii_inactive[-n:]
            g.jj_inactive = g.jj_inactive[-n:]
        # flows for inactive edges were captured at rm time by caller

    def rm_factors(self, mask: np.ndarray, store: bool):
        g = self.graph
        n_before = g.n_edges
        mask = np.asarray(mask, dtype=bool)
        if n_before == 0 or not mask.any():
            return
        if store and mask.any():
            # capture flows before compaction
            idx = np.nonzero(mask)[0]
            self._store_inactive_flows(idx)
        keep = g.rm_edges(mask, store=store)
        self._spill_inactive()
        if n_before:
            self._sync_edges_after_change(
                keep, np.zeros(0, np.int64), np.zeros(0, np.int64),
                n_before)

    def _store_inactive_flows(self, idx: np.ndarray):
        """Append flows of edges `idx` to the inactive ring."""
        Ei = self.cfg.e_inactive
        n_new = len(idx)
        gidx = jnp.asarray(idx.astype(np.int32))
        newf = self.edges.flow[gidx]
        neww = self.edges.flow_weight[gidx]
        # shift ring: drop oldest if overflow
        n_old = min(self.graph.n_inactive, Ei)  # count before this append
        total = n_old + n_new
        if total > Ei:
            shift = total - Ei
            self.inactive = InactiveState(
                flow=jnp.roll(self.inactive.flow, -shift, axis=0),
                flow_weight=jnp.roll(self.inactive.flow_weight, -shift,
                                     axis=0))
            n_old -= shift
        slots = jnp.arange(n_old, n_old + n_new)
        self.inactive = InactiveState(
            flow=self.inactive.flow.at[slots].set(newf),
            flow_weight=self.inactive.flow_weight.at[slots].set(neww))

    # the reference's update() ------------------------------------------
    def update(self, use_inactive: bool = True):
        cfg = self.cfg
        g = self.graph
        if g.n_edges == 0:
            return None
        kf0 = max(0, int(g.ii.min()))
        kf1 = max(int(g.ii.max()), int(g.jj.max())) + 1

        # merge inactive edges near the window (visual_frontend.py:420-424)
        # -- inactive slot i holds flows for g.{ii,jj}_inactive[i], so the
        # validity mask must stay slot-aligned
        Ea, Ei = cfg.e_active, cfg.e_inactive
        ii_all = np.zeros(Ea + Ei, np.int64)
        jj_all = np.zeros(Ea + Ei, np.int64)
        valid_all = np.zeros(Ea + Ei, bool)
        n_act = g.n_edges
        ii_all[:n_act] = g.ii
        jj_all[:n_act] = g.jj
        valid_all[:n_act] = True
        n_in = g.n_inactive
        if use_inactive and n_in:
            m = (g.ii_inactive >= kf0 - 3) & (g.jj_inactive >= kf0 - 3)
            ii_all[Ea:Ea + n_in] = g.ii_inactive
            jj_all[Ea:Ea + n_in] = g.jj_inactive
            valid_all[Ea:Ea + n_in] = m

        plan = self._slot_aligned_plan(ii_all, jj_all, valid_all, kf0, kf1)

        # seg: depth-slot of each active edge for GraphAgg
        kx = np.asarray(plan.kx)
        kmap = {int(kx[i]): i for i in range(kx.shape[0])
                if plan.k_valid[i] > 0}
        seg = np.full(Ea, -1, np.int32)
        for e in range(n_act):
            seg[e] = kmap.get(int(g.ii[e]), -1)

        edge_on = np.zeros(Ea, np.float32)
        edge_on[:n_act] = 1.0

        state, edges, flow_rms = self._update_once(
            self.params, self.state, self.edges, self.inactive, plan,
            jnp.asarray(ii_all[:Ea].astype(np.int32)),
            jnp.asarray(jj_all[:Ea].astype(np.int32)),
            jnp.asarray(edge_on), jnp.asarray(seg), plan.kx)
        self.state = state
        self.edges = edges
        g.age += 1
        self.viz_idx[kf0:self.kf_idx + 1] = True
        return float(flow_rms)

    def _slot_aligned_plan(self, ii_all, jj_all, valid_all, kf0, kf1):
        """Like dba.plan but keeping edges at their slot positions."""
        cfg = self.cfg
        E = ii_all.shape[0]
        P, K = cfg.p_window, cfg.k_depth
        kf_ids = np.unique(np.concatenate(
            [np.arange(kf0, kf1), ii_all[valid_all]]))
        if kf_ids.shape[0] > K:
            raise ValueError(f"{kf_ids.shape[0]} depth maps > capacity {K}")
        kmap = {int(kk): i for i, kk in enumerate(kf_ids)}
        pi = np.where(valid_all & (ii_all >= kf0) & (ii_all < kf1),
                      ii_all - kf0, -1)
        pj = np.where(valid_all & (jj_all >= kf0) & (jj_all < kf1),
                      jj_all - kf0, -1)
        kk = np.array([kmap.get(int(i), -1) if v else -1
                       for i, v in zip(ii_all, valid_all)], np.int32)
        px = np.arange(kf0, kf0 + P)
        p_valid = (px < kf1).astype(np.float32)
        p_fixed = np.zeros(P, np.float32)
        if kf0 == 0:
            p_fixed[0] = 1.0
        kx = np.zeros(K, np.int32)
        kx[:kf_ids.shape[0]] = kf_ids
        k_valid = np.zeros(K, np.float32)
        k_valid[:kf_ids.shape[0]] = 1.0
        return dba.DBAPlan(
            ii=jnp.asarray(np.where(valid_all, ii_all, 0).astype(np.int32)),
            jj=jnp.asarray(np.where(valid_all, jj_all, 0).astype(np.int32)),
            pi=jnp.asarray(pi.astype(np.int32)),
            pj=jnp.asarray(pj.astype(np.int32)),
            kk=jnp.asarray(kk),
            edge_valid=jnp.asarray(valid_all.astype(np.float32)),
            px=jnp.asarray(np.clip(px, 0, cfg.buffer - 1).astype(np.int32)),
            p_valid=jnp.asarray(p_valid),
            p_fixed=jnp.asarray(p_fixed),
            kx=jnp.asarray(kx),
            k_valid=jnp.asarray(k_valid))

    # keyframe-level ops ------------------------------------------------
    def distance(self, ii, jj) -> np.ndarray:
        st = self.state
        d = self._distance(st.cam_T_world, st.idepths, st.intrinsics,
                           jnp.asarray(np.asarray(ii, np.int32)),
                           jnp.asarray(np.asarray(jj, np.int32)),
                           self.cfg.beta)
        return np.asarray(d)

    def add_neighborhood_factors(self, kf0, kf1, radius=3):
        ii, jj = graphlib.neighborhood_edges(kf0, kf1, radius)
        self.add_factors(ii, jj)

    def add_proximity_factors(self, kf0=0, kf1=0, rad=2, nms=2,
                              beta=0.3, thresh=16.0, remove=False):
        t = self.kf_idx + 1
        ix = np.arange(kf0, t)
        jx = np.arange(kf1, t)
        ii_g, jj_g = np.meshgrid(ix, jx, indexing="ij")
        d = self.distance(ii_g.ravel(), jj_g.ravel())
        ii, jj = graphlib.proximity_edges(
            self.graph, d, self.kf_idx, kf0, kf1, rad, nms, thresh,
            self.cfg.max_factors, stereo=False)
        if ii.shape[0]:
            self.add_factors(ii, jj, remove)

    def rm_keyframe(self, kf_idx: int):
        """visual_frontend.py:529-574: roll buffers down over kf_idx."""
        st = self.state
        B = self.cfg.buffer
        perm = np.arange(B)
        perm[kf_idx:-1] = np.arange(kf_idx + 1, B)
        gidx = jnp.asarray(perm.astype(np.int32))
        self.state = jax.tree.map(lambda a: a[gidx], st)

        idx_in_before = self.graph.n_inactive
        # capture active flows that will be dropped
        m_act = (self.graph.ii == kf_idx) | (self.graph.jj == kf_idx)
        keep_act, keep_in = self.graph.rm_keyframe_reindex(kf_idx)
        # compact inactive flow buffers
        if len(keep_in) != idx_in_before:
            idx = np.zeros(self.cfg.e_inactive, np.int32)
            idx[:len(keep_in)] = keep_in
            gi = jnp.asarray(idx)
            self.inactive = InactiveState(
                flow=self.inactive.flow[gi],
                flow_weight=self.inactive.flow_weight[gi])
        self._sync_edges_after_change(
            keep_act, np.zeros(0, np.int64), np.zeros(0, np.int64),
            len(keep_act) + int(m_act.sum()))

    # top-level state machine -------------------------------------------
    def __call__(self, k: int, batch: Dict[str, Any]):
        """Process frame k.  batch: images (H,W,3) uint8, intrinsics (4,),
        optional poses (4,4), depths (H,W), t_cams, is_last_frame.
        Returns a viz packet dict or None."""
        cfg = self.cfg

        if self.last_k is None:
            assert k == 0 and self.kf_idx == 0
            self._store_frame(k, 0, batch)
            self.last_k = k
            self.last_kf_idx = 0
            self.kf_idx_to_f_idx[0] = k
            self.f_idx_to_kf_idx[k] = 0
            out = self.get_viz_out(batch)
            self.kf_idx = 1
            return out

        assert self.kf_idx < cfg.buffer

        norm = self._normalize(np.asarray(batch["images"])[..., :3])
        encoded = self._encode(self.params, norm)
        if not self.has_enough_motion(encoded[0].astype(jnp.float32)):
            if batch.get("is_last_frame"):
                self.kf_idx -= 1
                self.terminate()
                return self.get_viz_out(batch)
            return None

        self._store_frame(k, self.kf_idx, batch, encoded=encoded)
        self.kf_idx_to_f_idx[self.kf_idx] = k
        self.f_idx_to_kf_idx[k] = self.kf_idx

        if not self.is_initialized:
            if self.kf_idx >= cfg.keyframe_warmup:
                self.__initialize()
        else:
            if not self.__update():
                self.rm_keyframe(self.kf_idx - 1)
                return None

        self.last_k = k
        self.last_kf_idx = self.kf_idx
        out = self.get_viz_out(batch)

        if self.kf_idx + 1 >= cfg.buffer or batch.get("is_last_frame"):
            self.terminate()
            return self.get_viz_out(batch) or out

        self.kf_idx += 1
        return out

    def __initialize(self):
        cfg = self.cfg
        self.add_neighborhood_factors(0, self.kf_idx, radius=3)
        for _ in range(8):
            self.update(use_inactive=True)
        self.add_proximity_factors(0, 0, rad=2, nms=2,
                                   thresh=cfg.frontend_thresh, remove=False)
        for _ in range(8):
            self.update(use_inactive=True)

        st = self.state
        nxt = self.kf_idx + 1
        if nxt < cfg.buffer:
            self.state = st._replace(
                cam_T_world=st.cam_T_world.at[nxt].set(
                    st.cam_T_world[self.kf_idx]),
                idepths=st.idepths.at[nxt].set(
                    st.idepths[self.kf_idx - 3:self.kf_idx + 1].mean()),
                idepths_cov=st.idepths_cov.at[nxt].set(
                    st.idepths_cov[self.kf_idx - 3:self.kf_idx + 1]
                    .mean()),
                depths_cov=st.depths_cov.at[nxt].set(
                    st.depths_cov[self.kf_idx - 3:self.kf_idx + 1].mean()))
        self.is_initialized = True
        self.viz_idx[: self.kf_idx + 1] = True
        self.rm_factors(
            np.asarray(self.graph.ii < (cfg.keyframe_warmup - 4)),
            store=True)

    def __update(self) -> bool:
        cfg = self.cfg
        if self.graph.n_edges:
            self.rm_factors(np.asarray(self.graph.age > cfg.max_age),
                            store=True)
        self.add_proximity_factors(
            kf0=self.kf_idx - 4,
            kf1=max(self.kf_idx + 1 - cfg.frontend_window, 0),
            rad=cfg.frontend_radius, nms=cfg.frontend_nms,
            thresh=cfg.frontend_thresh, beta=cfg.beta, remove=True)

        st = self.state
        self.state = st._replace(idepths=st.idepths.at[self.kf_idx].set(
            jnp.where(st.idepths_sensed[self.kf_idx] > 0,
                      st.idepths_sensed[self.kf_idx],
                      st.idepths[self.kf_idx])))

        for _ in range(cfg.iters1):
            self.update(use_inactive=True)

        d = self.distance([self.kf_idx - 2], [self.kf_idx - 1])
        if float(d[0]) < cfg.keyframe_thresh:
            return False

        for _ in range(cfg.iters2):
            self.update(use_inactive=True)

        nxt = self.kf_idx + 1
        if nxt < cfg.buffer:
            st = self.state
            self.state = st._replace(
                cam_T_world=st.cam_T_world.at[nxt].set(
                    st.cam_T_world[self.kf_idx]),
                pose_cov=st.pose_cov.at[nxt].set(
                    st.pose_cov[self.kf_idx]),
                idepths=st.idepths.at[nxt].set(
                    st.idepths[self.kf_idx].mean()),
                idepths_cov=st.idepths_cov.at[nxt].set(
                    st.idepths_cov[self.kf_idx]),
                depths_cov=st.depths_cov.at[nxt].set(
                    st.depths_cov[self.kf_idx]))
        return True

    def terminate(self):
        """End of sequence: flag the whole map for a final viz packet
        (the reference's backend() does the same via viz_idx, :1295)."""
        self.viz_idx[: self.kf_idx + 1] = True
        self.stop = True

    def stop_condition(self) -> bool:
        return self.stop

    def get_viz_out(self, batch) -> Optional[Dict[str, Any]]:
        """Output packet (visual_frontend.py:1337-1391 contract)."""
        idx = np.nonzero(self.viz_idx)[0]
        if idx.size == 0:
            if batch.get("is_last_frame"):
                return {"is_last_frame": True}
            return None
        sel = jnp.asarray(idx.astype(np.int32))
        st = self.state
        out = {
            "cam0_poses": st.cam_T_world[sel],
            "gt_poses": st.gt_poses[sel],
            "gt_depths": st.gt_depths[sel],
            "world_T_body": se3.inv(st.cam_T_world[sel]),
            "world_T_body_cov": st.pose_cov[sel],
            "cam0_idepths": st.idepths[sel],
            "cam0_idepths_up": st.idepths_up[sel],
            "cam0_idepths_sensed": st.idepths_sensed[sel],
            "cam0_idepths_cov": st.idepths_cov[sel],
            "cam0_depths_cov": st.depths_cov[sel],
            "cam0_depths_cov_up": st.depths_cov_up[sel],
            "cam0_images": st.images[sel],
            "cam0_intrinsics": st.intrinsics[sel],
            "viz_idx": idx,
            "kf_idx": self.kf_idx,
            "kf_idx_to_f_idx": dict(self.kf_idx_to_f_idx),
            "is_last_frame": bool(batch.get("is_last_frame", False)),
        }
        self.viz_idx[:] = False
        return out
