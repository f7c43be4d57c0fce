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
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import camera, se3, upsample
from ..models import DroidNet
from ..ops import corr
from ..ops import corr_pallas
from ..solver import dba
from ..utils.runtime import count_dispatch, count_sync
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
    # BA depth damping = damping_scale * eta + damping_offset.  The
    # reference frontend uses 0.2*eta + 1e-7 (visual_frontend.py:437)
    # while its training forward feeds eta directly -- weights trained
    # with our in-repo trainer track better with scale 1.0.
    damping_scale: float = 0.2
    damping_offset: float = 1e-7
    compute_covariances: bool = True
    corr_impl: str = "pallas4g"     # hot-loop lookup kernel:
                                    # "pallas4g" (grouped weighted-hot,
                                    # pooled slabs) | "pallas" (single
                                    # l0 slab) | "pallas_grouped" |
                                    # "onehot"
    schur_impl: str = "dense"       # "dense" (one MXU matmul) | "sparse"
                                    # (reference-style interaction list)
    # timing-isolation knobs (compile-time): replace a stage with a
    # cheap stand-in so its cost shows up as a marginal difference
    debug_skip_gru: bool = False
    debug_skip_dba: bool = False
    debug_skip_lookup: bool = False
    global_ba: bool = False          # run backend() at terminate (:73)
    # initial depth-variance prior (visual_frontend.py:148-151)
    sigma_idepth: float = 0.1
    # stereo (reference visual_frontend.py:87, 206, 839-841): keyframes
    # carry a second (right-camera) feature map; the graph adds (i, i)
    # STEREO edges whose correlation targets cam1 and whose relative
    # pose is pinned to `stereo_rel` (cam1_T_cam0, [t, q_xyzw]); in the
    # DBA they constrain depth/scale only (droid_kernels.cu:367, 432)
    stereo: bool = False
    stereo_rel: tuple = (-0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0)
    # RGB-D: seed metric sensed inverse depths from packet depths (the
    # reference's cam0_idepths_sensed path for TUM/RealSense-style
    # datasets, visual_frontend.py:598-602); anchors the monocular gauge
    rgbd: bool = False
    # incremental correlation rebuild: when an edge sync adds at most
    # this many NEW edges, the fused maintenance gathers surviving
    # volumes and builds only the new slots' pyramids (the all-pairs
    # build is the per-keyframe hot-loop's single most expensive stage:
    # ~5.8 bf16 TFLOP for 48 edges at 42x80 -- near the MXU roofline,
    # so the only way to go faster is to not rebuild unchanged edges).
    # Syncs with more new edges, the standalone refresh path, and
    # rm_keyframe's flush all keep the full rebuild.  0 disables.
    e_rebuild: int = 16
    # multi-chip: shard the fused GRU+DBA update over `edge_shards`
    # devices along the edge axis (SURVEY.md 2.3's intra-op parallelism
    # as a jax.sharding mesh): per-edge correlation lookup, GRU and
    # linearization run on local shards, the assembled normal equations
    # are psum'd over ICI, and the (tiny) solve replicates.  1 = off.
    edge_shards: int = 1


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
    features1: jax.Array       # (B, h, w, 128) bf16 right-camera
                               # features (stereo; (B,1,1,1) dummy mono)


class EdgeState(NamedTuple):
    """Per-active-edge device buffers (Ea = cfg.e_active)."""
    hidden: jax.Array          # (Ea, h, w, 128) bf16 GRU hidden
    flow: jax.Array            # (Ea, h, w, 2) fp32 GRU flow targets
    flow_weight: jax.Array     # (Ea, h, w, 2) fp32
    corr_levels: Tuple[jax.Array, ...]   # pyramid, (Ea, h, w, h_l, w_l) bf16


class InactiveState(NamedTuple):
    flow: jax.Array            # (Ei, h, w, 2)
    flow_weight: jax.Array     # (Ei, h, w, 2)


# fused proximity-prefetch grid capacity: ii spans [t-5, t) (+margin),
# jj spans the frontend window (<= 25 in the reference, BASELINE.md)
_PF_SI = 8
_PF_SJ = 32


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

        # Host pacing: one tiny fetch per keyframe keeps the dispatch
        # queue shallow.  Free-running dispatch on the remote-TPU client
        # measured ~5x SLOWER per keyframe than fetch-paced dispatch
        # (1482 vs 305 ms/kf, bench/profile_track3.py) -- deep queues
        # degrade the client.  Opt out with NERF_SLAM_TPU_NO_PACE=1.
        self._pace = not os.environ.get("NERF_SLAM_TPU_NO_PACE")
        self.world_T_cam0_t0 = (np.eye(4, dtype=np.float32)
                                if world_T_cam0_t0 is None
                                else np.asarray(world_T_cam0_t0))
        # Schur interaction-list padding (shape-stable jits; compute_pairs
        # grows to the next power of two if a dense window exceeds it)
        self._pair_pad = max(
            2048, int(2 ** np.ceil(np.log2(
                8 * (cfg.e_active + cfg.e_inactive)))))

        self._jit_cache: Dict[Any, Any] = {}
        self.reset()

        self.mesh = None
        if cfg.edge_shards > 1:
            n = cfg.edge_shards
            assert cfg.e_active % n == 0 and cfg.e_inactive % n == 0, \
                f"e_active/e_inactive must divide edge_shards={n}"
            devs = jax.devices()
            assert len(devs) >= n, \
                f"edge_shards={n} but only {len(devs)} devices"
            self.mesh = jax.sharding.Mesh(np.array(devs[:n]), ("edge",))

    def reset(self):
        """Fresh tracking state on the SAME instance: device buffers and
        host bookkeeping reinitialize, jit caches survive (every jit here
        keys on ``self``, so a new instance re-traces everything -- a
        long-lived instance processing many sequences is the deployment
        shape, and the bench's timed pass relies on it)."""
        cfg = self.cfg
        self.kf_idx = 0
        self.last_kf_idx = 0
        self.last_k: Optional[int] = None
        self.is_initialized = False
        self.stop = False
        self.last_kf_dist = float("inf")   # device scalar after update()
        self.kf_idx_to_f_idx: Dict[int, int] = {}
        self.f_idx_to_kf_idx: Dict[int, int] = {}
        self._host_intrinsics: Dict[int, np.ndarray] = {}
        self._dist_prefetch = None
        # lazy edge maintenance: topology changes and inactive-flow
        # captures queue here and ride the next update dispatch
        self._pending_gather: Optional[np.ndarray] = None
        self._pending_app: list = []
        self._pending_app_n_old = 0
        self._viz_pending = None   # (fields, idx) from a fused gather
        self.last_gba_scores = None  # (pre, post) global-BA consistency
        self._viz_idx_snapshot = None   # two-phase reject rollback
        self._synced_after_dispatch = True
        self.graph = graphlib.CovisibilityGraph(
            max_factors=cfg.max_factors)
        self.state, self.edges, self.inactive = self._alloc_all()
        self.viz_idx = np.zeros(cfg.buffer, dtype=bool)

    # ------------------------------------------------------------------
    # allocation
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _alloc_all(self):
        """All state buffers in ONE program: ~25 eager jnp.zeros/tile
        calls each compile a single-op XLA program otherwise (cold-
        warmup cost on a tunneled device; also one compile per test)."""
        cfg = self.cfg
        inactive = InactiveState(
            flow=jnp.zeros((cfg.e_inactive, self.h, self.w, 2)),
            flow_weight=jnp.zeros((cfg.e_inactive, self.h, self.w, 2)))
        return self._alloc_buffers(), self._alloc_edges(), inactive

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
            features1=(jnp.zeros((B, h, w, 128), jnp.bfloat16)
                       if cfg.stereo
                       else jnp.zeros((B, 1, 1, 1), jnp.bfloat16)),
        )

    def _alloc_edges(self) -> EdgeState:
        cfg = self.cfg
        Ea, h, w = cfg.e_active, self.h, self.w
        levels = []
        hl, wl = h, w
        n_lv = 1 if cfg.corr_impl == "pallas" else 4
        for _ in range(n_lv):
            hp = -(-hl // 8) * 8     # sublane-aligned rows
            levels.append(jnp.zeros((Ea, h, w, hp, wl), jnp.bfloat16))
            hl, wl = hl // 2, wl // 2
        return EdgeState(
            hidden=jnp.zeros((Ea, h, w, 128), jnp.bfloat16),
            flow=jnp.zeros((Ea, h, w, 2)),
            flow_weight=jnp.zeros((Ea, h, w, 2)),
            corr_levels=tuple(levels))

    # ------------------------------------------------------------------
    # jitted primitives
    # ------------------------------------------------------------------
    def _stereo_rel(self):
        """(7,) cam1_T_cam0 as a trace-time constant, or None (mono).
        Called inside jitted methods -- cfg is static there, so mono
        configs compile with zero stereo overhead."""
        if not self.cfg.stereo:
            return None
        return jnp.asarray(self.cfg.stereo_rel, jnp.float32)

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
        return self._motion_mag_inline(params, feat_last, feat_cur, ctx,
                                       cst)

    @partial(jax.jit, static_argnums=0)
    def _encode_motion(self, params, state: KeyframeState, last_kf,
                       image_norm):
        """Fused per-frame admission step: encode the frame AND compute
        the motion-filter magnitude against the last keyframe in ONE
        dispatch (the reference runs these as separate CUDA launches;
        here each dispatch rides a ~30 ms tunnel, so fusing halves the
        per-frame latency floor)."""
        f = self.net.apply(params, image_norm, method=DroidNet.features)
        c, ci = self.net.apply(params, image_norm, method=DroidNet.context)
        mag = self._motion_mag_inline(
            params, state.features[last_kf].astype(jnp.float32), f[0],
            state.contexts[last_kf], state.cst_contexts[last_kf])
        return f[0], c[0], ci[0], mag

    @partial(jax.jit, static_argnums=(0, 7), donate_argnums=1)
    def _ingest(self, state: KeyframeState, params, img_u8, gt_depth,
                small, slot, with_motion: bool, img1_u8=None):
        """ONE dispatch per incoming frame: normalize + feature/context
        encode (+ motion-filter magnitude vs the last keyframe) + buffer
        store.  Replaces the separate _encode/_encode_motion +
        _store_frame_jit dispatches; ``gt_depth`` arrives f16 (halves
        the dominant per-frame H2D upload).  The store is unconditional:
        on a motion-filter reject the slot simply holds a candidate that
        the next frame overwrites (nothing reads slot kf_idx until the
        host accepts the frame)."""
        image_norm = self._normalize_dev(img_u8)
        f = self.net.apply(params, image_norm,
                           method=DroidNet.features)[0]
        c, ci = self.net.apply(params, image_norm,
                               method=DroidNet.context)
        c, ci = c[0], ci[0]
        last_kf = small[22].astype(jnp.int32)
        if with_motion:
            mag = self._motion_mag_inline(
                params, state.features[last_kf].astype(jnp.float32), f,
                state.contexts[last_kf], state.cst_contexts[last_kf])
        else:
            mag = jnp.zeros((), jnp.float32)
        f1 = None
        if self.cfg.stereo and img1_u8 is not None:
            f1 = self.net.apply(params, self._normalize_dev(img1_u8),
                                method=DroidNet.features)[0]
        state = self._store_frame_body(state, slot, img_u8,
                                       gt_depth.astype(jnp.float32),
                                       small, f, c, ci, f1)
        return state, mag

    def _motion_mag_inline(self, params, feat_last, feat_cur, ctx, cst):
        f1 = feat_last.transpose(2, 0, 1)[None].astype(jnp.bfloat16)
        f2 = feat_cur.transpose(2, 0, 1)[None].astype(jnp.bfloat16)
        cp = corr_pallas.CorrPyramidPallas.from_volume(
            corr.build_volume(f1, f2))
        coords0 = camera.coords_grid(self.h, self.w)[None]
        cvals = cp.nhwc(coords0).astype(jnp.bfloat16)
        _, delta, _ = self.net.apply(
            params, ctx[None], cst[None], cvals, method=DroidNet.update)
        return jnp.mean(jnp.linalg.norm(delta, axis=-1))

    @partial(jax.jit, static_argnums=0)
    def _build_corr(self, features, ii, jj):
        """Rebuild the padded correlation pyramid for edges (ii, jj)."""
        f = features.transpose(0, 3, 1, 2)      # (B,128,h,w)
        n_lv = 1 if self.cfg.corr_impl == "pallas" else 4
        return tuple(corr.build_pyramid_bf16(f[ii], f[jj], n_lv,
                                             pad_rows_to=8))

    @partial(jax.jit, static_argnums=0)
    def _distance(self, cam_T_world, idepths, intrinsics, packed, beta):
        n = packed.shape[0] // 2
        return camera.frame_distance_bidirectional(
            cam_T_world, idepths, intrinsics, packed[:n], packed[n:],
            beta)

    @partial(jax.jit, static_argnums=0, donate_argnums=3)
    def _refresh_edges(self, params, state: KeyframeState,
                       edges: EdgeState, packed):
        """Standalone edge-state sync dispatch (rm_keyframe and the
        sharded path; the hot loop instead folds the sync into
        :meth:`_update_n` via :meth:`_maintenance`)."""
        Ea = self.cfg.e_active
        gather_idx = packed[:Ea]
        new_mask = packed[Ea:2 * Ea].astype(jnp.float32)
        ii_pad = packed[2 * Ea:3 * Ea]
        jj_pad = packed[3 * Ea:4 * Ea]
        return self._refresh_edges_body(state, edges, gather_idx,
                                        new_mask, ii_pad, jj_pad)

    def _refresh_edges_body(self, state: KeyframeState, edges: EdgeState,
                            gather_idx, new_mask, ii_pad, jj_pad):
        """Fused edge-state maintenance: compact surviving slots
        (gather_idx), initialize new slots (hidden from contexts, flow
        from reprojection, weight 0 -- visual_frontend.py:846-862), and
        rebuild the correlation pyramid for the active set.  One static
        shape regardless of how many edges changed."""
        hidden = edges.hidden[gather_idx]
        flow = edges.flow[gather_idx]
        flow_w = edges.flow_weight[gather_idx]

        target, _, _ = camera.projective_transform(
            state.cam_T_world, state.idepths, state.intrinsics,
            ii_pad, jj_pad, stereo_rel=self._stereo_rel())
        nm = new_mask[:, None, None, None]
        hidden = jnp.where(nm > 0, state.contexts[ii_pad], hidden)
        flow = jnp.where(nm > 0, target, flow)
        flow_w = jnp.where(nm > 0, 0.0, flow_w)

        levels = self._build_levels(state, ii_pad, jj_pad)
        return EdgeState(hidden=hidden, flow=flow, flow_weight=flow_w,
                         corr_levels=levels)

    def _build_levels(self, state: KeyframeState, ii, jj):
        """All-pairs correlation pyramids for edge endpoint lists
        (ii, jj) -- any length."""
        f = state.features.transpose(0, 3, 1, 2)
        fj = f[jj]
        if self.cfg.stereo:
            # stereo (i, i) edges correlate cam0 -> cam1 features
            # (visual_frontend.py:839-841 feature_img_jj indexing)
            f1 = state.features1.transpose(0, 3, 1, 2)
            st_m = (ii == jj)[:, None, None, None]
            fj = jnp.where(st_m, f1[jj], fj)
        n_lv = 1 if self.cfg.corr_impl == "pallas" else 4
        return tuple(corr.build_pyramid_bf16(f[ii], fj, n_lv,
                                             pad_rows_to=8))

    def _refresh_edges_incr_body(self, state: KeyframeState,
                                 edges: EdgeState, gather_idx, new_mask,
                                 ii_pad, jj_pad, rebuild_idx):
        """Incremental edge-state maintenance: identical hidden/flow
        handling to :meth:`_refresh_edges_body`, but the correlation
        pyramid is GATHERED for surviving slots (volume content depends
        on keyframe identity, which edge compaction preserves) and
        rebuilt only for the <= e_rebuild new slots listed in
        ``rebuild_idx`` (padded with Ea -> dropped by the scatter)."""
        Ea = self.cfg.e_active
        hidden = edges.hidden[gather_idx]
        flow = edges.flow[gather_idx]
        flow_w = edges.flow_weight[gather_idx]

        target, _, _ = camera.projective_transform(
            state.cam_T_world, state.idepths, state.intrinsics,
            ii_pad, jj_pad, stereo_rel=self._stereo_rel())
        nm = new_mask[:, None, None, None]
        hidden = jnp.where(nm > 0, state.contexts[ii_pad], hidden)
        flow = jnp.where(nm > 0, target, flow)
        flow_w = jnp.where(nm > 0, 0.0, flow_w)

        safe = jnp.clip(rebuild_idx, 0, Ea - 1)
        new_levels = self._build_levels(state, ii_pad[safe],
                                        jj_pad[safe])
        levels = tuple(
            lv[gather_idx].at[rebuild_idx].set(nl, mode="drop")
            for lv, nl in zip(edges.corr_levels, new_levels))
        return EdgeState(hidden=hidden, flow=flow, flow_weight=flow_w,
                         corr_levels=levels)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _append_inactive(self, inactive: InactiveState, flow_src,
                         w_src, idx_pad, n_old, n_new):
        """Standalone inactive-append dispatch (non-hot paths; the hot
        loop folds the append into :meth:`_update_n`)."""
        return self._append_inactive_body(inactive, flow_src, w_src,
                                          idx_pad, n_old, n_new)

    def _append_inactive_body(self, inactive: InactiveState, flow_src,
                              w_src, idx_pad, n_old, n_new):
        """Append n_new rows (gathered from flow_src at idx_pad[:n_new])
        to the inactive ring, shifting out the oldest on overflow.
        All shapes static; n_old/n_new are traced scalars."""
        Ei = inactive.flow.shape[0]
        shift = jnp.maximum(n_old + n_new - Ei, 0)
        base_f = jnp.roll(inactive.flow, -shift, axis=0)
        base_w = jnp.roll(inactive.flow_weight, -shift, axis=0)
        start = n_old - shift
        rows = jnp.arange(Ei)
        pos = jnp.where(rows < n_new, start + rows, Ei)  # Ei -> dropped
        new_f = flow_src[idx_pad]
        new_w = w_src[idx_pad]
        f = base_f.at[pos].set(new_f, mode="drop")
        w = base_w.at[pos].set(new_w, mode="drop")
        return InactiveState(flow=f, flow_weight=w)

    @partial(jax.jit, static_argnums=0)
    def _gather_viz(self, state: KeyframeState, sel):
        """Standalone viz gather (first frame, terminate packets and
        selections wider than V_VIZ; steady-state keyframes get the
        gather fused into :meth:`_update_n`)."""
        return self._gather_viz_body(state, sel)

    def _gather_viz_body(self, state: KeyframeState, sel):
        """Fixed-size viz gather (padded selection indices)."""
        return (state.cam_T_world[sel], state.gt_poses[sel],
                state.gt_depths[sel], se3.inv(state.cam_T_world[sel]),
                state.pose_cov[sel], state.idepths[sel],
                state.idepths_up[sel], state.idepths_sensed[sel],
                state.idepths_cov[sel], state.depths_cov[sel],
                state.depths_cov_up[sel], state.images[sel],
                state.intrinsics[sel])

    # the hot fused step ------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 6, 7, 8),
             donate_argnums=(2, 3, 4))
    def _update_n(self, params, state: KeyframeState, edges: EdgeState,
                  inactive: InactiveState, packed_plan,
                  light: bool = False, two_phase: bool = False,
                  with_motion: bool = False,
                  img_u8=None, gt16=None, small=None, img1_u8=None):
        """Dispatch the fused update: single-device, or shard_map'd over
        the edge axis of a device mesh (cfg.edge_shards > 1).

        Single-device, the ONE program additionally carries (gated by
        scalars in ``packed_plan``, each a lax.cond so skipped work costs
        nothing at runtime):
          - the pending inactive-flow append (pre-compaction edge slots),
          - the pending edge-state sync (compaction + new-edge init +
            correlation-pyramid rebuild),
          - the viz-packet gather of the final state,
          - optionally (``img_u8 is not None``) the FRAME INGEST itself:
            normalize + encode + buffer store run first, so a keyframe
            with the motion filter disabled costs ONE dispatch total,
          - optionally (``two_phase``) the keyframe accept/reject
            decision ON DEVICE: iters1, the rejection distance, then a
            lax.cond that either runs iters2 + the full export tail
            (accept) or stops (reject) -- collapsing the reference's
            light-update / host-sync / full-update sequence
            (visual_frontend.py:607-621) into one program whose host
            round trip happens once, after everything.
        """
        if self.mesh is None:
            ingest = None
            if img_u8 is not None:
                ingest = (img_u8, gt16, small, img1_u8)
            return self._update_core(params, state, edges, inactive,
                                     packed_plan, light, None,
                                     two_phase=two_phase, ingest=ingest,
                                     with_motion=with_motion)
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        fn = shard_map(
            lambda pa, st, ed, ia, pp: self._update_core(
                pa, st, ed, ia, pp, light, "edge"),
            mesh=self.mesh,
            in_specs=(P(), P(), P("edge"), P("edge"), P()),
            out_specs=(P(), P("edge"), P("edge"), P(), P(), P(), P(),
                       P()),
            check_rep=False)
        return fn(params, state, edges, inactive, packed_plan)

    # packed-plan prefix layout for the fused maintenance work; the tail
    # (DBA plan + 8 scalars) is unchanged.  V_VIZ is the fused viz-gather
    # capacity (larger selections fall back to the standalone gather).
    V_VIZ = 16

    def _prefix_len(self) -> int:
        cfg = self.cfg
        return 1 + 4 * cfg.e_active + cfg.e_rebuild + 1 + \
            cfg.e_inactive + 2 + self.V_VIZ + 1

    def _maintenance(self, state, edges: EdgeState,
                     inactive: InactiveState, prefix):
        """Apply the packed pending maintenance (inactive append + edge
        sync) inside the update jit.  Returns (edges, inactive)."""
        cfg = self.cfg
        Ea, Ei = cfg.e_active, cfg.e_inactive
        o = 0
        sync_on = prefix[o]; o += 1      # 0 none | 1 full | 2 incremental
        gather_idx = prefix[o:o + Ea]; o += Ea
        new_mask = prefix[o:o + Ea].astype(jnp.float32); o += Ea
        ii_pad = prefix[o:o + Ea]; o += Ea
        jj_pad = prefix[o:o + Ea]; o += Ea
        rebuild_idx = prefix[o:o + cfg.e_rebuild]; o += cfg.e_rebuild
        app_on = prefix[o]; o += 1
        app_idx = prefix[o:o + Ei]; o += Ei
        app_n_old = prefix[o]; o += 1
        app_n_new = prefix[o]; o += 1

        def do_append(ia):
            return self._append_inactive_body(
                ia, edges.flow, edges.flow_weight, app_idx, app_n_old,
                app_n_new)

        inactive = jax.lax.cond(app_on > 0, do_append, lambda ia: ia,
                                inactive)

        def do_sync(ed):
            def full(e):
                return self._refresh_edges_body(state, e, gather_idx,
                                                new_mask, ii_pad, jj_pad)

            if cfg.e_rebuild <= 0:
                return full(ed)

            def incr(e):
                return self._refresh_edges_incr_body(
                    state, e, gather_idx, new_mask, ii_pad, jj_pad,
                    rebuild_idx)

            return jax.lax.cond(sync_on == 2, incr, full, ed)

        edges = jax.lax.cond(sync_on > 0, do_sync, lambda ed: ed, edges)
        return edges, inactive

    def _update_core(self, params, state: KeyframeState,
                     edges: EdgeState, inactive: InactiveState,
                     packed_plan, light: bool, axis,
                     two_phase: bool = False, ingest=None,
                     with_motion: bool = False):
        """n_iters fused GRU+DBA iterations over the active graph.

        Equivalent to calling visual_frontend.update() (:370-470) n times,
        but compiled as ONE program: the per-call loop in the reference
        (iters1/iters2, :607-621) becomes a lax.while_loop, eliminating
        per-iteration dispatch and host transfers.  Covariances and
        convex upsampling run once after the loop (as the final
        reference iteration would).

        Fused per-keyframe tail work (each item replaces a separate
        dispatch + host upload the reference pays per keyframe):
          - keyframe-rejection distance (d_a, d_b) on the final state;
          - next-keyframe state seeding (visual_frontend.py:620-635);
          - the NEXT keyframe's proximity distance grid, prefetched on
            the seeded state so add_proximity_factors never blocks.

        ``light=True`` compiles a short variant for the pre-rejection
        update (iters1): it skips covariances, upsampling and all viz
        exports -- the accepting update (iters2) recomputes them anyway.

        ii_act/jj_act: (Ea,) active edge endpoints (padded); edge_on:
        (Ea,) 1/0 validity; seg: (Ea,) depth-slot per active edge for
        GraphAgg; `plan` covers active+inactive slots (Ea+Ei),
        slot-aligned with [edges.flow ++ inactive.flow].  n_iters is a
        traced scalar, so every iteration count reuses one executable.
        """
        cfg = self.cfg
        h, w = self.h, self.w
        Ea = cfg.e_active
        PRE = self._prefix_len()
        prefix = packed_plan[:PRE]
        viz_sel = prefix[PRE - 1 - self.V_VIZ:PRE - 1]
        n_iters = packed_plan[-12]
        n_iters2 = packed_plan[-11]       # accept-branch iters (two_phase)
        thr_x1024 = packed_plan[-10]      # keyframe_thresh * 1024
        mthr_x1024 = packed_plan[-9]      # motion_filter_thresh * 1024
        ingest_slot = packed_plan[-8]     # fused-ingest store slot
        seed_slot = packed_plan[-7]       # sensed-depth seed slot (-1: off)
        d_a = packed_plan[-6]             # keyframe-distance pair, computed
        d_b = packed_plan[-5]             # on the final state in this jit
        seed_next = packed_plan[-4]       # next-kf slot to seed (-1: off)
        t_g = packed_plan[-3]             # prox-prefetch grid scalars
        kf0_g = packed_plan[-2]
        kf1_g = packed_plan[-1]           # -1: prefetch off
        mag = jnp.zeros((), jnp.float32)
        if ingest is not None:
            # fused frame ingest: normalize + encode + store runs inside
            # THIS dispatch (new edges touching the incoming keyframe
            # read state.features after the store below); with_motion
            # additionally computes the motion-filter magnitude against
            # the last keyframe BEFORE the store, and the whole tracking
            # body below is lax.cond-gated on it -- a production frame
            # costs ONE dispatch and ONE sync total
            img_u8, gt16, small_arr, img1_u8 = ingest
            image_norm = self._normalize_dev(img_u8)
            f_in = self.net.apply(params, image_norm,
                                  method=DroidNet.features)[0]
            c_in, ci_in = self.net.apply(params, image_norm,
                                         method=DroidNet.context)
            if with_motion:
                last_kf = small_arr[22].astype(jnp.int32)
                mag = self._motion_mag_inline(
                    params, state.features[last_kf].astype(jnp.float32),
                    f_in, state.contexts[last_kf],
                    state.cst_contexts[last_kf])
            f1_in = None
            if cfg.stereo and img1_u8 is not None:
                f1_in = self.net.apply(params,
                                       self._normalize_dev(img1_u8),
                                       method=DroidNet.features)[0]
            state = self._store_frame_body(
                state, ingest_slot, img_u8, gt16.astype(jnp.float32),
                small_arr, f_in, c_in[0], ci_in[0], f1_in)
        plan = dba.unpack_plan(packed_plan[PRE:-12], Ea + cfg.e_inactive,
                               cfg.p_window, cfg.k_depth)
        if axis is not None:
            # edge-sharded execution (shard_map): localize the plan's
            # edge-major rows to this shard -- [local actives ++ local
            # inactives], matching the sharded EdgeState/InactiveState
            # blocks; keyframe-major arrays stay replicated.  The sparse
            # Schur pair list indexes global couplings, so sharded runs
            # use the dense coupling contraction.
            shards = cfg.edge_shards
            Ei = cfg.e_inactive
            ea_l, ei_l = Ea // shards, Ei // shards
            off = jax.lax.axis_index(axis)

            def act(a):
                return jax.lax.dynamic_slice_in_dim(a, off * ea_l, ea_l, 0)

            def both(a):
                ina = jax.lax.dynamic_slice_in_dim(
                    a, Ea + off * ei_l, ei_l, 0)
                return jnp.concatenate([act(a), ina], axis=0)

            plan = plan._replace(
                ii=both(plan.ii), jj=both(plan.jj), pi=both(plan.pi),
                pj=both(plan.pj), kk=both(plan.kk),
                edge_valid=both(plan.edge_valid),
                pair_a=None, pair_b=None, pair_valid=None)
            Ea = ea_l
        def _body(op):
            """The whole tracking body (maintenance -> iterations
            -> exports), cond-gated on the on-device motion filter
            when with_motion (a rejected frame skips all of it)."""
            state, edges, inactive = op
            if axis is None:
                edges, inactive = self._maintenance(state, edges,
                                                    inactive, prefix)
            # active-edge views (slot-aligned prefix of the plan)
            ii_act = plan.ii[:Ea]
            jj_act = plan.jj[:Ea]
            edge_on = plan.edge_valid[:Ea]
            seg = jnp.where(plan.edge_valid[:Ea] > 0, plan.kk[:Ea], -1)
            K = plan.kx.shape[0]
            coords0 = camera.coords_grid(h, w)
            if cfg.corr_impl == "pallas4g":
                # grouped weighted-hot kernel over 4 pooled slabs: measured
                # ~5x the single-slab variant (MXU-shaped block-diagonal
                # selects; bilinear folded into the one-hots).  Active edges
                # occupy the slot prefix, so the kernel skips compute + DMA
                # for padded slots (n_act gating) -- the lookup cost scales
                # with the LIVE graph, not the static capacity.
                dims = corr_pallas.pyramid_dims(h, w)
                n_act = jnp.sum(edge_on > 0).astype(jnp.int32)
                lookup_nhwc = lambda c: corr_pallas.lookup_pyramid_grouped4_nhwc(
                    edges.corr_levels, c, dims, n_act=n_act)
            elif cfg.corr_impl == "pallas":
                # single-slab path: levels 1-3 are derived from level 0
                # inside the kernel (pooling commutes with sampling)
                dims = corr_pallas.pyramid_dims(h, w)
                lookup_nhwc = lambda c: corr_pallas.lookup_pyramid_l0_nhwc(
                    edges.corr_levels[0], c, dims)
            elif cfg.corr_impl == "pallas_grouped":
                cp = corr_pallas.CorrPyramidPallas(
                    list(edges.corr_levels), grouped=True)
                lookup_nhwc = cp.nhwc
            else:
                cp = corr.CorrPyramid(list(edges.corr_levels))
                lookup_nhwc = lambda c: cp(c).transpose(0, 2, 3, 1)
            on = edge_on[:, None, None, None]
            ctx_inp = state.cst_contexts[ii_act]
            # context gate constants hoisted out of the iteration loop:
            # ctx_inp is constant across the round's 4-8 GRU iterations,
            # so its share of the gate convs (128 of 448 input channels)
            # runs ONCE here instead of per iteration
            gates_inp = None
            if not cfg.debug_skip_gru:
                gates_inp = self.net.apply(
                    params, ctx_inp, method=DroidNet.update_precompute)
            sens_k = state.idepths_sensed[plan.kx]

            stereo_rel = self._stereo_rel()

            def one_iter(carry):
                i, poses, disps, hidden, flow, flow_w, damping = carry

                coords1, _, _ = camera.projective_transform(
                    poses, disps, state.intrinsics, ii_act, jj_act,
                    stereo_rel=stereo_rel)
                motion = jnp.concatenate(
                    [coords1 - coords0, flow - coords1], axis=-1)
                motion = jnp.clip(motion, -64.0, 64.0)
                if cfg.debug_skip_lookup == "cheap":
                    # non-foldable stand-in: isolates the LOOKUP's own cost
                    # (zeros let XLA constant-fold the corr encoder away,
                    # over-attributing their cost to the lookup)
                    cvals = jnp.broadcast_to(motion[..., :1] * 0.01,
                                             (Ea, h, w, 196))
                elif cfg.debug_skip_lookup:
                    cvals = jnp.zeros((Ea, h, w, 196))
                else:
                    cvals = lookup_nhwc(coords1)

                if cfg.debug_skip_gru:
                    hidden2 = hidden + cvals[..., :128].astype(hidden.dtype) \
                        + motion[..., :1].astype(hidden.dtype)
                    delta = hidden2[..., :2].astype(jnp.float32)
                    weight = 0.5 * jnp.ones((Ea, h, w, 2))
                    eta = 0.01 * jnp.ones((K, h, w))
                else:
                    hidden2, delta, weight, eta = self.net.apply(
                        params, hidden, ctx_inp,
                        cvals.astype(jnp.bfloat16),
                        motion.astype(jnp.bfloat16),
                        seg, K, False, axis, gates_inp,
                        method=DroidNet.update)

                flow = jnp.where(on > 0, coords1 + delta, flow)
                flow_w = jnp.where(on > 0, weight, flow_w)
                hidden = jnp.where(on > 0, hidden2, hidden)

                # damping buffer scatter (visual_frontend.py:411);
                # invalid (padded) kx rows are dropped, never written
                damping = dba.kx_scatter(damping, plan.kx, plan.k_valid,
                                         eta)

                targets = jnp.concatenate([flow, inactive.flow], axis=0)
                weights = jnp.concatenate([flow_w, inactive.flow_weight],
                                          axis=0)
                eta_k = cfg.damping_scale * damping[plan.kx] \
                    + cfg.damping_offset
                if cfg.debug_skip_dba:
                    poses = poses + 1e-9 * jnp.sum(targets)
                    disps = disps + 1e-9 * jnp.sum(weights)
                else:
                    res = dba.dba_iterations(
                        poses, disps, state.intrinsics, targets, weights,
                        eta_k, sens_k, plan, iters=cfg.gn_iters, ep=cfg.ep,
                        lm=cfg.lm, compute_covariances=False,
                        with_final=False, stereo_rel=stereo_rel,
                        axis_name=axis)
                    poses, disps = res.poses, res.disps
                return (i + 1, poses, disps, hidden, flow, flow_w,
                        damping)

            # sensed-depth seeding of the new keyframe's inverse depths
            # (visual_frontend.py's pre-update seed), folded into this jit
            B = state.idepths.shape[0]
            sm = (jnp.arange(B) == seed_slot)[:, None, None]
            idepths0 = jnp.where(sm & (state.idepths_sensed > 0),
                                 state.idepths_sensed, state.idepths)

            carry = (jnp.zeros((), jnp.int32), state.cam_T_world,
                     idepths0, edges.hidden, edges.flow,
                     edges.flow_weight, state.damping)
            carry = jax.lax.while_loop(lambda c: c[0] < n_iters, one_iter,
                                       carry)

            # keyframe-rejection distance on the updated state, fused here so
            # the host's accept/reject branch costs no extra dispatch
            kf_dist = camera.frame_distance_bidirectional(
                carry[1], carry[2], state.intrinsics, d_a[None], d_b[None],
                cfg.beta)[0]

            def light_out(carry):
                # pre-rejection variant (and the two_phase reject branch):
                # poses/disps/edge state only -- an accepting update
                # recomputes covariances, upsampling, viz
                _, poses, disps, hidden, flow, flow_w, damping = carry
                st_l = state._replace(cam_T_world=poses, idepths=disps,
                                      damping=damping)
                ed_l = edges._replace(hidden=hidden, flow=flow,
                                      flow_weight=flow_w,
                                      corr_levels=edges.corr_levels)
                zero = jnp.zeros((), disps.dtype)
                # two_phase gathers the full viz selection for cond-branch
                # shape parity with full_out (discarded by the host on
                # reject); the plain light variant keeps the empty gather
                sel = viz_sel if two_phase else viz_sel[:0]
                return (st_l, ed_l, inactive, zero, kf_dist,
                        jnp.full((_PF_SI * _PF_SJ,), 1e6, disps.dtype),
                        self._gather_viz_body(st_l, sel))

            def full_out(carry):
                _, poses, disps, hidden, flow, flow_w, damping = carry
                # final linearization: covariances + diagnostics
                targets = jnp.concatenate([flow, inactive.flow], axis=0)
                weights = jnp.concatenate([flow_w, inactive.flow_weight],
                                          axis=0)
                eta_k = cfg.damping_scale * damping[plan.kx] \
                        + cfg.damping_offset
                blocks = dba.linearize(poses, disps, state.intrinsics,
                                       targets, weights, plan,
                                       stereo_rel=stereo_rel)
                Hd, vd, Ehat, C, wv = dba.assemble(blocks, plan, disps,
                                                   eta_k, sens_k,
                                                   axis_name=axis)
                if cfg.compute_covariances:
                    eb = (blocks[2] if cfg.schur_impl == "sparse"
                          and axis is None else None)
                    _, _, L, Q = dba.solve_system(Hd, vd, Ehat, C, wv, plan,
                                                  cfg.ep, cfg.lm,
                                                  E_blocks=eb)
                    pose_cov_p, z_cov = dba.covariances(L, Ehat, Q, plan)
                    z_cov = z_cov.reshape(K, h, w)
                else:
                    pose_cov_p = jnp.tile(1e-4 * jnp.eye(6),
                                          (plan.px.shape[0], 1, 1))
                    z_cov = jnp.ones((K, h, w))

                coords1, valid, _ = camera.projective_transform(
                    poses, disps, state.intrinsics, plan.ii, plan.jj,
                    stereo_rel=stereo_rel)
                r = (targets - coords1) * valid \
                    * plan.edge_valid[:, None, None, None]
                num = jnp.sum(r * r)
                den = jnp.sum(valid) * 2.0
                if axis is not None:
                    num, den = jax.lax.psum((num, den), axis)
                flow_rms = jnp.sqrt(num / jnp.maximum(den, 1.0))

                # covariance export (touched keyframes only)
                px_safe = jnp.where(plan.p_valid > 0, plan.px,
                                    state.pose_cov.shape[0])
                pose_cov = state.pose_cov.at[px_safe].set(
                    _cov_droid_to_gtsam(pose_cov_p), mode="drop")
                idepths_cov = dba.kx_scatter(state.idepths_cov, plan.kx,
                                             plan.k_valid, z_cov)
                d4 = jnp.maximum(disps[plan.kx], 1e-3) ** 4
                depths_cov_k = z_cov / d4
                depths_cov = dba.kx_scatter(state.depths_cov, plan.kx,
                                            plan.k_valid, depths_cov_k)

                # convex upsampling of idepths + depth covs (:444-446), using
                # the upmask from the final hidden state
                _, upmask = self.net.apply(params, hidden, seg, K, axis,
                                           method=DroidNet.aggregate)
                um = upmask.transpose(0, 3, 1, 2).reshape(K, 576, h, w)
                up_d = upsample.upsample_disp(disps[plan.kx], um)
                up_c = upsample.upsample_disp(depths_cov_k, um, pow=1.0)
                idepths_up = dba.kx_scatter(state.idepths_up, plan.kx,
                                            plan.k_valid, up_d)
                depths_cov_up = dba.kx_scatter(state.depths_cov_up, plan.kx,
                                               plan.k_valid, up_c)

                st1 = state._replace(
                    cam_T_world=poses, idepths=disps, damping=damping,
                    pose_cov=pose_cov, idepths_cov=idepths_cov,
                    depths_cov=depths_cov, idepths_up=idepths_up,
                    depths_cov_up=depths_cov_up)

                # next-keyframe seeding (visual_frontend.py:620-635), fused:
                # copy keyframe sn-1's state into slot sn (idepths seeded
                # with the source map's mean)
                B = st1.cam_T_world.shape[0]
                sn = seed_next
                src = jnp.clip(sn - 1, 0, B - 1)
                m = ((jnp.arange(B) == sn) & (sn >= 0))

                def seed(buf, val):
                    shape = (B,) + (1,) * (buf.ndim - 1)
                    return jnp.where(m.reshape(shape), val, buf)

                st2 = st1._replace(
                    cam_T_world=seed(st1.cam_T_world, st1.cam_T_world[src]),
                    pose_cov=seed(st1.pose_cov, st1.pose_cov[src]),
                    idepths=seed(st1.idepths, st1.idepths[src].mean()),
                    idepths_cov=seed(st1.idepths_cov, st1.idepths_cov[src]),
                    depths_cov=seed(st1.depths_cov, st1.depths_cov[src]),
                    intrinsics=seed(st1.intrinsics, st1.intrinsics[src]))

                # proximity-grid prefetch for the NEXT keyframe, computed on
                # the seeded state (replaces a separate distance dispatch)
                iis = kf0_g + jnp.arange(_PF_SI)
                jjs = kf1_g + jnp.arange(_PF_SJ)
                ii_g = jnp.repeat(iis, _PF_SJ)
                jj_g = jnp.tile(jjs, _PF_SI)
                ok = ((ii_g >= 0) & (ii_g < t_g) & (jj_g >= 0)
                      & (jj_g < t_g) & (kf1_g >= 0))
                ii_s = jnp.clip(ii_g, 0, B - 1)
                jj_s = jnp.clip(jj_g, 0, B - 1)
                prox_d = camera.frame_distance_bidirectional(
                    st2.cam_T_world, st2.idepths, st2.intrinsics, ii_s,
                    jj_s, cfg.beta)
                prox_d = jnp.where(ok, prox_d, 1e6)

                ed2 = edges._replace(hidden=hidden, flow=flow,
                                     flow_weight=flow_w,
                                     corr_levels=edges.corr_levels)
                # fused viz-packet gather of the FINAL state (before next-kf
                # seeding would not matter -- seeding writes future slots)
                viz = self._gather_viz_body(st2, viz_sel)
                return st2, ed2, inactive, flow_rms, kf_dist, prox_d, viz

            if light:
                return light_out(carry)
            if not two_phase:
                return full_out(carry)

            # two-phase: the accept/reject decision runs ON DEVICE.  Accept
            # (kf_dist >= keyframe_thresh) continues with iters2 more
            # GRU+DBA iterations and the full export tail; reject stops at
            # the light state (the host then rolls the keyframe away,
            # visual_frontend.py:611-616).  One dispatch either way.
            def accept_fn(c):
                c = (jnp.zeros((), jnp.int32),) + c[1:]
                c = jax.lax.while_loop(lambda cc: cc[0] < n_iters2,
                                       one_iter, c)
                return full_out(c)

            thresh = thr_x1024.astype(jnp.float32) / 1024.0
            return jax.lax.cond(kf_dist >= thresh, accept_fn, light_out,
                                carry)

        if not (with_motion and ingest is not None):
            return _body((state, edges, inactive)) + (mag,)

        def _skip(op):
            st, ed, ia = op
            zero = jnp.zeros((), jnp.float32)
            return (st, ed, ia, zero, zero,
                    jnp.full((_PF_SI * _PF_SJ,), 1e6, jnp.float32),
                    self._gather_viz_body(st, viz_sel))

        mthresh = mthr_x1024.astype(jnp.float32) / 1024.0
        out = jax.lax.cond(mag > mthresh, _body, _skip,
                           (state, edges, inactive))
        return out + (mag,)

    # ------------------------------------------------------------------
    # host orchestration
    # ------------------------------------------------------------------
    def _normalize(self, image: np.ndarray) -> jax.Array:
        """uint8 (H,W,3) -> normalized float (1,H,W,3)
        (visual_frontend.py:964-973)."""
        return self._normalize_dev(jnp.asarray(image, jnp.uint8))

    @partial(jax.jit, static_argnums=0)
    def _normalize_dev(self, image_u8: jax.Array) -> jax.Array:
        x = image_u8.astype(jnp.float32) / 255.0
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        return ((x - mean) / std)[None]

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _store_frame_jit(self, state: KeyframeState, slot, img_u8,
                         gt_depth, small, f, c, ci, f1=None):
        return self._store_frame_body(state, slot, img_u8, gt_depth,
                                      small, f, c, ci, f1)

    def _store_frame_body(self, state: KeyframeState, slot, img_u8,
                          gt_depth, small, f, c, ci, f1=None):
        """One fused buffer write.  small: packed floats
        [t_cam, intr(4)/dsf, gt_pose(16 row-major), has_depth,
        last_kf]."""
        t_cam = small[0]
        intr = small[1:5]
        gt_pose = small[5:21].reshape(4, 4)
        has_depth = small[21] > 0
        gt_d = jnp.where(has_depth, gt_depth, state.gt_depths[slot])
        st = state._replace(
            timestamps=state.timestamps.at[slot].set(t_cam),
            images=state.images.at[slot].set(img_u8),
            intrinsics=state.intrinsics.at[slot].set(intr),
            gt_poses=state.gt_poses.at[slot].set(gt_pose),
            gt_depths=state.gt_depths.at[slot].set(gt_d),
            features=state.features.at[slot].set(f.astype(jnp.bfloat16)),
            contexts=state.contexts.at[slot].set(c.astype(jnp.bfloat16)),
            cst_contexts=state.cst_contexts.at[slot].set(
                ci.astype(jnp.bfloat16)))
        if self.cfg.stereo and f1 is not None:
            st = st._replace(features1=st.features1.at[slot].set(
                f1.astype(jnp.bfloat16)))
        return st

    @partial(jax.jit, static_argnums=0)
    def _encode_feat(self, params, image_norm):
        """Feature-encoder-only pass (right camera: stereo edges need
        features but no context, visual_frontend.py:839-846)."""
        return self.net.apply(params, image_norm,
                              method=DroidNet.features)[0]

    def _pack_small(self, k: int, batch: Dict[str, Any]) -> np.ndarray:
        """Packed per-frame scalars: [t_cam, intr(4)/dsf, gt_pose(16),
        has_depth, last_kf]."""
        small = np.zeros(23, np.float32)
        small[0] = (float(batch["t_cams"])
                    if batch.get("t_cams") is not None else float(k))
        small[1:5] = np.asarray(batch["intrinsics"],
                                np.float32) / self.cfg.dsf
        if batch.get("poses") is not None:
            small[5:21] = np.asarray(batch["poses"],
                                     np.float32).reshape(-1)
        else:
            small[5:21] = np.eye(4, dtype=np.float32).reshape(-1)
        small[21] = 1.0 if batch.get("depths") is not None else 0.0
        small[22] = float(self.last_kf_idx)
        return small

    def _frame_uploads(self, batch: Dict[str, Any]):
        """Per-frame H2D transfers: uint8 image + f16 GT depth (halving
        the depth upload -- at ~20 MB/s tunnel upstream these transfers
        are a first-order per-frame cost) + optional right image."""
        img_dev = jnp.asarray(
            np.ascontiguousarray(np.asarray(batch["images"])[..., :3]),
            jnp.uint8)
        if batch.get("depths") is not None:
            gt16 = jnp.asarray(
                np.asarray(batch["depths"], np.float16), jnp.float16)
        else:
            z = getattr(self, "_zero_depth16", None)
            if z is None:
                z = jnp.zeros((self.H, self.W), jnp.float16)
                self._zero_depth16 = z       # uploaded once, reused
            gt16 = z
        img1 = None
        if self.cfg.stereo:
            right = batch.get("images_right")
            assert right is not None, \
                "stereo frontend needs batch['images_right']"
            img1 = jnp.asarray(
                np.ascontiguousarray(np.asarray(right)[..., :3]),
                jnp.uint8)
        return img_dev, gt16, img1

    def _host_snapshot(self):
        """Host bookkeeping snapshot for the speculative fully-fused
        frame path: graph edits / pending maintenance / prefetch / viz
        flags are made ASSUMING the on-device motion filter accepts; a
        reject restores this snapshot (device state needs no restore --
        the reject branch returns it untouched except the candidate
        slot store, which the next frame overwrites)."""
        import copy
        return (copy.deepcopy(self.graph),
                None if self._pending_gather is None
                else self._pending_gather.copy(),
                list(self._pending_app), self._pending_app_n_old,
                self._dist_prefetch, self.viz_idx.copy(),
                dict(self._host_intrinsics),
                dict(self.kf_idx_to_f_idx), dict(self.f_idx_to_kf_idx))

    def _host_restore(self, snap):
        (self.graph, self._pending_gather, self._pending_app,
         self._pending_app_n_old, self._dist_prefetch, self.viz_idx,
         self._host_intrinsics, self.kf_idx_to_f_idx,
         self.f_idx_to_kf_idx) = snap

    def _host_frame_bookkeeping(self, slot: int, small: np.ndarray,
                                batch: Dict[str, Any]):
        # the proximity prefetch seeded this slot with the intrinsics of
        # the keyframe it was issued from (last_kf_idx); if the incoming
        # frame's intrinsics differ, the prefetched distance grid is
        # stale -- invalidate it (ADVICE r1 #2)
        seed = self._host_intrinsics.get(self.last_kf_idx)
        if (self._dist_prefetch is not None and seed is not None
                and not np.allclose(seed, small[1:5])):
            self._dist_prefetch = None
        self._host_intrinsics[slot] = small[1:5].copy()
        if batch.get("idepths_sensed") is not None:
            st = self.state
            self.state = st._replace(
                idepths_sensed=st.idepths_sensed.at[slot].set(
                    jnp.asarray(batch["idepths_sensed"], jnp.float32)))

    def _store_frame(self, k: int, slot: int, batch: Dict[str, Any],
                     encoded=None, img_dev=None):
        """Write an incoming frame into keyframe buffers: ONE fused
        dispatch (normalize + encode + store) and two uploads."""
        small = self._pack_small(k, batch)
        img, gt16, img1 = self._frame_uploads(batch)
        if img_dev is not None:
            img = img_dev
        count_dispatch("ingest")
        self.state, _ = self._ingest(
            self.state, self.params, img, gt16, jnp.asarray(small),
            jnp.int32(slot), False, img1)
        self._host_frame_bookkeeping(slot, small, batch)

    def has_enough_motion(self, feat_cur) -> bool:
        st = self.state
        count_dispatch("motion_mag")
        count_sync("motion_mag")
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

    def _flush_pending(self):
        """Dispatch any deferred edge maintenance NOW (standalone jits).
        The hot loop instead folds the pending work into the next
        :meth:`_update_n` dispatch; this explicit flush serves paths
        that read or permute edge/inactive device state directly
        (rm_keyframe, the sharded-mesh update, checkpointing)."""
        if self._pending_app:
            Ei = self.cfg.e_inactive
            idx = np.concatenate(self._pending_app)[:Ei]
            idx_pad = np.zeros(Ei, dtype=np.int32)
            idx_pad[:len(idx)] = idx
            count_dispatch("append_inactive")
            self.inactive = self._append_inactive(
                self.inactive, self.edges.flow, self.edges.flow_weight,
                jnp.asarray(idx_pad), jnp.int32(self._pending_app_n_old),
                jnp.int32(len(idx)))
            self._pending_app = []
        if self._pending_gather is not None:
            pg = self._pending_gather
            self._pending_gather = None
            self._apply_edge_sync(pg)

    def _apply_edge_sync(self, slot_map: np.ndarray):
        """slot_map: for each current edge, its pre-change device slot
        (-1 = newly added)."""
        cfg = self.cfg
        Ea = cfg.e_active
        g = self.graph
        gather = np.zeros(Ea, dtype=np.int32)
        new_mask = np.zeros(Ea, dtype=np.int32)
        n = slot_map.shape[0]
        gather[:n] = np.maximum(slot_map, 0)
        new_mask[:n] = (slot_map < 0).astype(np.int32)
        ii_pad = np.zeros(Ea, np.int32)
        jj_pad = np.zeros(Ea, np.int32)
        ii_pad[:n] = g.ii
        jj_pad[:n] = g.jj
        packed = np.concatenate([gather, new_mask, ii_pad, jj_pad])
        count_dispatch("refresh_edges")
        self.edges = self._refresh_edges(
            self.params, self.state, self.edges, jnp.asarray(packed))

    def _sync_edges_after_change(self, keep: Optional[np.ndarray],
                                 new_ii: np.ndarray, new_jj: np.ndarray,
                                 n_before: int):
        """Record an edge-topology change.  The device sync is LAZY: the
        change composes into ``_pending_gather`` (current host edge ->
        pre-pending device slot, -1 = new) and is applied inside the next
        update dispatch (or an explicit :meth:`_flush_pending`)."""
        n_new = new_ii.shape[0]
        n_keep = self.graph.n_edges - n_new
        if keep is None:
            keep = np.arange(n_keep)
        base = (self._pending_gather if self._pending_gather is not None
                else np.arange(n_before, dtype=np.int64))
        assert base.shape[0] == n_before, (base.shape, n_before)
        self._pending_gather = np.concatenate(
            [base[np.asarray(keep, np.int64)],
             -np.ones(n_new, dtype=np.int64)])

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
        """Queue flows of edges `idx` for the inactive ring.  Indices
        refer to the current host layout and are translated through the
        pending map to PRE-pending device slots (the device flows do not
        change until the pending sync runs); edges added since the last
        sync have no device state yet and are skipped (their flow is the
        fresh reprojection either way).  The actual append runs inside
        the next update dispatch (or _flush_pending), gathering from the
        pre-sync edge flows -- exactly the capture-at-rm-time semantics
        of the reference (visual_frontend.py:868-875)."""
        idx = np.asarray(idx, np.int64)
        if self._pending_gather is not None:
            slots = self._pending_gather[idx]
            idx = slots[slots >= 0]
        if len(idx) == 0:
            return
        if not self._pending_app:
            self._pending_app_n_old = min(self.graph.n_inactive,
                                          self.cfg.e_inactive)
        self._pending_app.append(idx)

    # the reference's update() ------------------------------------------
    def update(self, use_inactive: bool = True, n_iters: int = 1,
               seed_sensed_slot: int = -1,
               kf_dist_pair: Optional[Tuple[int, int]] = None,
               light: bool = False, seed_next: int = -1,
               prefetch: bool = False, two_phase: bool = False,
               n_iters2: int = 0, ingest=None,
               with_motion: bool = False):
        """One fused update dispatch.  ``two_phase``: run ``n_iters``,
        decide accept/reject on device (cfg.keyframe_thresh), run
        ``n_iters2`` + exports only on accept.  ``ingest``: a tuple
        (img_u8_dev, gt16_dev, small_np, img1_dev_or_None, slot) whose
        normalize+encode+store rides this dispatch (motion-filter-off
        keyframes cost ONE dispatch total).  ``with_motion`` (requires
        ingest): the motion-filter magnitude and decision ALSO ride the
        dispatch -- a rejected frame skips the whole tracking body on
        device, and the caller restores the speculative host bookkeeping
        (a production frame then costs ONE dispatch + ONE sync)."""
        cfg = self.cfg
        g = self.graph
        if g.n_edges == 0:
            return None
        assert not (two_phase or ingest) or self.mesh is None, \
            "two_phase/fused-ingest unsupported on the sharded path"
        kf0 = max(0, int(g.ii.min()))
        kf1 = max(int(g.ii.max()), int(g.jj.max())) + 1

        if self.mesh is not None:
            # sharded path: edge state is mesh-partitioned, so pending
            # maintenance runs through the standalone (global) jits
            self._flush_pending()

        # fused-maintenance prefix: pending inactive append + edge sync
        # + viz gather, all folded into the ONE update dispatch
        Ea, Ei, V = cfg.e_active, cfg.e_inactive, self.V_VIZ
        Kr = cfg.e_rebuild
        prefix = np.zeros(self._prefix_len(), np.int32)
        o = 1 + 4 * Ea + Kr
        if self._pending_gather is not None:
            pg = self._pending_gather
            n = g.n_edges
            assert pg.shape[0] == n
            prefix[0] = 1
            prefix[1:1 + n] = np.maximum(pg, 0)
            prefix[1 + Ea:1 + Ea + n] = (pg < 0)
            prefix[1 + 2 * Ea:1 + 2 * Ea + n] = g.ii
            prefix[1 + 3 * Ea:1 + 3 * Ea + n] = g.jj
            new_pos = np.nonzero(pg < 0)[0]
            if new_pos.size <= Kr and Kr > 0 and self.mesh is None:
                # incremental sync: gather surviving volumes, rebuild
                # only the new slots (mode 2; pure-removal syncs take
                # this path too -- an all-gather beats an all-rebuild);
                # pad with Ea (dropped by the scatter)
                prefix[0] = 2
                rb = np.full(Kr, Ea, np.int32)
                rb[:new_pos.size] = new_pos
                prefix[1 + 4 * Ea:1 + 4 * Ea + Kr] = rb
            self._pending_gather = None
        if self._pending_app:
            idx = np.concatenate(self._pending_app)[:Ei]
            prefix[o] = 1
            prefix[o + 1:o + 1 + len(idx)] = idx
            prefix[o + 1 + Ei] = self._pending_app_n_old
            prefix[o + 2 + Ei] = len(idx)
            self._pending_app = []
        o += 3 + Ei
        viz_key = None
        if not light:
            if two_phase:
                # optimistic viz bookkeeping: snapshot for reject rollback
                self._viz_idx_snapshot = self.viz_idx.copy()
            self.viz_idx[kf0:self.kf_idx + 1] = True
            idxs = np.nonzero(self.viz_idx)[0]
            if self.mesh is None and 0 < idxs.size <= V:
                viz_key = idxs
                sel = np.full(V, idxs[-1], np.int32)
                sel[:idxs.size] = idxs
                prefix[o:o + V] = sel
                prefix[o + V] = 1

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

        pa = self._slot_aligned_plan_np(ii_all, jj_all, valid_all,
                                        kf0, kf1)
        L = pa["pair_a"].shape[0]
        packed = dba.pack_plan(pa, Ea + Ei, cfg.p_window, cfg.k_depth, L)
        # ONE host->device upload for the whole topology + maintenance
        # prefix + iteration count + sensed-seed slot + keyframe-distance
        # pair + seeding/prefetch scalars
        da, db = kf_dist_pair if kf_dist_pair is not None else (0, 0)
        t_g, kf0_g, kf1_g = 0, 0, -1
        if prefetch:
            nk = self.kf_idx + 1              # the next keyframe index
            t_g = nk + 1
            kf0_g = nk - 4
            kf1_g = max(nk + 1 - cfg.frontend_window, 0)
            if (t_g - kf0_g > _PF_SI or t_g - kf1_g > _PF_SJ
                    or kf0_g < 0):
                t_g, kf0_g, kf1_g = 0, 0, -1   # grid too big: disable
        imax = 2 ** 31 - 1            # clamp x1024 fixed-point to int32
        thr = (min(imax, int(round(cfg.keyframe_thresh * 1024)))
               if two_phase else 0)
        mthr = (min(imax, int(round(cfg.motion_filter_thresh * 1024)))
                if with_motion else 0)
        in_slot = ingest[4] if ingest is not None else 0
        packed = np.concatenate([prefix, packed,
                                 np.array([n_iters, n_iters2, thr, mthr,
                                           in_slot, seed_sensed_slot,
                                           da, db, seed_next, t_g,
                                           kf0_g, kf1_g], np.int32)])

        if ingest is not None:
            img_dev, gt16, small_np, img1_dev, _ = ingest
            small_dev = jnp.asarray(small_np)
        else:
            img_dev = gt16 = small_dev = img1_dev = None
        count_dispatch("update_n")
        (state, edges, inactive, flow_rms, kf_dist, prox_d,
         viz, mag) = self._update_n(
            self.params, self.state, self.edges, self.inactive,
            jnp.asarray(packed), light, two_phase, with_motion,
            img_dev, gt16, small_dev, img1_dev)
        self.last_motion_mag = mag          # device scalar
        self._synced_after_dispatch = False
        self.state = state
        self.edges = edges
        self.inactive = inactive
        if viz_key is not None:
            self._viz_pending = (viz, viz_key)
        if kf1_g >= 0:
            self._dist_prefetch = ("grid", (t_g, kf0_g, kf1_g), prox_d)
        g.age += n_iters
        self.last_flow_rms = flow_rms   # device scalar; sync only if read
        self.last_kf_dist = kf_dist     # device scalar
        return flow_rms

    def _slot_aligned_plan_np(self, ii_all, jj_all, valid_all, kf0, kf1):
        """Numpy plan arrays (slot-aligned); see _slot_aligned_plan."""
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
        # interaction list for the sparse Schur assembly; padded to a
        # fixed size per (e_active+e_inactive) config so jits are stable.
        # The dense-Schur default needs no pairs (empty list -> dense
        # contraction downstream), skipping this host-side O(pairs) loop.
        if cfg.schur_impl == "sparse":
            pa, pb, pv = dba.compute_pairs(
                pi.astype(np.int32), pj.astype(np.int32), kk,
                np.asarray(valid_all, bool), pad_to=self._pair_pad)
        else:
            pa = np.zeros(0, np.int32)
            pb = np.zeros(0, np.int32)
            pv = np.zeros(0, np.float32)
        return {
            "ii": np.where(valid_all, ii_all, 0).astype(np.int32),
            "jj": np.where(valid_all, jj_all, 0).astype(np.int32),
            "pi": pi.astype(np.int32),
            "pj": pj.astype(np.int32),
            "kk": kk,
            "edge_valid": valid_all.astype(np.int32),
            "px": np.clip(px, 0, cfg.buffer - 1).astype(np.int32),
            "p_valid": p_valid.astype(np.int32),
            "p_fixed": p_fixed.astype(np.int32),
            "kx": kx,
            "k_valid": k_valid.astype(np.int32),
            "pair_a": pa,
            "pair_b": pb,
            "pair_valid": pv.astype(np.int32),
        }

    def _slot_aligned_plan(self, ii_all, jj_all, valid_all, kf0, kf1):
        """DBAPlan (device arrays) built from the numpy plan."""
        a = self._slot_aligned_plan_np(ii_all, jj_all, valid_all, kf0, kf1)
        f32 = np.float32
        return dba.DBAPlan(
            ii=jnp.asarray(a["ii"]), jj=jnp.asarray(a["jj"]),
            pi=jnp.asarray(a["pi"]), pj=jnp.asarray(a["pj"]),
            kk=jnp.asarray(a["kk"]),
            edge_valid=jnp.asarray(a["edge_valid"].astype(f32)),
            px=jnp.asarray(a["px"]),
            p_valid=jnp.asarray(a["p_valid"].astype(f32)),
            p_fixed=jnp.asarray(a["p_fixed"].astype(f32)),
            kx=jnp.asarray(a["kx"]),
            k_valid=jnp.asarray(a["k_valid"].astype(f32)),
            pair_a=jnp.asarray(a["pair_a"]),
            pair_b=jnp.asarray(a["pair_b"]),
            pair_valid=jnp.asarray(a["pair_valid"].astype(f32)))

    # keyframe-level ops ------------------------------------------------
    def distance(self, ii, jj) -> np.ndarray:
        """Frame distances, padded to a few fixed sizes so the jitted
        kernel and the D2H transfer compile once per size class."""
        st = self.state
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        n = ii.shape[0]
        for size in (16, 256, self.cfg.buffer ** 2):
            if n <= size:
                break
        packed = np.zeros(2 * size, np.int32)
        packed[:n] = ii
        packed[size:size + n] = jj
        count_dispatch("distance")
        d = self._distance(st.cam_T_world, st.idepths, st.intrinsics,
                           jnp.asarray(packed), self.cfg.beta)
        count_sync("distance")
        return np.asarray(d)[:n]

    def add_neighborhood_factors(self, kf0, kf1, radius=3):
        # stereo (i, i) edges enter via add_proximity_factors, exactly
        # like the reference (visual_frontend.py:698-705, 741-745)
        ii, jj = graphlib.neighborhood_edges(kf0, kf1, radius,
                                             stereo=self.cfg.stereo)
        self.add_factors(ii, jj)

    def _issue_distance(self, ii, jj):
        """Dispatch a padded distance query; returns (device_array, n)
        without synchronizing."""
        st = self.state
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        n = ii.shape[0]
        for size in (16, 256, self.cfg.buffer ** 2):
            if n <= size:
                break
        packed = np.zeros(2 * size, np.int32)
        packed[:n] = ii
        packed[size:size + n] = jj
        count_dispatch("distance")
        d = self._distance(st.cam_T_world, st.idepths, st.intrinsics,
                           jnp.asarray(packed), self.cfg.beta)
        return d, n

    def _prefetch_proximity(self):
        """Issue the NEXT keyframe's proximity distance grid now, so its
        result lands during the inter-frame gap instead of blocking the
        next __update (the query depends only on keyframe state, which
        the next frame's store does not touch).  Steady-state keyframes
        instead get this fused into _update_n (prefetch=True); this
        explicit path serves initialization."""
        cfg = self.cfg
        nk = self.kf_idx + 1              # the next keyframe index
        t = nk + 1
        kf0 = nk - 4
        kf1 = max(nk + 1 - cfg.frontend_window, 0)
        ii_g, jj_g = np.meshgrid(np.arange(kf0, t), np.arange(kf1, t),
                                 indexing="ij")
        d, n = self._issue_distance(ii_g.ravel(), jj_g.ravel())
        self._dist_prefetch = ("flat", (t, kf0, kf1), d, n)

    def add_proximity_factors(self, kf0=0, kf1=0, rad=2, nms=2,
                              beta=0.3, thresh=16.0, remove=False):
        t = self.kf_idx + 1
        ix = np.arange(kf0, t)
        jx = np.arange(kf1, t)
        ii_g, jj_g = np.meshgrid(ix, jx, indexing="ij")
        pf = getattr(self, "_dist_prefetch", None)
        if pf is not None and pf[1] == (t, kf0, kf1):
            if pf[0] == "grid":
                # fused-prefetch layout: padded (_PF_SI, _PF_SJ) grid
                dg = np.asarray(pf[2]).reshape(_PF_SI, _PF_SJ)
                d = dg[: t - kf0, : t - kf1].ravel()
            else:
                d = np.asarray(pf[2])[:pf[3]]
            self._dist_prefetch = None
        else:
            d = self.distance(ii_g.ravel(), jj_g.ravel())
        ii, jj = graphlib.proximity_edges(
            self.graph, d, self.kf_idx, kf0, kf1, rad, nms, thresh,
            self.cfg.max_factors, stereo=self.cfg.stereo)
        if ii.shape[0]:
            self.add_factors(ii, jj, remove)

    def rm_keyframe(self, kf_idx: int):
        """visual_frontend.py:529-574: roll buffers down over kf_idx."""
        # deferred maintenance references pre-roll device layouts, and a
        # fused viz gather references pre-roll keyframe slots: flush and
        # invalidate before permuting anything
        self._flush_pending()
        self._viz_pending = None
        self._dist_prefetch = None       # state permutes: prefetch stale
        self._host_intrinsics = {
            (i if i < kf_idx else i - 1): v
            for i, v in self._host_intrinsics.items() if i != kf_idx}
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

        if cfg.rgbd and batch.get("depths") is not None \
                and batch.get("idepths_sensed") is None:
            # RGB-D mode: seed metric sensed inverse depths at feature
            # resolution (the reference's cam0_idepths_sensed path --
            # visual_frontend.py:598-602 seeds new keyframes from them
            # and the DBA's sensed mask anchors the gauge,
            # droid_kernels.cu:1525-1529).  Monocular runs leave this
            # off and keep the free Sim3 gauge.
            d = np.asarray(batch["depths"], np.float32)[
                cfg.dsf // 2::cfg.dsf, cfg.dsf // 2::cfg.dsf]
            batch = dict(batch)
            batch["idepths_sensed"] = np.where(
                d > 1e-3, 1.0 / np.maximum(d, 1e-3), 0.0)

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

        # ONE fused dispatch: normalize + encode (+ motion magnitude) +
        # store into slot kf_idx.  The store is unconditional; a motion
        # reject simply leaves a candidate in the slot for the next
        # frame to overwrite (nothing reads the slot until accepted).
        # With the motion filter disabled, even this dispatch is fused
        # INTO the update program (fuse_ingest): a steady-state keyframe
        # then costs one dispatch total.
        with_motion = self.cfg.motion_filter_thresh >= 0
        small = self._pack_small(k, batch)
        img, gt16, img1 = self._frame_uploads(batch)
        # full fusion: ingest + motion decision + two-phase update in
        # ONE dispatch (host bookkeeping is speculative, restored from a
        # snapshot on an on-device motion reject)
        fuse_all = (with_motion and self.is_initialized
                    and self.mesh is None
                    and self.cfg.keyframe_thresh >= 0)
        fuse_ingest = (self.is_initialized and self.mesh is None
                       and (not with_motion or fuse_all))
        if not fuse_ingest:
            count_dispatch("ingest")
            self.state, mag = self._ingest(
                self.state, self.params, img, gt16, jnp.asarray(small),
                jnp.int32(self.kf_idx), with_motion, img1)
            self._synced_after_dispatch = False
            if with_motion:
                count_sync("motion_mag")
                self._synced_after_dispatch = True
                if not float(mag) > self.cfg.motion_filter_thresh:
                    if batch.get("is_last_frame"):
                        self.kf_idx -= 1
                        self.terminate()
                        return self.get_viz_out(batch)
                    return None

        if not self.is_initialized:
            self._host_frame_bookkeeping(self.kf_idx, small, batch)
            self.kf_idx_to_f_idx[self.kf_idx] = k
            self.f_idx_to_kf_idx[k] = self.kf_idx
            if self.kf_idx >= cfg.keyframe_warmup:
                self.__initialize()
        else:
            snap = self._host_snapshot() if fuse_all else None
            self._host_frame_bookkeeping(self.kf_idx, small, batch)
            self.kf_idx_to_f_idx[self.kf_idx] = k
            self.f_idx_to_kf_idx[k] = self.kf_idx
            ingest = ((img, gt16, small, img1, self.kf_idx)
                      if fuse_ingest else None)
            ok = self.__update(ingest=ingest, motion_fused=fuse_all)
            if ok == "motion_reject":
                self._host_restore(snap)
                if batch.get("is_last_frame"):
                    self.kf_idx -= 1
                    self.terminate()
                    return self.get_viz_out(batch)
                return None
            if not ok:
                self.rm_keyframe(self.kf_idx - 1)
                return None

        self.last_k = k
        self.last_kf_idx = self.kf_idx
        out = self.get_viz_out(batch)

        if (self._pace and not self._synced_after_dispatch
                and isinstance(getattr(self, "last_flow_rms", None),
                               jax.Array)):
            # drain the dispatch queue once per keyframe (see __init__);
            # skipped when a sync already followed the last dispatch
            # (the two-phase kf_dist read paces the production path)
            count_sync("pace")
            np.asarray(self.last_flow_rms)
            self._synced_after_dispatch = True

        if self.kf_idx + 1 >= cfg.buffer or batch.get("is_last_frame"):
            # buffer-full ends the sequence for every downstream consumer
            self.terminate()
            final = dict(batch)
            final["is_last_frame"] = True
            return self.get_viz_out(final) or out

        self.kf_idx += 1
        return out

    def __initialize(self):
        cfg = self.cfg
        self.add_neighborhood_factors(0, self.kf_idx, radius=3)
        self.update(use_inactive=True, n_iters=8)
        self.add_proximity_factors(0, 0, rad=2, nms=2,
                                   thresh=cfg.frontend_thresh, remove=False)
        self.update(use_inactive=True, n_iters=8)

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
                    st.depths_cov[self.kf_idx - 3:self.kf_idx + 1].mean()),
                intrinsics=st.intrinsics.at[nxt].set(
                    st.intrinsics[self.kf_idx]))
        self.is_initialized = True
        self.viz_idx[: self.kf_idx + 1] = True
        self.rm_factors(
            np.asarray(self.graph.ii < (cfg.keyframe_warmup - 4)),
            store=True)
        if nxt < cfg.buffer:
            self._prefetch_proximity()

    def __update(self, ingest=None, motion_fused: bool = False):
        cfg = self.cfg
        if self.graph.n_edges:
            self.rm_factors(np.asarray(self.graph.age > cfg.max_age),
                            store=True)
        self.add_proximity_factors(
            kf0=self.kf_idx - 4,
            kf1=max(self.kf_idx + 1 - cfg.frontend_window, 0),
            rad=cfg.frontend_radius, nms=cfg.frontend_nms,
            thresh=cfg.frontend_thresh, beta=cfg.beta, remove=True)

        # next-kf seeding + proximity prefetch + sensed-depth seeding +
        # keyframe-rejection distance are all fused into the update jit
        nxt = self.kf_idx + 1
        seed_next = nxt if nxt < cfg.buffer else -1

        if ingest is not None and self.graph.n_edges == 0:
            # update() would no-op on an empty graph, dropping the fused
            # ingest -- store the frame through the standalone dispatch
            # (with the motion magnitude when the decision was fused)
            img_dev, gt16, small_np, img1_dev, slot = ingest
            count_dispatch("ingest")
            self.state, mag = self._ingest(
                self.state, self.params, img_dev, gt16,
                jnp.asarray(small_np), jnp.int32(slot), motion_fused,
                img1_dev)
            self._synced_after_dispatch = False
            if motion_fused:
                count_sync("motion_mag")
                self._synced_after_dispatch = True
                if not float(mag) > cfg.motion_filter_thresh:
                    return "motion_reject"
            ingest = None
            motion_fused = False

        if cfg.keyframe_thresh >= 0 and self.mesh is None:
            # fused two-phase: iters1, on-device accept/reject, iters2 +
            # exports on accept -- ONE dispatch, ONE sync per keyframe
            # (the r1-r3 design paid two dispatches here).  With
            # motion_fused, the motion-filter decision ALSO rides the
            # same dispatch (the r4 mid-round design still paid a
            # separate ingest dispatch + sync per frame).
            ran = self.update(
                use_inactive=True, n_iters=cfg.iters1,
                n_iters2=cfg.iters2, two_phase=True,
                seed_sensed_slot=self.kf_idx,
                kf_dist_pair=(self.kf_idx - 2, self.kf_idx - 1),
                seed_next=seed_next, prefetch=seed_next >= 0,
                ingest=ingest, with_motion=motion_fused)
            # gate on the update having actually run: with an empty
            # graph last_kf_dist is stale and must not reject
            if ran is not None and motion_fused:
                count_sync("motion_mag")
                self._synced_after_dispatch = True
                if not (float(self.last_motion_mag)
                        > cfg.motion_filter_thresh):
                    # motion reject: the device skipped the whole body;
                    # the caller restores speculative host bookkeeping
                    if self._viz_idx_snapshot is not None:
                        self.viz_idx = self._viz_idx_snapshot
                        self._viz_idx_snapshot = None
                    self._viz_pending = None
                    return "motion_reject"
            if ran is not None:
                count_sync("kf_dist")
                self._synced_after_dispatch = True
                if float(self.last_kf_dist) < cfg.keyframe_thresh:
                    # reject: the device stopped at the light state; roll
                    # back the optimistic viz bookkeeping (the prefetch
                    # grid is invalidated by rm_keyframe right after)
                    if self._viz_idx_snapshot is not None:
                        self.viz_idx = self._viz_idx_snapshot
                        self._viz_idx_snapshot = None
                    self._viz_pending = None
                    return False
                self.graph.age += cfg.iters2   # accept branch ran these
            self._viz_idx_snapshot = None
        elif cfg.keyframe_thresh >= 0:
            # sharded-mesh fallback: two dispatches (light + full)
            ran = self.update(
                use_inactive=True, n_iters=cfg.iters1,
                seed_sensed_slot=self.kf_idx,
                kf_dist_pair=(self.kf_idx - 2, self.kf_idx - 1),
                light=True)
            if ran is not None:
                count_sync("kf_dist")
                self._synced_after_dispatch = True
            if (ran is not None
                    and float(self.last_kf_dist) < cfg.keyframe_thresh):
                return False
            self.update(use_inactive=True, n_iters=cfg.iters2,
                        seed_next=seed_next, prefetch=seed_next >= 0)
        else:
            # rejection disabled: ONE fused call covers both reference
            # update rounds (iters1 + iters2), halving dispatches
            self.update(
                use_inactive=True, n_iters=cfg.iters1 + cfg.iters2,
                seed_sensed_slot=self.kf_idx,
                seed_next=seed_next, prefetch=seed_next >= 0,
                ingest=ingest)
        return True

    # global bundle adjustment (terminate path) -------------------------
    @partial(jax.jit, static_argnums=0)
    def _normalize_map(self, poses, disps, n_kf):
        """Rescale so mean inverse depth is 1 (visual_frontend.py:1302-1307);
        n_kf masks the active prefix of the buffers."""
        B = poses.shape[0]
        mask = (jnp.arange(B) < n_kf)[:, None, None]
        s = jnp.sum(disps * mask) / jnp.maximum(
            jnp.sum(mask * jnp.ones_like(disps)), 1.0)
        disps = jnp.where(mask, disps / s, disps)
        poses = poses.at[:, :3].multiply(
            jnp.where(mask[:, :, 0], s, 1.0))
        return poses, disps

    @partial(jax.jit, static_argnums=0)
    def _feature_pyramid(self, features):
        """(B, h, w, 128) -> 4-level pooled pyramid in (B, C, h_l, w_l)."""
        from ..ops.corr import _avg_pool2
        f = features.transpose(0, 3, 1, 2).astype(jnp.float32)
        pyr = [f]
        for _ in range(3):
            prev = pyr[-1]
            if min(prev.shape[-2:]) >= 2:
                pyr.append(_avg_pool2(prev))
            else:  # tiny test images: stop shrinking
                pyr.append(prev)
        return tuple(p.astype(jnp.bfloat16) for p in pyr)

    @partial(jax.jit, static_argnums=(0, 12), donate_argnums=(3, 6))
    def _gba_chunk(self, params, pyramid, hidden, ctx_inp, coords1,
                   flow, flow_w, ii_c, jj_c, valid_c, seg_c, n_seg):
        """One GRU pass over an edge chunk with on-the-fly correlation
        (update_lowmem's inner loop, visual_frontend.py:488-514)."""
        from ..ops import corr as corr_ops
        h, w = self.h, self.w
        coords0 = camera.coords_grid(h, w)

        outs = []
        for lvl, fmaps in enumerate(pyramid):
            # fmap1 is always level-0 (AltCorrBlock, corr.py:113-115)
            c = corr_ops.alt_corr_level(
                pyramid[0][ii_c].astype(jnp.float32),
                fmaps[jj_c].astype(jnp.float32),
                coords1 / (2 ** lvl), radius=3,
                chunk=max(1, ii_c.shape[0] // 4))
            outs.append(c)
        cvals = jnp.concatenate(outs, axis=1).transpose(0, 2, 3, 1)

        motion = jnp.clip(jnp.concatenate(
            [coords1 - coords0, flow - coords1], -1), -64.0, 64.0)
        hidden2, delta, weight, eta = self.net.apply(
            params, hidden, ctx_inp, cvals.astype(jnp.bfloat16),
            motion.astype(jnp.bfloat16), seg_c, n_seg, False,
            method=DroidNet.update)
        on = valid_c[:, None, None, None]
        flow = jnp.where(on > 0, coords1 + delta, flow)
        flow_w = jnp.where(on > 0, weight, flow_w)
        hidden = jnp.where(on > 0, hidden2, hidden)
        return hidden, flow, flow_w, eta

    def _map_consistency(self) -> float:
        """GT-free map health score: mean multi-view depth-consistency
        count over all keyframes (depth_filter, the reference's
        depth_filter_kernel neighbor schedule).  The threshold scales
        with the map's current depth gauge so the score is comparable
        across the global-BA rescale."""
        kf = self.kf_idx
        st = self.state
        ix = jnp.arange(kf + 1)
        med_z = 1.0 / jnp.maximum(
            jnp.median(st.idepths[: kf + 1]), 1e-6)
        counts = camera.depth_filter(st.cam_T_world, st.idepths,
                                     st.intrinsics, ix, 0.1 * med_z)
        return float(jnp.mean(counts))

    def global_ba(self, steps: int = 12, chunk: int = 32,
                  thresh: float = None):
        """Full-map bundle adjustment (backend(), visual_frontend.py:
        1255-1295): rebuild the graph with backend thresholds, then
        alternate chunked GRU flow refinement (on-the-fly correlation)
        with DBA over all keyframes.

        Guarded: with self-trained weights the backend's long-range
        edges can sit outside the GRU's training distribution and the
        refinement diverges (measured: bench-cell ATE 0.37 -> 0.76,
        scale x6.2).  The map's multi-view depth consistency is scored
        before and after; a run that lowers it is rolled back, so the
        backend can only improve the map."""
        cfg = self.cfg
        kf = self.kf_idx
        if kf < 2 or steps <= 0:
            return
        self._flush_pending()   # graph is swapped below; settle edges

        st = self.state
        if float(jnp.max(st.idepths_sensed[:kf])) <= 0:
            poses, disps = self._normalize_map(
                st.cam_T_world, st.idepths, jnp.int32(kf + 1))
            self.state = st._replace(cam_T_world=poses, idepths=disps)

        # rollback snapshot (post-normalize: the rescale is a pure gauge
        # change and always safe to keep)
        snap_poses = self.state.cam_T_world
        snap_disps = self.state.idepths
        score0 = self._map_consistency()

        # backend graph (max_factors=16*kf, backend thresholds)
        saved_graph = self.graph
        self.graph = graphlib.CovisibilityGraph(
            max_factors=16 * kf)
        t = kf + 1
        ix = np.arange(0, t)
        ii_g, jj_g = np.meshgrid(ix, ix, indexing="ij")
        d = self.distance(ii_g.ravel(), jj_g.ravel())
        ii, jj = graphlib.proximity_edges(
            self.graph, d, kf, 0, 0, rad=2, nms=3,
            thresh=thresh or 22.0, max_factors=16 * kf)
        self.graph = saved_graph
        if ii.shape[0] == 0:
            return
        n_e = ii.shape[0]
        E_g = ((n_e + chunk - 1) // chunk) * chunk

        pyramid = self._feature_pyramid(self.state.features)
        h, w = self.h, self.w

        ii_p = np.zeros(E_g, np.int64)
        jj_p = np.zeros(E_g, np.int64)
        val_p = np.zeros(E_g, np.float32)
        ii_p[:n_e] = ii
        jj_p[:n_e] = jj
        val_p[:n_e] = 1.0

        plan = self._slot_aligned_plan(ii_p, jj_p, val_p > 0, 0, t)
        kmap = {int(k): i for i, k in enumerate(np.asarray(plan.kx))
                if plan.k_valid[i] > 0}
        seg = np.array([kmap.get(int(i), -1) if v else -1
                        for i, v in zip(ii_p, val_p > 0)], np.int32)
        K = plan.kx.shape[0]

        hidden = self.state.contexts[jnp.asarray(ii_p.astype(np.int32))]
        ctx = self.state.cst_contexts[jnp.asarray(ii_p.astype(np.int32))]
        flow, _, _ = camera.projective_transform(
            self.state.cam_T_world, self.state.idepths,
            self.state.intrinsics, jnp.asarray(ii_p.astype(np.int32)),
            jnp.asarray(jj_p.astype(np.int32)))
        flow_w = jnp.zeros((E_g, h, w, 2))

        eta_buf = 1e-6 * jnp.ones((self.cfg.buffer, h, w))
        for _ in range(steps):
            st = self.state
            coords1, _, _ = camera.projective_transform(
                st.cam_T_world, st.idepths, st.intrinsics,
                jnp.asarray(ii_p.astype(np.int32)),
                jnp.asarray(jj_p.astype(np.int32)))
            for c0 in range(0, E_g, chunk):
                sl = slice(c0, c0 + chunk)
                hid_c, flow_c, flow_wc, eta_c = self._gba_chunk(
                    self.params, pyramid, hidden[sl], ctx[sl],
                    coords1[sl], flow[sl], flow_w[sl],
                    jnp.asarray(ii_p[sl].astype(np.int32)),
                    jnp.asarray(jj_p[sl].astype(np.int32)),
                    jnp.asarray(val_p[sl]),
                    jnp.asarray(seg[sl]), K)
                hidden = hidden.at[sl].set(hid_c)
                flow = flow.at[sl].set(flow_c)
                flow_w = flow_w.at[sl].set(flow_wc)
                eta_buf = dba.kx_scatter(eta_buf, plan.kx,
                                         plan.k_valid, eta_c)

            eta_k = cfg.damping_scale * eta_buf[plan.kx] \
            + cfg.damping_offset
            res = dba.dba_iterations(
                st.cam_T_world, st.idepths, st.intrinsics, flow, flow_w,
                eta_k, st.idepths_sensed[plan.kx], plan, iters=2,
                ep=1e-2, lm=1e-5, compute_covariances=False)
            self.state = st._replace(cam_T_world=res.poses,
                                     idepths=res.disps)
        score1 = self._map_consistency()
        self.last_gba_scores = (score0, score1)
        if score1 < score0:
            # refinement hurt the map -- restore the pre-backend state
            self.state = self.state._replace(cam_T_world=snap_poses,
                                             idepths=snap_disps)
        self.viz_idx[: kf + 1] = True

    def terminate(self):
        """End of sequence: optional global BA, then flag the whole map
        for a final viz packet (visual_frontend.py:1309-1335)."""
        if getattr(self.cfg, "global_ba", False):
            self.global_ba(7)
            self.global_ba(12)
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
        vp = self._viz_pending
        if vp is not None and np.array_equal(vp[1], idx):
            # gather already fused into the last update dispatch
            fields = vp[0]
            self._viz_pending = None
        else:
            # pad the selection to a fixed size class (jit + transfer
            # reuse); serves the first frame, terminate packets, and
            # selections wider than V_VIZ
            V = 16 if idx.size <= 16 else self.cfg.buffer
            sel = np.full(V, idx[-1], np.int32)
            sel[: idx.size] = idx[:V]
            idx = idx[:V]
            count_dispatch("gather_viz")
            fields = self._gather_viz(self.state, jnp.asarray(sel))
        names = ["cam0_poses", "gt_poses", "gt_depths", "world_T_body",
                 "world_T_body_cov", "cam0_idepths", "cam0_idepths_up",
                 "cam0_idepths_sensed", "cam0_idepths_cov",
                 "cam0_depths_cov", "cam0_depths_cov_up", "cam0_images",
                 "cam0_intrinsics"]
        # fields stay PADDED (fixed shapes; no per-size recompiles or
        # transfer programs) -- consumers slice with viz_count
        out = dict(zip(names, fields))
        out.update({
            "viz_idx": idx,
            "viz_count": int(idx.size),
            "kf_idx": self.kf_idx,
            "kf_idx_to_f_idx": dict(self.kf_idx_to_f_idx),
            "is_last_frame": bool(batch.get("is_last_frame", False)),
        })
        self.viz_idx[:] = False
        return out
