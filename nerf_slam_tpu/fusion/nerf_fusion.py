"""Online NeRF fusion: uncertainty-weighted depth-supervised radiance field.

TPU-native rebuild of the reference NerfFusion
(/root/reference/fusion/nerf_fusion.py), which drives an instant-ngp fork:
  - growable (preallocated) training-image dataset fed by SLAM packets
    (``update_training_images`` equivalent, :285-289)
  - depth-uncertainty masking modes ours/raw/ours_w_thresh/no_depth
    (:173-183)
  - sRGB->linear conversion (:211-215), depth = 1/idepth (:205)
  - per-spin training (``fit_volume``/``frame()``, :291-307)
  - mapping-time camera-extrinsics refinement (``optimize_extrinsics``,
    :99): per-view SE(3) deltas optimized jointly with the field
  - online eval at TRAINING views (``set_camera_to_training_view``,
    :411): renders in the map's own frame, so monocular scale/gauge
    drift cannot corrupt PSNR; PSNR + depth-L1(cm, outliers truncated
    at 2 m) appended to ``results`` every ``eval_every`` iterations
    (:304-306, :379-485)

Packets are resized on ingest to the fusion resolution (the reference
instead requires --height/--width to match the dataset), so any SLAM
resolution feeds any fusion config.

The NGP itself is ours (fusion/ngp.py): hash encode + bf16 MLPs + volume
rendering in one jitted Adam step.  Scene coordinates are normalized by
(offset, scale) into the unit cube; ray parameter t equals camera z-depth
so supervised depths compare directly.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .ngp import (NGPConfig, NGPParams, init_ngp, occupancy_grid,
                  ray_occ_interval, render_rays, sample_along_rays,
                  sample_in_interval)
from ..geometry import se3
from ..utils.runtime import count_dispatch


# allowed lax.scan lengths for fit_volume chunks: each distinct static
# length is its own XLA executable, so ad-hoc iteration counts are split
# into chunks drawn from this set to bound warm-up compilation
_SCAN_SIZES = (200, 100, 50, 25, 10, 5, 2, 1)


def srgb_to_linear(img: jax.Array) -> jax.Array:
    """utils/utils.py:136-152 equivalent."""
    return jnp.where(img <= 0.04045, img / 12.92,
                     ((img + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(img: jax.Array) -> jax.Array:
    return jnp.where(img <= 0.0031308, img * 12.92,
                     1.055 * jnp.clip(img, 1e-8) ** (1 / 2.4) - 0.055)


def mse2psnr(mse) -> float:
    return float(-10.0 * np.log10(np.maximum(mse, 1e-12)))


@dataclass
class NerfFusionConfig:
    buffer: int = 64                  # max training images
    height: int = 120
    width: int = 160
    batch_rays: int = 4096
    mask_type: str = "ours"           # ours | raw | ours_w_thresh | no_depth
    iters_per_spin: int = 10          # ngp frames per pipeline spin
    ngp: NGPConfig = field(default_factory=NGPConfig)
    # scene normalization: unit = (world - offset) * scale
    scale: float = 0.25
    offset: tuple = (0.5, 0.5, 0.5)
    eval_every: int = 0               # iterations between results rows
                                      # (0 disables online eval; the CLI
                                      # sets 200 under --eval, matching
                                      # the reference :304-306)
    eval_views: int = 8               # views per online-eval row
    # mapping-time extrinsics refinement (reference nerf_fusion.py:99):
    # per-view SE(3) deltas on the training poses, optimized in
    # coordinate descent with the field.  Default OFF (the reference
    # defaults on): measured here, refinement only converges when the
    # field formed near the true poses -- pose gradients against a field
    # co-adapted to wrong poses are directionally uninformative (cosine
    # ~0.05 with the true error direction), so switching it on only
    # helps when SLAM poses are already good, and costs ~15% step time.
    optimize_extrinsics: bool = False
    extrinsics_lr: float = 1e-3
    extrinsics_start: int = 500   # iterations before pose opt engages
                                  # (early field is too noisy to trust)
    # coordinate-descent schedule: after `extrinsics_start`, each
    # `extrinsics_period`-iteration cycle ends with
    # `extrinsics_pose_iters` POSE-ONLY steps (field frozen).  Joint
    # simultaneous updates diverge: the field co-adapts to the wrong
    # poses until the mean pose gradient is below Adam's noise floor.
    # Measured recovery from 0.01-rad/unit perturbations on a formed
    # field: pose-only phases (period == pose_iters) cut pose error 10x
    # in 200 iters; interleaving field updates 1:1 stalls at ~1.3x.
    extrinsics_period: int = 100
    extrinsics_pose_iters: int = 25
    # free-view render acceleration (reference nerf_fusion.py:94-95 +
    # the instant-ngp occupancy march, rebuilt TPU-first): a dense
    # sigma grid over the unit cube bounds each eval ray's sample
    # interval, so renders spend `render_samples` samples on the
    # occupied span instead of 128 spread over [near, far]
    render_accel: bool = True
    # rows per render program; smaller chunks shrink the per-dispatch
    # program (the hash backbone's full-size render programs trip a
    # device fault on the tunneled chip)
    render_rows_per_chunk: int = 40
    occ_res: int = 64                 # occupancy grid resolution
    occ_thresh: float = 4.0           # sigma threshold (normalized units)
    occ_refresh_every: int = 200      # refresh grid every N train iters
    render_samples: int = 48          # fine samples/ray (accel path)
    # dynamic render resolution (reference dynamic_res_target_fps=15,
    # nerf_fusion.py:95): pick a downscale from _RENDER_SCALES so one
    # full-frame render fits the budget; output is upsampled back
    render_target_ms: float = 66.0    # ~15 fps per rendered view
    dynamic_render_res: bool = False  # opt-in (eval wants full res)
    # depth-supervision annealing (reference depth_supervision_lambda
    # decay, nerf_fusion.py:109-111): depth is a strong early prior and
    # an increasingly wrong one as RGB refines geometry past sensor
    # noise -- multiply depth_weight by lerp(1 -> floor) over
    # `depth_anneal_iters` iterations (0 disables)
    depth_anneal_iters: int = 0
    depth_anneal_floor: float = 0.25


class TrainSet(NamedTuple):
    """Preallocated growable dataset (create_empty_nerf_dataset equiv)."""
    c2w: jax.Array          # (N, 4, 4) world_T_cam (normalized scene)
    images: jax.Array       # (N, H, W, 3) linear RGB fp32
    depths: jax.Array       # (N, H, W) z-depth in normalized units, <0 invalid
    depths_cov: jax.Array   # (N, H, W) depth variance (normalized units^2)
    gt_depths: jax.Array    # (N, H, W) GT z-depth (normalized), eval only
    intrinsics: jax.Array   # (N, 4)
    valid: jax.Array        # (N,) 0/1


class NerfFusion:
    """Mapping module; API mirrors the reference class."""

    def __init__(self, cfg: NerfFusionConfig, seed: int = 0,
                 device=None):
        """``device``: optional jax.Device pinning ALL mapping state and
        compute (the reference's second GPU, slam_demo.py:63-71); SLAM
        packets are device_put across ICI on ingest."""
        self.cfg = cfg
        self.device = device
        self._seed = seed
        lr = cfg.ngp.pe_lr if cfg.ngp.encoding == "pe" else cfg.ngp.lr
        self.opt = optax.adam(lr, b1=0.9, b2=0.99, eps=1e-15)
        self.pose_opt = optax.adam(cfg.extrinsics_lr)
        self.reset()

    def reset(self):
        """Fresh field/optimizer/training-set state on the SAME instance
        (jits here key on ``self``: a long-lived instance keeps its
        compiled executables across sequences)."""
        cfg = self.cfg
        device = self.device
        key = jax.random.PRNGKey(self._seed)
        self.params, self.field = init_ngp(key, cfg.ngp)
        (self.opt_state, self.pose_deltas,
         self.pose_opt_state, self.train_set) = self._init_state(
            self.params)
        # rbg PRNG for the per-step sampling streams: threefry key
        # derivation + uniforms measured ~3 ms of every ~17 ms train
        # step on the chip (bench/profile_ngp5.py); rbg is the fast
        # TPU-native generator and splits preserve the impl
        try:
            self.key = jax.random.key(self._seed + 1, impl="rbg")
        except TypeError:       # older jax without impl kwarg
            self.key = jax.random.PRNGKey(self._seed + 1)
        self.iteration = 0
        self.results = []   # eval rows (iteration, wall_s, psnr, l1)
        self.sigma_thresh = None   # GUI-set absolute masking threshold
        self.has_data = False  # host-side flag (avoids device syncs)
        self._t0 = None        # wall-clock origin for results rows
        self._occ_mask = None  # cached occupancy mask (render accel)
        self._occ_iter = -1    # iteration the mask was built at
        self._render_ms = {}   # EMA ms per full render, keyed by scale

        if device is not None:
            put = lambda t: jax.device_put(t, device)
            self.params = jax.tree.map(put, self.params)
            self.opt_state = jax.tree.map(put, self.opt_state)
            self.pose_deltas = put(self.pose_deltas)
            self.pose_opt_state = jax.tree.map(put, self.pose_opt_state)
            self.train_set = jax.tree.map(put, self.train_set)
            self.key = put(self.key)

    @partial(jax.jit, static_argnums=0)
    def _init_state(self, params):
        """Optimizer states + empty training set in ONE program (each
        eager jnp.zeros/optax init otherwise compiles its own single-op
        XLA program -- a first-order cold-warmup cost on the tunnel)."""
        cfg = self.cfg
        N, H, W = cfg.buffer, cfg.height, cfg.width
        # per-view SE(3) pose deltas (right-perturbation of c2w)
        deltas = jnp.zeros((N, 6), jnp.float32)
        train_set = TrainSet(
            c2w=jnp.tile(jnp.eye(4, dtype=jnp.float32), (N, 1, 1)),
            images=jnp.zeros((N, H, W, 3), jnp.float32),
            depths=-jnp.ones((N, H, W), jnp.float32),
            depths_cov=jnp.ones((N, H, W), jnp.float32),
            gt_depths=-jnp.ones((N, H, W), jnp.float32),
            intrinsics=jnp.ones((N, 4), jnp.float32),
            valid=jnp.zeros((N,), jnp.float32))
        return (self.opt.init(params), deltas,
                self.pose_opt.init(deltas), train_set)

    # ------------------------------------------------------------------
    # data ingestion
    # ------------------------------------------------------------------
    def update_training_images(self, ids, c2w, images_srgb_u8, depths,
                               depths_cov, intrinsics, gt_depths=None):
        """Scatter new/updated training views into the preallocated set.

        c2w: (n, 4, 4) world_T_cam in *world* units; depths: (n, H, W)
        z-depth in world units (<0 invalid); depths_cov: variance in
        world units^2.  Inputs at a different (H, W) are resized to the
        fusion resolution (intrinsics rescaled to match).
        """
        cfg = self.cfg
        ids_np = np.asarray(ids, np.int32)
        dev = self.device

        def up(x, dtype):
            x = jnp.asarray(x, dtype)
            # cross-device ingest (dev0 SLAM packets -> mapping device):
            # one explicit ICI transfer, never a CPU bounce (the
            # reference's multi-GPU path bounces via the CPU,
            # visual_frontend.py:1355-1360)
            return jax.device_put(x, dev) if dev is not None else x

        ids = up(ids_np, jnp.int32)
        img = up(images_srgb_u8, jnp.float32) / 255.0
        d = up(depths, jnp.float32)
        dc = up(depths_cov, jnp.float32)
        gtd = (up(gt_depths, jnp.float32) if gt_depths is not None
               else -jnp.ones_like(d))
        intr = up(intrinsics, jnp.float32)

        in_h, in_w = img.shape[1:3]
        if (in_h, in_w) != (cfg.height, cfg.width):
            n = img.shape[0]
            img = jax.image.resize(img, (n, cfg.height, cfg.width, 3),
                                   "linear")
            # nearest for depth-like maps: bilinear would blend the
            # invalid (-1) sentinel into valid neighbours
            d = jax.image.resize(d, (n, cfg.height, cfg.width), "nearest")
            dc = jax.image.resize(dc, (n, cfg.height, cfg.width),
                                  "nearest")
            gtd = jax.image.resize(gtd, (n, cfg.height, cfg.width),
                                   "nearest")
            sx = cfg.width / in_w
            sy = cfg.height / in_h
            intr = intr * jnp.asarray([sx, sy, sx, sy], jnp.float32)

        s = cfg.scale
        off = up(np.asarray(cfg.offset, np.float32), jnp.float32)
        c2w = up(c2w, jnp.float32)
        c2w_n = c2w.at[:, :3, 3].set(c2w[:, :3, 3] * s + off)

        img = srgb_to_linear(img)
        d_n = jnp.where(d > 0, d * s, -1.0)
        gtd_n = jnp.where(gtd > 0, gtd * s, -1.0)
        dc_n = dc * (s * s)

        ts = self.train_set
        self.train_set = TrainSet(
            c2w=ts.c2w.at[ids].set(c2w_n),
            images=ts.images.at[ids].set(img),
            depths=ts.depths.at[ids].set(d_n),
            depths_cov=ts.depths_cov.at[ids].set(dc_n),
            gt_depths=ts.gt_depths.at[ids].set(gtd_n),
            intrinsics=ts.intrinsics.at[ids].set(intr),
            valid=ts.valid.at[ids].set(1.0))
        # fresh SLAM poses supersede any refined deltas for these views
        if self.cfg.optimize_extrinsics:
            self.pose_deltas = self.pose_deltas.at[ids].set(0.0)
        self.has_data = True
        if self._t0 is None:
            self._t0 = time.time()

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _fuse_jit(self, train_set: TrainSet, ids, poses7, images_u8,
                  idepths_up, depths_cov_up, intr8, gt_depths=None,
                  sigma_thresh=None):
        """ONE dispatch per SLAM packet: pose inversion, uncertainty
        masking, idepth->depth, sRGB->linear, resize-to-fusion-res and
        the training-set scatter, fused (the un-jitted path costs ~10
        separate device dispatches per packet)."""
        return self._fuse_body(train_set, ids, poses7, images_u8,
                               idepths_up, depths_cov_up, intr8,
                               gt_depths, sigma_thresh)

    def _fuse_body(self, train_set: TrainSet, ids, poses7, images_u8,
                   idepths_up, depths_cov_up, intr8, gt_depths=None,
                   sigma_thresh=None):
        cfg = self.cfg
        c2w = se3.matrix(se3.inv(poses7))

        # uncertainty masking (reference :173-183)
        if cfg.mask_type == "ours":
            pass
        elif cfg.mask_type == "raw":
            depths_cov_up = jnp.ones_like(depths_cov_up)
        elif cfg.mask_type == "ours_w_thresh":
            sig = jnp.sqrt(jnp.maximum(depths_cov_up, 0))
            # GUI A/S commands set an absolute threshold; the default is
            # the median sigma (reference :179-181 fixed threshold)
            thr = (jnp.quantile(sig, 0.5) if sigma_thresh is None
                   else sigma_thresh)
            idepths_up = jnp.where(sig > thr, -1.0, idepths_up)
        elif cfg.mask_type == "no_depth":
            idepths_up = -jnp.ones_like(idepths_up)
        else:
            raise NotImplementedError(cfg.mask_type)

        depths = jnp.where(idepths_up > 1e-6,
                           1.0 / jnp.maximum(idepths_up, 1e-6), -1.0)

        img = images_u8.astype(jnp.float32) / 255.0
        d = depths.astype(jnp.float32)
        dc = depths_cov_up.astype(jnp.float32)
        gtd = (gt_depths.astype(jnp.float32) if gt_depths is not None
               else -jnp.ones_like(d))
        intr = intr8.astype(jnp.float32)

        in_h, in_w = img.shape[1:3]
        if (in_h, in_w) != (cfg.height, cfg.width):
            n = img.shape[0]
            img = jax.image.resize(img, (n, cfg.height, cfg.width, 3),
                                   "linear")
            d = jax.image.resize(d, (n, cfg.height, cfg.width),
                                 "nearest")
            dc = jax.image.resize(dc, (n, cfg.height, cfg.width),
                                  "nearest")
            gtd = jax.image.resize(gtd, (n, cfg.height, cfg.width),
                                   "nearest")
            sx = cfg.width / in_w
            sy = cfg.height / in_h
            intr = intr * jnp.asarray([sx, sy, sx, sy], jnp.float32)

        s = cfg.scale
        off = jnp.asarray(cfg.offset, jnp.float32)
        c2w_n = c2w.at[:, :3, 3].set(c2w[:, :3, 3] * s + off)
        img = srgb_to_linear(img)
        d_n = jnp.where(d > 0, d * s, -1.0)
        gtd_n = jnp.where(gtd > 0, gtd * s, -1.0)
        dc_n = dc * (s * s)

        ts = train_set
        new = TrainSet(
            c2w=ts.c2w.at[ids].set(c2w_n),
            images=ts.images.at[ids].set(img),
            depths=ts.depths.at[ids].set(d_n),
            depths_cov=ts.depths_cov.at[ids].set(dc_n),
            gt_depths=ts.gt_depths.at[ids].set(gtd_n),
            intrinsics=ts.intrinsics.at[ids].set(intr),
            valid=ts.valid.at[ids].set(1.0))
        return new

    def set_sigma_thresh(self, value: Optional[float]):
        """GUI A/S command target: an ABSOLUTE depth-sigma threshold for
        the ``ours_w_thresh`` masking mode (None restores the median
        default).  Applies to packets fused from now on."""
        self.sigma_thresh = None if value is None else float(value)

    def _sigma_thresh_dev(self):
        return (None if getattr(self, "sigma_thresh", None) is None
                else jnp.float32(self.sigma_thresh))

    def _packet_arrays(self, packet: Dict[str, Any]):
        """Device-array views of a SLAM viz packet (cross-device ingest
        rides ICI when a mapping device is pinned)."""
        ids = np.asarray(packet["viz_idx"])
        V = packet["cam0_poses"].shape[0]
        if ids.shape[0] < V:   # re-pad ids to the padded array size
            ids = np.concatenate(
                [ids, np.full(V - ids.shape[0], ids[-1], ids.dtype)])

        dev = self.device
        arrs = [jnp.asarray(packet["cam0_poses"]),
                jnp.asarray(packet["cam0_images"]),
                jnp.asarray(packet["cam0_idepths_up"]),
                jnp.asarray(packet["cam0_depths_cov_up"]),
                jnp.asarray(packet["cam0_intrinsics"]) * 8.0]
        gt = packet.get("gt_depths")
        if gt is not None:
            arrs.append(jnp.asarray(gt))
        if dev is not None:
            # cross-device ingest (dev0 SLAM packets -> mapping device):
            # one explicit ICI transfer, never a CPU bounce (the
            # reference's multi-GPU path bounces via the CPU,
            # visual_frontend.py:1355-1360)
            arrs = [jax.device_put(a, dev) for a in arrs]
        gt = arrs.pop() if gt is not None else None
        poses7, images, idepths_up, depths_cov_up, intr8 = arrs
        ids_dev = jnp.asarray(ids, jnp.int32)
        if dev is not None:
            ids_dev = jax.device_put(ids_dev, dev)
        return ids_dev, poses7, images, idepths_up, depths_cov_up, \
            intr8, gt

    def fuse(self, packet: Optional[Dict[str, Any]]) -> bool:
        """Consume one SLAM viz packet (process_slam equivalent).
        Returns True when the packet signals end-of-sequence.

        Runs entirely on device in ONE fused dispatch: the reference
        bounces packets through the CPU ("cpu-transfer, which is super
        slow", visual_frontend.py:1355-1360) -- here the padded device
        arrays flow straight into the (device-resident) training set.
        Padded duplicate rows scatter the same data twice -- harmless.
        """
        if packet is None:
            return False
        if packet.get("is_last_frame") and "viz_idx" not in packet:
            return True

        (ids_dev, poses7, images, idepths_up, depths_cov_up, intr8,
         gt) = self._packet_arrays(packet)
        count_dispatch("fuse")
        self.train_set = self._fuse_jit(self.train_set, ids_dev, poses7,
                                        images, idepths_up,
                                        depths_cov_up, intr8, gt,
                                        self._sigma_thresh_dev())
        # fresh SLAM poses supersede any refined deltas for these views
        if self.cfg.optimize_extrinsics:
            self.pose_deltas = self.pose_deltas.at[ids_dev].set(0.0)
        self.has_data = True
        if self._t0 is None:
            self._t0 = time.time()
        return bool(packet.get("is_last_frame", False))

    def fuse_and_fit(self, packet: Optional[Dict[str, Any]],
                     iters: Optional[int] = None) -> bool:
        """Packet ingest + the first training chunk in ONE dispatch;
        remaining iterations (eval-boundary splits) go through
        :meth:`fit_volume`.  Falls back to plain training when the
        packet carries no keyframes."""
        iters = iters or self.cfg.iters_per_spin
        if packet is None:
            self.fit_volume(iters)
            return False
        if packet.get("is_last_frame") and "viz_idx" not in packet:
            self.fit_volume(iters)
            return True

        (ids_dev, poses7, images, idepths_up, depths_cov_up, intr8,
         gt) = self._packet_arrays(packet)
        every = self.cfg.eval_every
        n = int(iters)
        if every > 0:
            n = min(n, every - self.iteration % every)
        n = next(s for s in _SCAN_SIZES if s <= n)
        count_dispatch("fuse_scan")
        (self.params, self.pose_deltas, self.opt_state,
         self.pose_opt_state, self.key, _,
         self.train_set) = self._fuse_scan(
            self.params, self.pose_deltas, self.opt_state,
            self.pose_opt_state, self.train_set, self.key, n,
            jnp.int32(self.iteration), ids_dev, poses7, images,
            idepths_up, depths_cov_up, intr8, gt,
            self._sigma_thresh_dev())
        self.iteration += n
        self.has_data = True
        if self._t0 is None:
            self._t0 = time.time()
        if every > 0 and self.iteration % every == 0:
            self.evaluate_training_views(max_views=self.cfg.eval_views)
        if iters - n > 0:
            self.fit_volume(iters - n)
        return bool(packet.get("is_last_frame", False))

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def _refined_c2w(self, deltas, c2w):
        """Apply per-view SE(3) right-perturbations to c2w matrices."""
        dmat = se3.matrix(se3.exp(deltas))              # (N, 4, 4)
        return jnp.einsum("nij,njk->nik", c2w, dmat)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2, 3, 4))
    def _train_step(self, params, deltas, opt_state, pose_opt_state,
                    train_set: TrainSet, key, pose_enable,
                    field_enable):
        return self._step_body(params, deltas, opt_state, pose_opt_state,
                               train_set, key, pose_enable, field_enable)

    @partial(jax.jit, static_argnums=(0, 7), donate_argnums=(1, 2, 3, 4))
    def _train_scan(self, params, deltas, opt_state, pose_opt_state,
                    train_set: TrainSet, key, n, it0):
        """``n`` (static) train steps fused into one lax.scan program:
        one device dispatch per pipeline spin instead of one per
        iteration (the per-dispatch overhead of the remote-TPU transport
        otherwise costs as much as the step's compute).  The
        coordinate-descent pose/field schedule is reproduced per step
        from the absolute iteration counter ``it0 + i``."""
        return self._scan_steps(params, deltas, opt_state,
                                pose_opt_state, train_set, key, n, it0)

    @partial(jax.jit, static_argnums=(0, 7),
             donate_argnums=(1, 2, 3, 4, 5))
    def _fuse_scan(self, params, deltas, opt_state, pose_opt_state,
                   train_set: TrainSet, key, n, it0, ids, poses7,
                   images_u8, idepths_up, depths_cov_up, intr8,
                   gt_depths=None, sigma_thresh=None):
        """Packet ingest + ``n`` train steps in ONE dispatch: mapping
        costs one device round trip per keyframe (VERDICT r3 #2 target
        'mapping <= 1 dispatch per keyframe')."""
        train_set = self._fuse_body(train_set, ids, poses7, images_u8,
                                    idepths_up, depths_cov_up, intr8,
                                    gt_depths, sigma_thresh)
        if self.cfg.optimize_extrinsics:
            # fresh SLAM poses supersede refined deltas for these views
            deltas = deltas.at[ids].set(0.0)
        out = self._scan_steps(params, deltas, opt_state,
                               pose_opt_state, train_set, key, n, it0)
        return out + (train_set,)

    def _scan_steps(self, params, deltas, opt_state, pose_opt_state,
                    train_set: TrainSet, key, n, it0):
        cfg = self.cfg

        def phase(it):
            if not cfg.optimize_extrinsics:
                return jnp.float32(0.0)
            started = it >= cfg.extrinsics_start
            cyc = jnp.maximum(it - cfg.extrinsics_start, 0) \
                % cfg.extrinsics_period
            pose_only = cyc >= (cfg.extrinsics_period
                                - cfg.extrinsics_pose_iters)
            return (started & pose_only).astype(jnp.float32)

        def anneal(it):
            # depth-supervision annealing (reference nerf_fusion.py:
            # 109-111): lerp the depth weight 1 -> floor over
            # depth_anneal_iters, then hold at the floor
            if cfg.depth_anneal_iters <= 0:
                return jnp.float32(1.0)
            frac = jnp.clip(it.astype(jnp.float32)
                            / cfg.depth_anneal_iters, 0.0, 1.0)
            return 1.0 + (cfg.depth_anneal_floor - 1.0) * frac

        def step(carry, i):
            params, deltas, opt_state, pose_opt_state, key = carry
            key, sub = jax.random.split(key)
            p = phase(it0 + i)
            (params, deltas, opt_state, pose_opt_state, loss, l_rgb,
             l_d) = self._step_body(params, deltas, opt_state,
                                    pose_opt_state, train_set, sub,
                                    p, 1.0 - p, anneal(it0 + i))
            return (params, deltas, opt_state, pose_opt_state, key), loss

        carry, losses = jax.lax.scan(
            step, (params, deltas, opt_state, pose_opt_state, key),
            jnp.arange(n, dtype=jnp.int32))
        params, deltas, opt_state, pose_opt_state, key = carry
        return params, deltas, opt_state, pose_opt_state, key, losses[-1]

    def _step_body(self, params, deltas, opt_state, pose_opt_state,
                   train_set: TrainSet, key, pose_enable,
                   field_enable, depth_mult=1.0):
        cfg = self.cfg
        R = cfg.batch_rays
        kimg, kuv, ksamp = jax.random.split(key, 3)

        # sample rays from valid images (probability proportional to valid)
        p = train_set.valid / jnp.maximum(train_set.valid.sum(), 1.0)
        img_idx = jax.random.choice(kimg, cfg.buffer, (R,), p=p)
        u = jax.random.uniform(kuv, (R, 2))
        px = u[:, 0] * (cfg.width - 1)
        py = u[:, 1] * (cfg.height - 1)
        # nearest-pixel targets (bilinear later if needed)
        xi = jnp.round(px).astype(jnp.int32)
        yi = jnp.round(py).astype(jnp.int32)

        intr = train_set.intrinsics[img_idx]
        fx, fy, cx, cy = jnp.moveaxis(intr, -1, 0)
        dirs_cam = jnp.stack([(xi + 0.5 - cx) / fx,
                              (yi + 0.5 - cy) / fy,
                              jnp.ones((R,))], axis=-1)

        tgt_rgb = train_set.images[img_idx, yi, xi]
        tgt_depth = train_set.depths[img_idx, yi, xi]
        tgt_cov = train_set.depths_cov[img_idx, yi, xi]
        d_valid = (tgt_depth > 0).astype(jnp.float32)

        def loss_fn(params, deltas):
            if cfg.optimize_extrinsics:
                c2w_all = self._refined_c2w(deltas, train_set.c2w)
            else:
                c2w_all = train_set.c2w
            c2w = c2w_all[img_idx]
            # dirs deliberately NOT unit-normalized and NOT scaled: with
            # unit-z camera dirs, t is the z-depth in NORMALIZED map
            # units, matching the supervised depths (train_set.depths)
            dirs = jnp.einsum("rij,rj->ri", c2w[:, :3, :3], dirs_cam)
            origins = c2w[:, :3, 3]
            t = sample_along_rays(ksamp, jax.lax.stop_gradient(origins),
                                  jax.lax.stop_gradient(dirs),
                                  tgt_depth, d_valid, cfg.ngp)
            rgb, depth, acc, _ = render_rays(params, self.field, cfg.ngp,
                                             origins, dirs, t)
            l_rgb = jnp.mean((rgb - tgt_rgb) ** 2)
            # acc-normalized expected depth: raw sum(w*t) under-estimates
            # by the missing tail mass (1-acc), a bias pose optimization
            # would otherwise absorb by systematically pulling every
            # camera backward along its optical axis
            depth = depth / jnp.maximum(acc, 0.25)
            w = d_valid / (tgt_cov / (cfg.scale ** 2) + 1e-2)
            nv = jnp.maximum(jnp.sum(d_valid), 1.0)
            l_d = jnp.sum(w * (depth - tgt_depth) ** 2) / nv
            # opacity supervision: without it the normalized depth loss
            # has a degenerate optimum at partial opacity (measured:
            # acc settles ~0.5, raw depth 2x short); rays that hit a
            # sensed surface must saturate
            l_acc = jnp.sum(d_valid * (1.0 - acc) ** 2) / nv
            loss = (cfg.ngp.rgb_weight * l_rgb
                    + cfg.ngp.depth_weight * depth_mult * (l_d + l_acc))
            return loss, (l_rgb, l_d)

        (loss, (l_rgb, l_d)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, deltas)
        updates, opt_state = self.opt.update(grads[0], opt_state, params)
        # field_enable (0/1) freezes the field during pose-only phases:
        # joint simultaneous updates measurably DIVERGE (the field
        # co-adapts to wrong poses and the mean pose gradient collapses
        # to Adam-noise level); coordinate descent converges
        params = optax.apply_updates(
            params, jax.tree.map(lambda u: u * field_enable, updates))
        if cfg.optimize_extrinsics:
            # keep the first view pinned: it anchors the map gauge;
            # pose_enable (0/1) delays refinement until the field has
            # formed (cfg.extrinsics_start)
            dgrad = grads[1].at[0].set(0.0) * pose_enable
            dupd, pose_opt_state = self.pose_opt.update(
                dgrad, pose_opt_state, deltas)
            deltas = optax.apply_updates(deltas, dupd * pose_enable)
        return (params, deltas, opt_state, pose_opt_state, loss, l_rgb,
                l_d)

    def fit_volume(self, iters: Optional[int] = None):
        """Run training iterations; returns the last loss as a DEVICE
        scalar (fetching it forces a sync -- callers that only train
        should not convert).  Appends a results row every
        ``cfg.eval_every`` iterations (reference :304-306)."""
        iters = iters or self.cfg.iters_per_spin
        if not self.has_data:
            return 0.0
        every = self.cfg.eval_every
        loss = 0.0
        remaining = int(iters)
        while remaining > 0:
            n = remaining
            if every > 0:
                n = min(n, every - self.iteration % every)
            # quantize the (static) scan length to a fixed size set so
            # ad-hoc iteration counts compile a bounded number of scan
            # programs (each distinct n is a fresh XLA executable)
            n = next(s for s in _SCAN_SIZES if s <= n)
            count_dispatch("ngp_scan")
            (self.params, self.pose_deltas, self.opt_state,
             self.pose_opt_state, self.key, loss) = self._train_scan(
                self.params, self.pose_deltas, self.opt_state,
                self.pose_opt_state, self.train_set, self.key, n,
                jnp.int32(self.iteration))
            self.iteration += n
            remaining -= n
            if every > 0 and self.iteration % every == 0:
                self.evaluate_training_views(
                    max_views=self.cfg.eval_views)
        return loss

    # ------------------------------------------------------------------
    # rendering / eval
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 3))
    def _build_occ(self, params, thresh, res: int):
        """Sigma grid -> boolean occupancy, one dispatch.  3x3x3
        max-pool dilation so surfaces straddling cell borders are kept
        (instant-ngp dilates its bitfield the same way)."""
        sig = occupancy_grid(params, self.field, self.cfg.ngp, res)
        occ = sig > thresh
        occf = occ.astype(jnp.float32)[None, ..., None]
        dil = jax.lax.reduce_window(
            occf, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1),
            (1, 1, 1, 1, 1), "SAME")[0, ..., 0]
        return dil > 0.0

    def _ensure_occ(self):
        """(Re)build the cached occupancy mask if stale."""
        cfg = self.cfg
        if (self._occ_mask is None
                or self.iteration - self._occ_iter
                >= cfg.occ_refresh_every):
            self._occ_mask = self._build_occ(
                self.params, jnp.float32(cfg.occ_thresh), cfg.occ_res)
            self._occ_iter = self.iteration
        return self._occ_mask

    @partial(jax.jit, static_argnums=(0, 5))
    def _render_rows(self, params, c2w, intr, key, w: int, ys):
        """Render a block of image rows at width w: full 128-sample
        path (no occupancy; used until the field has trained)."""
        cfg = self.cfg
        origins, dirs = self._row_rays(c2w, intr, w, ys)
        R = dirs.shape[0]
        t = sample_along_rays(key, origins, dirs,
                              jnp.zeros((R,)), jnp.zeros((R,)), cfg.ngp)
        return self._finish_rows(params, origins, dirs, t, w, ys)

    @partial(jax.jit, static_argnums=(0, 6))
    def _render_rows_accel(self, params, occ_mask, c2w, intr, key,
                           w: int, ys):
        """Occupancy-bounded render: cheap coarse march over the mask
        bounds each ray's [t_lo, t_hi], then `render_samples` stratified
        samples inside it -- 128 -> ~48 MLP samples/ray at equal or
        better placement (empty space contributes none of them)."""
        cfg = self.cfg
        origins, dirs = self._row_rays(c2w, intr, w, ys)
        t_lo, t_hi, _ = ray_occ_interval(occ_mask, origins, dirs,
                                         cfg.ngp)
        t = sample_in_interval(key, t_lo, t_hi, cfg.render_samples)
        return self._finish_rows(params, origins, dirs, t, w, ys)

    def _row_rays(self, c2w, intr, w: int, ys):
        fx, fy, cx, cy = intr
        xs = jnp.arange(w)
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        dirs_cam = jnp.stack([(xx + 0.5 - cx) / fx,
                              (yy + 0.5 - cy) / fy,
                              jnp.ones_like(xx, jnp.float32)], axis=-1)
        # unit-z camera dirs, unscaled: t = z-depth in normalized units
        dirs = dirs_cam.reshape(-1, 3) @ c2w[:3, :3].T
        origins = jnp.broadcast_to(c2w[:3, 3], dirs.shape)
        return origins, dirs

    def _finish_rows(self, params, origins, dirs, t, w: int, ys):
        rgb, depth, acc, _ = render_rays(params, self.field,
                                         self.cfg.ngp, origins, dirs, t)
        # conditional expected depth (normalize out the missed tail
        # mass); a saturated ray (acc ~ 1) is unchanged
        depth = depth / jnp.maximum(acc, 0.25)
        n = ys.shape[0]
        return (rgb.reshape(n, w, 3), depth.reshape(n, w),
                acc.reshape(n, w))

    def _render_normalized(self, c2w_n: np.ndarray, intrinsics,
                           rows_per_chunk: int = 0, scale: int = 1):
        """Render at a pose already in the normalized map frame.
        ``scale`` > 1 renders at (H/s, W/s) and upsamples (dynamic
        render resolution).  Returns (srgb rgb [H,W,3] in [0,1], depth
        in normalized units)."""
        cfg = self.cfg
        H, W = cfg.height, cfg.width
        h = (H + scale - 1) // scale
        w = (W + scale - 1) // scale
        intr = np.asarray(intrinsics, np.float32) / scale
        if rows_per_chunk <= 0:
            rows_per_chunk = cfg.render_rows_per_chunk
        rows_per_chunk = min(rows_per_chunk, h)
        accel = cfg.render_accel and self.iteration > 0
        occ = self._ensure_occ() if accel else None
        t_start = time.perf_counter()
        rgb_rows, d_rows = [], []
        key = jax.random.PRNGKey(0)
        c2w_j = jnp.asarray(c2w_n, jnp.float32)
        intr_j = jnp.asarray(intr)
        for y0 in range(0, h, rows_per_chunk):
            ys = jnp.arange(y0, min(y0 + rows_per_chunk, h))
            pad = 0
            if ys.shape[0] < rows_per_chunk:   # pad for static shape
                pad = rows_per_chunk - ys.shape[0]
                ys = jnp.concatenate([ys, jnp.full((pad,), h - 1)])
            if accel:
                rgb, d, acc = self._render_rows_accel(
                    self.params, occ, c2w_j, intr_j, key, w, ys)
            else:
                rgb, d, acc = self._render_rows(
                    self.params, c2w_j, intr_j, key, w, ys)
            if pad:
                rgb, d = rgb[:-pad], d[:-pad]
            rgb_rows.append(rgb)
            d_rows.append(d)
        rgb = np.asarray(jnp.concatenate(rgb_rows, 0))
        depth = np.asarray(jnp.concatenate(d_rows, 0))
        ms = 1e3 * (time.perf_counter() - t_start)
        prev = self._render_ms.get(scale)
        self._render_ms[scale] = ms if prev is None \
            else 0.8 * prev + 0.2 * ms
        if scale > 1:      # nearest upsample back to full frame
            rgb = rgb.repeat(scale, 0).repeat(scale, 1)[:H, :W]
            depth = depth.repeat(scale, 0).repeat(scale, 1)[:H, :W]
        rgb = np.clip(np.asarray(linear_to_srgb(jnp.asarray(rgb))), 0, 1)
        return rgb, depth

    def _pick_render_scale(self) -> int:
        """Dynamic render resolution (reference dynamic_res targeting
        ~15 fps, nerf_fusion.py:95): smallest downscale whose measured
        (or quadratically extrapolated) render time fits the budget."""
        if not self.cfg.dynamic_render_res:
            return 1
        budget = self.cfg.render_target_ms
        for s in (1, 2, 4):
            ms = self._render_ms.get(s)
            if ms is None and self._render_ms:
                s0, v0 = next(iter(self._render_ms.items()))
                ms = v0 * (s0 * s0) / (s * s)
            if ms is None or ms <= budget:
                return s
        return 4

    def render_image(self, c2w_world: np.ndarray, intrinsics: np.ndarray,
                     rows_per_chunk: int = 0):
        """Full-frame render at a world-frame c2w pose.  Returns
        (rgb srgb [H,W,3], depth world-units [H,W])."""
        cfg = self.cfg
        c2w = np.asarray(c2w_world, np.float32).copy()
        c2w[:3, 3] = c2w[:3, 3] * cfg.scale + np.asarray(cfg.offset)
        rgb, depth = self._render_normalized(
            c2w, intrinsics, rows_per_chunk,
            scale=self._pick_render_scale())
        return rgb, depth / cfg.scale

    def render_training_view(self, i: int, rows_per_chunk: int = 0):
        """Render at training view i's (refined) pose, in the map frame
        (reference set_camera_to_training_view, nerf_fusion.py:411)."""
        ts = self.train_set
        c2w = ts.c2w[i:i + 1]
        if self.cfg.optimize_extrinsics:
            c2w = self._refined_c2w(self.pose_deltas[i:i + 1], c2w)
        return self._render_normalized(np.asarray(c2w[0]),
                                       np.asarray(ts.intrinsics[i]),
                                       rows_per_chunk)

    def evaluate_training_views(self, max_views: int = 8):
        """PSNR + depth-L1(cm) at training views -- the map's own frame,
        immune to monocular scale/gauge drift (reference eval_gt_traj at
        set_camera_to_training_view, :379-485).  Appends a results row.

        depth_l1 compares against GT depth when packets carried it;
        depth_l1_aligned additionally median-scales the rendered depth
        to GT (monocular runs have a free global scale)."""
        cfg = self.cfg
        valid = np.asarray(self.train_set.valid)
        idx = np.nonzero(valid > 0)[0]
        if idx.size == 0:
            return None
        if idx.size > max_views:
            idx = idx[np.linspace(0, idx.size - 1, max_views).astype(int)]
        psnrs, l1s, l1s_aligned = [], [], []
        imgs = np.asarray(self.train_set.images[jnp.asarray(idx)])
        gtds = np.asarray(self.train_set.gt_depths[jnp.asarray(idx)])
        for j, i in enumerate(idx):
            rgb, depth = self.render_training_view(int(i))
            gt = np.clip(np.asarray(
                linear_to_srgb(jnp.asarray(imgs[j]))), 0, 1)
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(mse2psnr(mse))
            gtd = gtds[j] / cfg.scale          # back to world units
            dep = depth / cfg.scale
            ok = gtd > 0
            if ok.any():
                err = np.abs(dep - gtd)[ok]
                err = err[err < 2.0]           # truncate outliers at 2 m
                if err.size:
                    l1s.append(float(err.mean()) * 100.0)
                s = np.median(gtd[ok]) / max(np.median(dep[ok]), 1e-6)
                err_a = np.abs(dep * s - gtd)[ok]
                err_a = err_a[err_a < 2.0]
                if err_a.size:
                    l1s_aligned.append(float(err_a.mean()) * 100.0)
        row = {"iteration": self.iteration,
               "wall_s": (round(time.time() - self._t0, 2)
                          if self._t0 else 0.0),
               "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
               "depth_l1_cm": (float(np.mean(l1s)) if l1s
                               else float("nan")),
               "depth_l1_aligned_cm": (float(np.mean(l1s_aligned))
                                       if l1s_aligned else float("nan"))}
        self.results.append(row)
        return row

    def write_results_csv(self, path: str):
        """results.csv with one row per online eval (reference
        :304-306); consumed by scripts/convergence_plots.py."""
        cols = ["iteration", "wall_s", "psnr", "depth_l1_cm",
                "depth_l1_aligned_cm"]
        with open(path, "w") as f:
            f.write(",".join(cols) + "\n")
            for row in self.results:
                f.write(",".join(str(row.get(c, "")) for c in cols)
                        + "\n")

    def extract_mesh(self, path: str = "fusion_mesh.obj",
                     resolution: int = 128, iso: float = 10.0,
                     chunk: int = 8):
        """Density iso-surface mesh (the GUI's 'M' mesh-build command;
        reference builds from the TSDF, gui/open3d_gui.py:181-185 --
        here the radiance field's density is marched directly).
        Returns (verts world-frame, faces)."""
        from .ngp import query
        from . import mesher
        cfg = self.cfg
        n = resolution
        xs = (np.arange(n) + 0.5) / n
        sdf = np.empty((n, n, n), np.float32)
        dirs = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0]), (n * n, 3))
        for z0 in range(0, n, chunk):
            zc = min(chunk, n - z0)
            g = np.stack(np.meshgrid(xs[z0:z0 + zc], xs, xs,
                                     indexing="ij"), axis=-1)
            pos = jnp.asarray(g.reshape(-1, 3)[:, ::-1].copy())  # x,y,z
            if self.device is not None:
                pos = jax.device_put(pos, self.device)
            sig = []
            for i in range(zc):
                s, _ = query(self.params, self.field, cfg.ngp,
                             pos[i * n * n:(i + 1) * n * n], dirs)
                sig.append(np.asarray(s))
            sdf[z0:z0 + zc] = (iso - np.stack(sig).reshape(zc, n, n))
        verts, faces = mesher.marching_tetrahedra(sdf)
        if verts.shape[0]:
            # grid index (z, y, x) -> unit cube -> world
            verts = verts[:, ::-1] / n
            verts = (verts - np.asarray(cfg.offset)) / cfg.scale
            if path:
                mesher.write_obj(path, verts, faces)
        return verts, faces

    def evaluate(self, gt_images_u8, gt_depths, c2ws, intrinsics,
                 max_views: int = 8):
        """PSNR + depth-L1(cm) over externally provided world-frame
        views.  NOTE: for monocular runs the map frame differs from the
        GT frame by a similarity -- align c2ws first or prefer
        evaluate_training_views."""
        psnrs, l1s = [], []
        n = min(len(c2ws), max_views)
        for i in range(n):
            rgb, depth = self.render_image(c2ws[i], intrinsics[i])
            gt = np.asarray(gt_images_u8[i], np.float32) / 255.0
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(mse2psnr(mse))
            if gt_depths is not None:
                gtd = np.asarray(gt_depths[i], np.float32)
                ok = gtd > 0
                err = np.abs(depth - gtd)[ok]
                err = err[err < 2.0]  # truncate outliers at 2 m
                if err.size:
                    l1s.append(float(err.mean()) * 100.0)
        row = {"iteration": self.iteration,
               "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
               "depth_l1_cm": float(np.mean(l1s)) if l1s else float("nan")}
        self.results.append(row)
        return row
