"""Uncertainty-weighted TSDF fusion (Sigma-Fusion) on a dense voxel grid.

TPU-native rebuild of the reference TsdfFusion
(/root/reference/fusion/tsdf_fusion.py): the Open3D VoxelBlockGrid +
custom integrate kernel (:232-302) become one jitted dense update over a
(G,G,G) grid -- on TPU a dense masked sweep beats sparse block hashing.

Semantics preserved:
  - per-pixel integration weight = 1/sigma_depth (:188, ``pow(-1).sqrt``
    of the depth covariance); ``uniform`` mode uses weight 1
  - sdf = depth_reading - voxel_cam_z, inliers need reading in
    (0, max_depth) and sdf >= -trunc; sdf saturated at +trunc and
    normalized (:272-276)
  - weighted running average of tsdf and color, weights saturated at
    max_weight (:280-300)
  - masking by depth sigma threshold (``sigma`` vs ``tsdf`` modes,
    :49-52, :545-554)
  - ray-cast rendering for PSNR / depth-L1 eval (:319-484)
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3


@dataclass
class TsdfFusionConfig:
    grid_size: int = 192              # voxels per axis
    volume_extent: float = 6.0        # metres covered per axis
    volume_origin: tuple = (-3.0, -3.0, -1.0)
    sdf_trunc_voxels: float = 4.0     # truncation band in voxel units
    max_depth: float = 5.0
    max_weight: float = 500.0
    depth_mask_type: str = "weighted"  # weighted (sigma) | uniform (tsdf)
    max_depth_sigma_thresh: float = 5.0
    # bounded keyframe-packet history kept for volume rebuilds at a new
    # sigma threshold (reference tsdf_fusion.py:486-543, GUI 'Z' key)
    history_size: int = 96

    @property
    def voxel_size(self) -> float:
        return self.volume_extent / self.grid_size

    @property
    def sdf_trunc(self) -> float:
        return self.sdf_trunc_voxels * self.voxel_size

    @classmethod
    def high_fidelity(cls, **kw) -> "TsdfFusionConfig":
        """Reference-fidelity preset: 1.5 cm voxels (the reference's
        VoxelBlockGrid runs 6/512 m ~ 1.17 cm in hashed 16^3 blocks,
        fusion/tsdf_fusion.py:63-86; on TPU a dense 384^3 sweep -- 384 =
        3*128 lanes -- replaces block hashing).  State is ~1.1 GB fp32;
        integration stays one jitted masked sweep."""
        kw.setdefault("grid_size", 384)
        kw.setdefault("volume_extent", 5.76)       # 5.76/384 = 1.5 cm
        kw.setdefault("volume_origin", (-2.88, -2.88, -1.0))
        return cls(**kw)


class TsdfVolume(NamedTuple):
    tsdf: jax.Array     # (G, G, G)
    weight: jax.Array   # (G, G, G)
    # CHANNEL-MAJOR: a (G, G, G, 3) buffer tiles its minor dims (G, 3)
    # on TPU, padding 3 -> 128 lanes (42x bloat: 29 GB at 384^3, the
    # high-fidelity preset's HBM blocker); (3, G, G, G) tiles (G, G)
    # perfectly.  Host consumers transpose on export.
    color: jax.Array    # (3, G, G, G)


class TsdfFusion:
    """Mapping backend; mirrors the reference TsdfFusion API surface."""

    def __init__(self, cfg: Optional[TsdfFusionConfig] = None):
        self.cfg = cfg or TsdfFusionConfig()
        # live sigma threshold (GUI A/S commands adjust it; a rebuild
        # replays the history under the new value)
        self.sigma_thresh = self.cfg.max_depth_sigma_thresh
        # integrated-packet ring (device arrays), bounded by history_size
        self.history: list = []
        self.volume = self.reset_volume()

    def reset_volume(self) -> TsdfVolume:
        G = self.cfg.grid_size
        self.volume = TsdfVolume(
            tsdf=jnp.ones((G, G, G), jnp.float32),
            weight=jnp.zeros((G, G, G), jnp.float32),
            color=jnp.zeros((3, G, G, G), jnp.float32))
        return self.volume

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _integrate(self, volume: TsdfVolume, w2c: jax.Array,
                   intrinsics: jax.Array, depth: jax.Array,
                   depth_weight: jax.Array, color: jax.Array) -> TsdfVolume:
        """Integrate one frame.  w2c: (4,4) cam_T_world matrix;
        depth/depth_weight: (H, W); color: (H, W, 3) in [0,1]."""
        cfg = self.cfg
        G = cfg.grid_size
        H, W = depth.shape

        # voxel centers -> camera frame, structure-of-arrays: every
        # tensor stays (G, G, G) so XLA tiles (G, G) minor dims -- an
        # (N, 3) point list would pad 3 -> 128 lanes (29 GB at 384^3)
        ax = jnp.arange(G, dtype=jnp.float32)
        origin = jnp.asarray(cfg.volume_origin, jnp.float32)
        X = (origin[0] + (ax + 0.5) * cfg.voxel_size)[:, None, None]
        Y = (origin[1] + (ax + 0.5) * cfg.voxel_size)[None, :, None]
        Z = (origin[2] + (ax + 0.5) * cfg.voxel_size)[None, None, :]

        R = w2c[:3, :3]
        t = w2c[:3, 3]
        camx = R[0, 0] * X + R[0, 1] * Y + R[0, 2] * Z + t[0]
        camy = R[1, 0] * X + R[1, 1] * Y + R[1, 2] * Z + t[1]
        d = R[2, 0] * X + R[2, 1] * Y + R[2, 2] * Z + t[2]
        fx, fy, cx, cy = intrinsics
        u = jnp.round(fx * camx / d + cx).astype(jnp.int32)
        v = jnp.round(fy * camy / d + cy).astype(jnp.int32)

        in_img = (d > 0) & (u >= 0) & (v >= 0) & (u < W) & (v < H)
        uc = jnp.clip(u, 0, W - 1)
        vc = jnp.clip(v, 0, H - 1)
        reading = depth[vc, uc]
        wr = depth_weight[vc, uc]

        sdf = reading - d
        inlier = in_img & (reading > 0) & (reading < cfg.max_depth) & \
            (sdf >= -cfg.sdf_trunc)
        sdf = jnp.minimum(sdf, cfg.sdf_trunc) / cfg.sdf_trunc
        wr = jnp.where(inlier, wr, 0.0)

        w_old = volume.weight
        wp = w_old + wr
        wp_safe = jnp.maximum(wp, 1e-8)
        keep = wr > 0
        tsdf_new = (w_old * volume.tsdf + wr * sdf) / wp_safe
        tsdf_out = jnp.where(keep, tsdf_new, volume.tsdf)
        color_out = jnp.stack([
            jnp.where(keep,
                      (w_old * volume.color[c] + wr * color[..., c][vc, uc])
                      / wp_safe, volume.color[c])
            for c in range(3)])
        w_out = jnp.where(keep, jnp.minimum(wp, cfg.max_weight), w_old)

        return TsdfVolume(tsdf=tsdf_out, weight=w_out, color=color_out)

    def integrate_frame(self, w2c, intrinsics, depth, depth_cov,
                        color_u8, record: bool = True):
        """Host wrapper: applies the sigma weighting / masking policy
        under the LIVE ``self.sigma_thresh`` and (record=True) appends
        the packet to the bounded history ring so :meth:`rebuild` can
        replay it at a different threshold (reference keeps every fused
        packet, tsdf_fusion.py:486-543)."""
        cfg = self.cfg
        depth = jnp.asarray(depth, jnp.float32)
        cov = jnp.asarray(depth_cov, jnp.float32)
        w2c = jnp.asarray(w2c, jnp.float32)
        intrinsics = jnp.asarray(intrinsics, jnp.float32)
        color = jnp.asarray(color_u8, jnp.float32) / 255.0
        if record:
            self.history.append((w2c, intrinsics, depth, cov, color))
            if len(self.history) > cfg.history_size:
                self.history = self.history[-cfg.history_size:]
        self.volume = self._integrate(self.volume, w2c, intrinsics,
                                      depth,
                                      self._mask_weight(depth, cov),
                                      color)

    def set_sigma_thresh(self, value: float):
        """GUI A/S command target: future integrations mask at the new
        threshold (call :meth:`rebuild` to re-filter fused history)."""
        self.sigma_thresh = float(value)

    def rebuild(self, sigma_thresh: Optional[float] = None):
        """Reset the volume and replay the integrated-packet history
        under ``sigma_thresh`` (GUI 'Z' command; reference
        tsdf_fusion.py:486-543 + open3d_gui.py:193)."""
        if sigma_thresh is not None:
            self.sigma_thresh = float(sigma_thresh)
        self.reset_volume()
        for w2c, intr, depth, cov, color in list(self.history):
            self.volume = self._integrate(
                self.volume, w2c, intr, depth,
                self._mask_weight(depth, cov), color)

    def _mask_weight(self, depth, cov):
        if self.cfg.depth_mask_type == "uniform":
            return jnp.ones_like(depth)
        wgt = 1.0 / jnp.sqrt(jnp.maximum(cov, 1e-12))
        return jnp.where(jnp.sqrt(jnp.maximum(cov, 0))
                         > self.sigma_thresh, 0.0, wgt)

    def fuse(self, packet: Optional[Dict]) -> bool:
        """Consume a frontend viz packet (build_volume equivalent)."""
        if packet is None:
            return False
        if packet.get("is_last_frame") and "viz_idx" not in packet:
            return True
        n = int(packet.get("viz_count",
                           np.asarray(packet["viz_idx"]).shape[0]))
        poses7 = jnp.asarray(np.asarray(packet["cam0_poses"])[:n])
        w2cs = se3.matrix(poses7)
        idepths = np.asarray(packet["cam0_idepths_up"])[:n]
        covs = np.asarray(packet["cam0_depths_cov_up"])[:n]
        imgs = np.asarray(packet["cam0_images"])[:n]
        intr = np.asarray(packet["cam0_intrinsics"])[:n] * 8.0
        with np.errstate(divide="ignore"):
            depths = np.where(idepths > 1e-6, 1.0 / idepths, 0.0)
        for i in range(depths.shape[0]):
            self.integrate_frame(w2cs[i], intr[i], depths[i], covs[i],
                                 imgs[i])
        return bool(packet.get("is_last_frame", False))

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 3))
    def _raycast(self, volume: TsdfVolume, c2w: jax.Array,
                 shape: Tuple[int, int], intrinsics: jax.Array,
                 n_steps: int = 192):
        """Fixed-step ray march to the tsdf zero crossing; returns
        (rgb (H,W,3), depth (H,W))."""
        cfg = self.cfg
        H, W = shape
        G = cfg.grid_size
        fx, fy, cx, cy = intrinsics
        u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                            jnp.arange(H, dtype=jnp.float32) + 0.5)
        dirs_cam = jnp.stack([(u - cx) / fx, (v - cy) / fy,
                              jnp.ones_like(u)], -1)
        dirs = dirs_cam @ c2w[:3, :3].T
        origin = c2w[:3, 3]

        step = cfg.max_depth / n_steps
        ts = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) * step

        vo = jnp.asarray(cfg.volume_origin, jnp.float32)

        def sample_grid(pts):
            """Nearest-voxel tsdf/weight/color at world points (...,3)."""
            g = (pts - vo) / cfg.voxel_size - 0.5
            gi = jnp.clip(jnp.round(g).astype(jnp.int32), 0, G - 1)
            inb = jnp.all((g >= 0) & (g <= G - 1), axis=-1)
            tv = volume.tsdf[gi[..., 0], gi[..., 1], gi[..., 2]]
            wv = volume.weight[gi[..., 0], gi[..., 1], gi[..., 2]]
            cv = jnp.stack([volume.color[c][gi[..., 0], gi[..., 1],
                                            gi[..., 2]]
                            for c in range(3)], axis=-1)
            tv = jnp.where(inb & (wv > 0), tv, 1.0)
            return tv, cv, inb

        # march: find the first sign change of tsdf along each ray
        def body(carry, t):
            prev_tsdf, hit_t, hit_col, found = carry
            pts = origin + t * dirs
            tv, cv, inb = sample_grid(pts)
            crossing = (prev_tsdf > 0) & (tv <= 0) & ~found
            # linear interpolation of the crossing point
            frac = prev_tsdf / jnp.maximum(prev_tsdf - tv, 1e-6)
            t_hit = t - step + frac * step
            hit_t = jnp.where(crossing, t_hit, hit_t)
            hit_col = jnp.where(crossing[..., None], cv, hit_col)
            found = found | crossing
            return (tv, hit_t, hit_col, found), None

        init = (jnp.ones((H, W)), jnp.zeros((H, W)),
                jnp.zeros((H, W, 3)), jnp.zeros((H, W), bool))
        (last, hit_t, hit_col, found), _ = jax.lax.scan(body, init, ts)

        # dirs has unit z in the camera frame, so t IS the z-depth
        depth = jnp.where(found, hit_t, 0.0)
        return hit_col, depth

    def render(self, c2w, intrinsics, shape):
        rgb, depth = self._raycast(self.volume, jnp.asarray(c2w,
                                                            jnp.float32),
                                   tuple(shape),
                                   jnp.asarray(intrinsics, jnp.float32))
        return np.asarray(rgb), np.asarray(depth)

    def evaluate(self, gt_images_u8, gt_depths, c2ws, intrinsics,
                 max_views: int = 4):
        """PSNR + depth-L1(cm) via ray casting (reference :456-484)."""
        psnrs, l1s = [], []
        for i in range(min(len(c2ws), max_views)):
            shape = gt_images_u8[i].shape[:2]
            rgb, depth = self.render(c2ws[i], intrinsics[i], shape)
            gt = np.asarray(gt_images_u8[i], np.float32) / 255.0
            ok = depth > 0
            if ok.sum() < 10:
                continue
            mse = float(np.mean((rgb[ok] - gt[ok]) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
            if gt_depths is not None:
                gtd = np.asarray(gt_depths[i], np.float32)
                sel = ok & (gtd > 0)
                err = np.abs(depth - gtd)[sel]
                err = err[err < 2.0]
                if err.size:
                    l1s.append(float(err.mean()) * 100.0)
        return {"psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
                "depth_l1_cm": float(np.mean(l1s)) if l1s else float("nan")}

    def extract_surface_points(self, max_points: int = 200000):
        """Zero-crossing voxel centers + colors (mesh stand-in; marching
        cubes lands with the mesher component)."""
        cfg = self.cfg
        t = np.asarray(self.volume.tsdf)
        w = np.asarray(self.volume.weight)
        mask = (np.abs(t) < 0.5) & (w > 1.0)
        idx = np.argwhere(mask)
        if idx.shape[0] > max_points:
            sel = np.random.RandomState(0).choice(
                idx.shape[0], max_points, replace=False)
            idx = idx[sel]
        pts = np.asarray(cfg.volume_origin) + (idx + 0.5) * cfg.voxel_size
        cols = np.moveaxis(np.asarray(self.volume.color), 0, -1)[
            idx[:, 0], idx[:, 1], idx[:, 2]]
        return pts, cols

    def extract_mesh(self, weight_thresh: float = 1.0):
        """Marching-tetrahedra surface of the fused TSDF (the reference's
        extract_mesh with weight threshold, tsdf_fusion.py:556-573).
        Returns (vertices (V,3) world, faces (F,3), colors (V,3))."""
        from .mesher import marching_tetrahedra
        t = np.asarray(self.volume.tsdf)
        w = np.asarray(self.volume.weight)
        verts, faces = marching_tetrahedra(
            t, mask=w > weight_thresh,
            origin=np.asarray(self.cfg.volume_origin) +
            0.5 * self.cfg.voxel_size,
            voxel_size=self.cfg.voxel_size)
        # nearest-voxel colors
        if verts.shape[0]:
            g = (verts - np.asarray(self.cfg.volume_origin)) \
                / self.cfg.voxel_size - 0.5
            gi = np.clip(np.round(g).astype(int), 0,
                         self.cfg.grid_size - 1)
            colors = np.moveaxis(np.asarray(self.volume.color), 0, -1)[
                gi[:, 0], gi[:, 1], gi[:, 2]]
        else:
            colors = np.zeros((0, 3))
        return verts, faces, colors
