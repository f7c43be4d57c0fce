"""Trajectory and reconstruction evaluation.

ATE-RMSE with Umeyama (Sim3 or SE3) alignment -- the metric the reference
relies on externally (its in-repo eval is PSNR/L1 only; SURVEY.md 4).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = True
                      ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity transform aligning src -> dst.

    src, dst: (N, 3).  Returns (R, t, s) with dst ~ s * R @ src + t.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / src.shape[0]
        # degenerate source (all points coincident, e.g. tracking never
        # moved the poses): scale is unobservable -- fall back to s=1 so
        # ATE reports the (large, honest) error instead of NaN
        s = float(np.trace(np.diag(D) @ S) / var_s) if var_s > 1e-12 \
            else 1.0
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def ate_rmse(est_positions: np.ndarray, gt_positions: np.ndarray,
             align_scale: bool = True) -> float:
    """Absolute trajectory error (RMSE, metres) after Sim3 alignment --
    monocular SLAM is scale-ambiguous so scale alignment is standard."""
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    assert est.shape == gt.shape and est.shape[1] == 3
    R, t, s = umeyama_alignment(est, gt, with_scale=align_scale)
    aligned = (s * (R @ est.T)).T + t
    err = aligned - gt
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def trajectory_from_packet(packet) -> Tuple[np.ndarray, np.ndarray]:
    """(est_positions, gt_positions) from a frontend viz packet."""
    from ..geometry import se3
    import jax.numpy as jnp
    n = int(packet.get("viz_count",
                       np.asarray(packet["cam0_poses"]).shape[0]))
    poses7 = jnp.asarray(np.asarray(packet["cam0_poses"])[:n])
    c2w = np.asarray(se3.matrix(se3.inv(poses7)))
    est = c2w[:, :3, 3]
    gt = np.asarray(packet["gt_poses"])[:n, :3, 3]
    return est, gt


# ----------------------------------------------------------------------
# GT-mesh depth rendering (reference utils/evaluation.py:7-68)
# ----------------------------------------------------------------------

def load_mesh(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a triangle mesh: (verts (V, 3) f32, faces (F, 3) i32).

    Supports OBJ (the mesher's output format, fusion/mesher.py:128) and
    ASCII / binary-little-endian PLY (the format Replica ships its GT
    meshes in).  Quad faces are fan-triangulated.
    """
    if path.endswith(".obj"):
        verts, faces = [], []
        with open(path) as f:
            for line in f:
                p = line.split()
                if not p:
                    continue
                if p[0] == "v":
                    verts.append([float(x) for x in p[1:4]])
                elif p[0] == "f":
                    idx = [int(t.split("/")[0]) - 1 for t in p[1:]]
                    for a in range(1, len(idx) - 1):
                        faces.append([idx[0], idx[a], idx[a + 1]])
        return (np.asarray(verts, np.float32),
                np.asarray(faces, np.int32))
    return _load_ply(path)


def _load_ply(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elems = []           # (name, count, [(prop_dtype, prop_name)])
        while True:
            line = f.readline().split()
            if not line or line[0] == b"comment":
                continue
            if line[0] == b"format":
                fmt = line[1].decode()
            elif line[0] == b"element":
                elems.append([line[1].decode(), int(line[2]), []])
            elif line[0] == b"property":
                if line[1] == b"list":
                    elems[-1][2].append(("list", line[2].decode(),
                                         line[3].decode(),
                                         line[4].decode()))
                else:
                    elems[-1][2].append((line[1].decode(),
                                         line[2].decode()))
            elif line[0] == b"end_header":
                break
        np_t = {"float": "f4", "float32": "f4", "double": "f8",
                "int": "i4", "int32": "i4", "uint": "u4",
                "uint32": "u4", "uchar": "u1", "uint8": "u1",
                "short": "i2", "ushort": "u2", "char": "i1"}
        verts = faces = None
        for name, count, props in elems:
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    verts = np.array(
                        [[float(r[k]) for k in range(3)] for r in rows],
                        np.float32)
                elif name == "face":
                    faces = _fan([[int(x) for x in r[1:1 + int(r[0])]]
                                  for r in rows])
            elif fmt == "binary_little_endian":
                if name == "vertex":
                    dt = np.dtype([(f"p{i}", "<" + np_t[t[0]])
                                   for i, t in enumerate(props)])
                    data = np.frombuffer(f.read(dt.itemsize * count),
                                         dtype=dt)
                    verts = np.stack([data["p0"], data["p1"],
                                      data["p2"]], -1).astype(np.float32)
                elif name == "face":
                    cnt_t, idx_t = props[0][1], props[0][2]
                    cdt = np.dtype("<" + np_t[cnt_t])
                    idt = np.dtype("<" + np_t[idx_t])
                    polys = []
                    for _ in range(count):
                        n = int(np.frombuffer(f.read(cdt.itemsize),
                                              cdt)[0])
                        polys.append(np.frombuffer(
                            f.read(idt.itemsize * n), idt).tolist())
                    faces = _fan(polys)
            else:
                raise ValueError(f"unsupported PLY format {fmt}")
        if verts is None or faces is None:
            raise ValueError(f"{path}: missing vertex or face element")
        return verts, faces


def _fan(polys) -> np.ndarray:
    tris = []
    for p in polys:
        for a in range(1, len(p) - 1):
            tris.append([p[0], p[a], p[a + 1]])
    return np.asarray(tris, np.int32)


class MeshRenderer:
    """Render GT-mesh z-depth at arbitrary camera poses.

    TPU-native replacement for the reference's Open3D-window capture
    (utils/evaluation.py:7-68, which spins a GUI event loop per frame):
    a jitted Moller-Trumbore ray cast, lax.scan over fixed-size triangle
    slabs with a running depth minimum -- static shapes, no BVH, the
    slab sweep is pure VPU work.  Background pixels get depth 0.0
    (matching Open3D's capture_depth_float_buffer).
    """

    def __init__(self, mesh, intrinsics, resolution,
                 tri_chunk: int = 4096, px_chunk: int = 4096):
        verts, faces = (load_mesh(mesh) if isinstance(mesh, str)
                        else mesh)
        import jax.numpy as jnp
        tris = verts[faces.reshape(-1)].reshape(-1, 3, 3)
        pad = (-len(tris)) % tri_chunk
        if pad:   # degenerate pad triangles never intersect
            tris = np.concatenate(
                [tris, np.zeros((pad, 3, 3), np.float32)], 0)
        self._slabs = jnp.asarray(
            tris.reshape(-1, tri_chunk, 3, 3))
        self.fx, self.fy, self.cx, self.cy = [float(v)
                                              for v in intrinsics]
        self.w, self.h = int(resolution[0]), int(resolution[1])
        self.px_chunk = px_chunk
        self._cast = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        def cast(slabs, origins, dirs):
            def step(tmin, tri):
                v0 = tri[:, 0]
                e1 = tri[:, 1] - v0
                e2 = tri[:, 2] - v0
                # (P, T, 3) broadcasting: P rays against T triangles
                pvec = jnp.cross(dirs[:, None, :], e2[None])
                det = jnp.sum(pvec * e1[None], -1)
                inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvec = origins[:, None, :] - v0[None]
                u = jnp.sum(tvec * pvec, -1) * inv
                qvec = jnp.cross(tvec, e1[None])
                v = jnp.sum(dirs[:, None, :] * qvec, -1) * inv
                t = jnp.sum(e2[None] * qvec, -1) * inv
                hit = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                       & (u + v <= 1) & (t > 1e-4))
                t = jnp.where(hit, t, jnp.inf)
                return jnp.minimum(tmin, t.min(axis=1)), None

            t0 = jnp.full((origins.shape[0],), jnp.inf)
            tmin, _ = jax.lax.scan(step, t0, slabs)
            return tmin

        self._cast = jax.jit(cast)

    def render_mesh(self, c2w: np.ndarray) -> np.ndarray:
        """Depth image (h, w) float32 at a camera-to-world pose; rays
        use +z-forward pinhole convention; 0.0 where the mesh is
        missed."""
        import jax.numpy as jnp
        if self._cast is None:
            self._build()
        c2w = np.asarray(c2w, np.float32)
        xs = (np.arange(self.w) + 0.5 - self.cx) / self.fx
        ys = (np.arange(self.h) + 0.5 - self.cy) / self.fy
        xx, yy = np.meshgrid(xs, ys)
        # unit-z camera dirs -> t along the ray IS the z-depth
        d_cam = np.stack([xx, yy, np.ones_like(xx)], -1).reshape(-1, 3)
        dirs = d_cam @ c2w[:3, :3].T
        n_px = dirs.shape[0]
        out = np.empty((n_px,), np.float32)
        for s in range(0, n_px, self.px_chunk):
            blk = dirs[s:s + self.px_chunk]
            pad = self.px_chunk - blk.shape[0]
            if pad:
                blk = np.concatenate([blk, blk[-1:].repeat(pad, 0)], 0)
            o = jnp.broadcast_to(jnp.asarray(c2w[:3, 3]),
                                 (self.px_chunk, 3))
            t = np.asarray(self._cast(self._slabs, o,
                                      jnp.asarray(blk)))
            out[s:s + self.px_chunk] = t[:self.px_chunk - pad] \
                if pad else t
        out[~np.isfinite(out)] = 0.0
        return out.reshape(self.h, self.w)
