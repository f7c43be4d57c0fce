"""TSDF mesh-fidelity comparison: 3.1 cm vs 1.5 cm voxels.

Fuses GT depths of the synthetic benchmark scene (decoupling volume
fidelity from SLAM pose quality) at the default (192^3, 3.1 cm) and
high-fidelity (384^3, 1.5 cm -- the reference's VoxelBlockGrid runs
~1.17 cm, fusion/tsdf_fusion.py:63-86) resolutions, extracts the
marching-tetrahedra mesh, and scores every vertex against the ANALYTIC
room surface (the scene is an axis-aligned box, so the GT distance is
exact -- no sampled GT mesh needed).  Also ray-cast PSNR / depth-L1 at
held-out views (reference eval protocol tsdf_fusion.py:456-484).

One child process per resolution (tunneled-TPU geometry trap,
docs/platform_notes.md #4).  Appends a mesh row to QUALITY.md when run
with --write (quality_eval.py owns the rest of the file).

Usage: python scripts/tsdf_fidelity.py [--write]
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 20
H, W = 240, 320


def _box_shell(pts, lo, hi):
    """Unsigned distance to an axis-aligned box shell (|signed box
    distance|, exact inside and out)."""
    q = np.maximum(lo - pts, pts - hi)
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(q.max(axis=-1), 0.0)
    return np.abs(outside + inside)


def box_surface_distance(pts, half=2.0, room_h=2.5, lo_z=0.0):
    """Exact unsigned distance from points to the room's box shell."""
    return _box_shell(pts, np.array([-half, -half, lo_z]),
                      np.array([half, half, room_h]))


def scene_surface_distance(pts, ds):
    """Exact unsigned distance to the FULL synthetic scene surface:
    room shell plus every interior sphere/box (SyntheticDataset exposes
    the analytic primitives as ds.objects)."""
    c = ds.cfg
    d = box_surface_distance(pts, half=c.room_half, room_h=c.room_height)
    for ob in ds.objects:
        if ob["type"] == "sphere":
            do = np.abs(np.linalg.norm(pts - np.asarray(ob["c"]),
                                       axis=-1) - ob["r"])
        else:
            do = _box_shell(pts, np.asarray(ob["lo"]),
                            np.asarray(ob["hi"]))
        d = np.minimum(d, do)
    return d


def run_cell(preset):
    import jax.numpy as jnp
    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.fusion.tsdf_fusion import (TsdfFusion,
                                                  TsdfFusionConfig)
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    cfg = (TsdfFusionConfig.high_fidelity() if preset == "hi"
           else TsdfFusionConfig())
    fusion = TsdfFusion(cfg)
    # object-rich scene: curved/fine geometry is where voxel size shows
    # (flat walls interpolate to sub-voxel error at any resolution)
    ds = SyntheticDataset(SyntheticConfig(n_frames=N_FRAMES, height=H,
                                          width=W, seed=21, n_objects=8))
    c2ws, intrs, imgs, depths = [], [], [], []
    for k in range(N_FRAMES):
        p = ds[k]
        w2c = np.linalg.inv(p["poses"])
        cov = np.full((H, W), 1e-4, np.float32)   # GT depth: tiny sigma
        fusion.integrate_frame(w2c, p["intrinsics"], p["depths"], cov,
                               p["images"], record=False)
        c2ws.append(p["poses"])
        intrs.append(p["intrinsics"])
        imgs.append(p["images"])
        depths.append(p["depths"])

    ev = fusion.evaluate(imgs[::7], depths[::7], c2ws[::7], intrs[::7],
                         max_views=3)
    verts, faces, _ = fusion.extract_mesh(weight_thresh=1.0)
    err = scene_surface_distance(verts, ds) if verts.shape[0] else \
        np.array([np.nan])
    row = {"preset": preset,
           "voxel_cm": round(100 * cfg.voxel_size, 2),
           "grid": cfg.grid_size,
           "n_vertices": int(verts.shape[0]),
           "n_faces": int(faces.shape[0]),
           "mesh_err_mean_cm": round(float(err.mean()) * 100, 3),
           "mesh_err_p95_cm": round(float(np.percentile(err, 95)) * 100,
                                    3),
           "psnr_db": round(ev["psnr"], 2),
           "depth_l1_cm": round(ev["depth_l1_cm"], 2)}
    print("ROW:" + json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    rows = []
    for preset in ("default", "hi"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), preset],
            capture_output=True, text=True, timeout=2400, cwd=ROOT)
        got = [json.loads(x[4:]) for x in proc.stdout.splitlines()
               if x.startswith("ROW:")]
        rows.extend(got)
        for r in got:
            print(r, flush=True)
        if proc.returncode != 0:
            print(f"[{preset} failed rc={proc.returncode}]\n"
                  + proc.stderr[-1200:], flush=True)

    if args.write and rows:
        md = [
            "",
            "## TSDF mesh fidelity (GT-depth fusion, analytic-surface "
            "error)",
            "",
            "Generated by `python scripts/tsdf_fidelity.py --write` "
            f"({N_FRAMES} GT-depth frames at {H}x{W}; vertex error is "
            "the exact distance to the analytic room shell).",
            "",
            "| preset | voxel (cm) | grid | vertices | mesh err mean "
            "(cm) | mesh err p95 (cm) | PSNR (dB) | depth L1 (cm) |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            md.append(f"| {r['preset']} | {r['voxel_cm']} | "
                      f"{r['grid']}^3 | {r['n_vertices']} | "
                      f"{r['mesh_err_mean_cm']} | {r['mesh_err_p95_cm']} "
                      f"| {r['psnr_db']} | {r['depth_l1_cm']} |")
        md.append("")
        with open(os.path.join(ROOT, "QUALITY.md"), "a") as f:
            f.write("\n".join(md))
        print("appended mesh rows to QUALITY.md", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("default", "hi"):
        run_cell(sys.argv[1])
    else:
        main()
