"""ATE diagnostic: where does tracking break?

Runs the production frontend with the trained weights over a grid of
(resolution, deg_per_frame) synthetic sequences -- one child process per
cell (tunneled-TPU trap: two program geometries wedge one process,
docs/platform_notes.md #4) -- and reports ATE-RMSE plus per-keyframe
translation errors.  Separates "weights are weak everywhere" from
"weights fail out-of-domain (high flow / high res)".

Usage: python bench/diag_ate.py            # full grid
       python bench/diag_ate.py H W DEG    # one cell (child mode)
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CELLS = [
    # (H, W, deg_per_frame)  -- bench is 336x640 @ 12 deg/frame
    (96, 128, 1.5),     # training-domain sanity
    (96, 128, 12.0),    # training res, bench motion
    (336, 640, 1.5),    # bench res, slow motion
    (336, 640, 12.0),   # the bench cell itself
]


def run_cell(H, W, deg):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.tracking import RaftVisualFrontend, FrontendConfig
    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.utils.checkpoint import load_arrays, unflatten_into
    from nerf_slam_tpu.utils.evaluation import ate_rmse
    from nerf_slam_tpu.geometry import se3
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wpath = os.environ.get(
        "WEIGHTS", os.path.join(root, "weights_synthetic.npz"))
    n_frames = 30
    # deg=None -> legacy full orbit (the bench's config)
    cfg_kw = {} if deg == 12.0 and n_frames == 30 else \
        {"deg_per_frame": deg}
    ds = SyntheticDataset(SyntheticConfig(
        n_frames=n_frames, height=H, width=W, seed=1234 if deg != 12.0
        else 0, **cfg_kw))

    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init_params(jax.random.PRNGKey(0), H, W)
    flat, meta = load_arrays(wpath)
    params = unflatten_into(params, flat)
    # damping recipe from the weights sidecar unless the env overrides
    if "DAMP_SCALE" not in os.environ and "damping_scale" in meta:
        os.environ["DAMP_SCALE"] = str(meta["damping_scale"])
        os.environ["DAMP_OFF"] = str(meta.get("damping_offset", 1e-7))

    buf = 24
    cfg = FrontendConfig(buffer=buf, e_active=48, e_inactive=48,
                         p_window=buf, k_depth=buf + 4,
                         motion_filter_thresh=2.4, keyframe_thresh=4.0,
                         global_ba=bool(os.environ.get("GLOBAL_BA")),
                         rgbd=bool(os.environ.get("RGBD")),
                         damping_scale=float(
                             os.environ.get("DAMP_SCALE", 0.2)),
                         damping_offset=float(
                             os.environ.get("DAMP_OFF", 1e-7)))
    fe = RaftVisualFrontend(params, cfg, (H, W))
    for k in range(n_frames):
        pkt = ds[k]
        fe(k, pkt)
    n = min(fe.kf_idx + 1, buf)
    est_w2c = np.asarray(fe.state.cam_T_world[:n])
    est_c2w = np.asarray(se3.matrix(se3.inv(jnp.asarray(est_w2c))))
    gt_c2w = np.asarray(fe.state.gt_poses[:n])
    ate = ate_rmse(est_c2w[:, :3, 3], gt_c2w[:, :3, 3])

    # per-keyframe consecutive relative translation magnitudes, est vs gt
    dt_est = np.linalg.norm(np.diff(est_c2w[:, :3, 3], axis=0), axis=1)
    dt_gt = np.linalg.norm(np.diff(gt_c2w[:, :3, 3], axis=0), axis=1)
    # mean disparity (scale proxy)
    disp = np.asarray(fe.state.idepths[:n])
    row = {"H": H, "W": W, "deg": deg, "n_kf": int(n),
           "global_ba": bool(os.environ.get("GLOBAL_BA")),
           "rgbd": bool(os.environ.get("RGBD")),
           "damping": f"{cfg.damping_scale}/{cfg.damping_offset}",
           "ate_rmse_m": round(float(ate), 4),
           "dt_est_mean": round(float(dt_est.mean()), 4),
           "dt_gt_mean": round(float(dt_gt.mean()), 4),
           "scale_ratio": round(float(dt_est.mean() / dt_gt.mean()), 3),
           "disp_mean": round(float(disp.mean()), 3),
           "disp_gt_mean": round(float((1.0 / np.maximum(
               np.asarray(fe.state.gt_depths[:n]), 0.1)).mean()), 3)}
    print("ROW:" + json.dumps(row), flush=True)


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for H, W, deg in CELLS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(H), str(W),
             str(deg)], capture_output=True, text=True, timeout=1800,
            cwd=root)
        rows = [x for x in proc.stdout.splitlines()
                if x.startswith("ROW:")]
        for r in rows:
            print(r[4:], flush=True)
        if proc.returncode != 0:
            print(f"[{H}x{W}@{deg} failed rc={proc.returncode}] "
                  + proc.stderr[-800:], flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 4:
        run_cell(int(sys.argv[1]), int(sys.argv[2]),
                 float(sys.argv[3]))
    else:
        main()
