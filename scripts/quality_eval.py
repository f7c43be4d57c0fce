"""Quality record: ATE / PSNR / depth-L1 under the PRODUCTION policy.

Runs the full tracking+mapping pipeline (trained weights_synthetic.npz,
motion filter + keyframe rejection ON -- the exact configuration
bench.py's headline measures) on the synthetic benchmark sequence at two
resolutions, then trains the NGP to a fixed iteration horizon and
evaluates at training views (PSNR dB; depth-L1 cm, raw + median-scale
aligned -- monocular runs have a free global scale).  ATE-RMSE comes
from the final SLAM packet via Umeyama alignment.

Writes QUALITY.md at the repo root (the committed quality artifact the
round-3 verdict asked for: "quality evidence after three rounds: zero
rows") and prints one JSON row per configuration.

Run from the repo root on the chip: python scripts/quality_eval.py
(~10 min warm; env QUALITY_QUICK=1 shrinks it for smoke tests).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

QUICK = bool(os.environ.get("QUALITY_QUICK"))
N_FRAMES = 12 if QUICK else 30
BUFFER = 10 if QUICK else 24
HORIZON = 200 if QUICK else 2000        # total NGP iterations
# second resolution chosen with w/8 % 16 == 0 so the frontend stays on
# the grouped4 lookup kernel: at 168x320 (w1=40) the fallback lookup
# path wedges the tunneled TPU runtime mid-pipeline (reproduced;
# platform bug, not a numerics issue -- the same code runs on CPU)
# (H, W, rgbd): monocular rows at two resolutions (free Sim3 gauge)
# plus the RGB-D sensed-depth mode (metric anchoring, the reference's
# TUM/RealSense path -- visual_frontend.py:598-602)
CONFIGS = (((96, 128, False),) if QUICK
           else ((336, 640, False), (256, 512, False),
                 (336, 640, True)))


def run_config(H, W, weights_path, rgbd=False):
    import jax
    import jax.numpy as jnp

    from nerf_slam_tpu.datasets import SyntheticDataset, SyntheticConfig
    from nerf_slam_tpu.fusion import NerfFusion, NerfFusionConfig
    from nerf_slam_tpu.models import DroidNet
    from nerf_slam_tpu.pipeline.modules import (DataModule, EvalSink,
                                                FusionModule, SlamModule)
    from nerf_slam_tpu.pipeline.runner import connect, run_sequential
    from nerf_slam_tpu.tracking import FrontendConfig, RaftVisualFrontend
    from nerf_slam_tpu.utils.checkpoint import load_arrays, unflatten_into
    from nerf_slam_tpu.utils.evaluation import (ate_rmse,
                                                trajectory_from_packet)

    h, w = H // 8, W // 8
    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init_params(jax.random.PRNGKey(0), H, W)
    flat, meta = load_arrays(weights_path)
    params = unflatten_into(params, flat)

    damping_kw = {k: float(meta[k]) for k in
                  ("damping_scale", "damping_offset") if k in meta}
    cfg = FrontendConfig(buffer=BUFFER, e_active=48, e_inactive=48,
                         p_window=BUFFER, k_depth=BUFFER + 4,
                         motion_filter_thresh=2.4, keyframe_thresh=4.0,
                         rgbd=rgbd, **damping_kw)
    frontend = RaftVisualFrontend(params, cfg, (H, W))
    fusion = NerfFusion(NerfFusionConfig(
        buffer=BUFFER, height=H, width=W, batch_rays=4096,
        iters_per_spin=10), seed=0)

    ds = SyntheticDataset(SyntheticConfig(n_frames=N_FRAMES, height=H,
                                          width=W))
    data_m = DataModule(ds)
    slam_m = SlamModule(frontend)
    fusion_m = FusionModule(fusion, mode="nerf", extra_spins_after_done=5)
    sink = EvalSink()
    connect(data_m, slam_m, "data")
    connect(slam_m, sink, "slam")
    connect(slam_m, fusion_m, "slam")

    print(f"[quality] {H}x{W}: pipeline...", file=sys.stderr, flush=True)
    t0 = time.time()
    run_sequential([data_m, slam_m, fusion_m, sink])
    wall = time.time() - t0
    print(f"[quality] {H}x{W}: pipeline done in {wall:.0f}s, "
          f"fitting to {HORIZON}", file=sys.stderr, flush=True)

    row = {"resolution": f"{H}x{W}" + (" rgbd" if rgbd else ""),
           "n_keyframes": int(frontend.kf_idx + 1),
           "frames_in": N_FRAMES,
           "pipeline_wall_s": round(wall, 1)}

    if sink.last_full is not None:
        est, gt = trajectory_from_packet(sink.last_full)
        if est.shape[0] >= 3 and np.isfinite(gt).all():
            row["ate_rmse_m"] = round(ate_rmse(est, gt), 4)

    # train the map to the fixed horizon, then evaluate at train views
    fusion.fit_volume(max(0, HORIZON - fusion.iteration))
    print(f"[quality] {H}x{W}: fit done, evaluating", file=sys.stderr,
          flush=True)
    ev = fusion.evaluate_training_views(max_views=8)
    row.update({
        "ngp_iters": int(fusion.iteration),
        "psnr_db": round(ev["psnr"], 2),
        "depth_l1_cm": round(ev["depth_l1_cm"], 2),
        "depth_l1_aligned_cm": round(ev["depth_l1_aligned_cm"], 2),
    })
    print("ROW:" + json.dumps(row), flush=True)
    return row


def child(H, W, rgbd):
    from nerf_slam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run_config(H, W, os.path.join(root, "weights_synthetic.npz"),
               rgbd=rgbd)


def main():
    """One child process per resolution: compiling and running a second
    full program geometry in one process wedges the tunneled TPU runtime
    (measured: config 2 ran the whole pipeline standalone in ~80 s but
    hung indefinitely at ~0% host CPU when it followed config 1 in the
    same process; the backbone comparison hit the same pattern)."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    weights = os.path.join(root, "weights_synthetic.npz")
    assert os.path.exists(weights), "weights_synthetic.npz missing"

    rows = []
    for H, W, rgbd in CONFIGS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(H), str(W),
             str(int(rgbd))],
            capture_output=True, text=True, timeout=2400, cwd=root)
        got = [json.loads(x[4:]) for x in proc.stdout.splitlines()
               if x.startswith("ROW:")]
        rows.extend(got)
        for r in got:
            print(r, flush=True)
        if proc.returncode != 0:
            print(f"[{H}x{W} run failed rc={proc.returncode}]\n"
                  + proc.stderr[-1500:], flush=True)

    md = [
        "# Quality record (production policy)",
        "",
        "Generated by `python scripts/quality_eval.py` on one TPU chip.",
        "Full tracking+mapping pipeline on the synthetic benchmark "
        f"sequence ({N_FRAMES} frames), trained `weights_synthetic.npz`,"
        " motion filter 2.4 px + keyframe rejection 4.0 (the same "
        "configuration bench.py's headline measures), NGP trained to "
        f"{HORIZON} iterations, evaluated at 8 training views "
        "(reference eval protocol: fusion/nerf_fusion.py:379-485).",
        "",
        "| resolution | keyframes | ATE-RMSE (m) | PSNR (dB) | "
        "depth L1 (cm) | depth L1 scale-aligned (cm) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['resolution']} | {r['n_keyframes']}/{r['frames_in']} "
            f"| {r.get('ate_rmse_m', 'n/a')} | {r['psnr_db']} "
            f"| {r['depth_l1_cm']} | {r['depth_l1_aligned_cm']} |")
    md += [
        "",
        "Raw depth-L1 includes the monocular gauge error (the map's "
        "global scale is unobservable without metric depth or stereo); "
        "the scale-aligned column removes it with a median-depth fit, "
        "matching how monocular SLAM systems are scored.  ATE-RMSE is "
        "Umeyama-aligned (utils/evaluation.py:13-54).",
        "",
        "Raw rows: " + "; ".join(json.dumps(r) for r in rows),
    ]
    out = os.path.join(root,
                       "QUALITY_quick.md" if QUICK else "QUALITY.md")
    # preserve hand-maintained sections (measurement notes, the TSDF
    # mesh rows appended by scripts/tsdf_fidelity.py) across regens
    keep = ""
    if os.path.exists(out):
        old = open(out).read()
        i = old.find(KEEP_MARK)
        if i >= 0:
            keep = "\n" + old[i:]
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n" + keep)
    print(f"wrote {out}", flush=True)


KEEP_MARK = "<!-- KEEP: notes below survive quality_eval regens -->"


if __name__ == "__main__":
    if len(sys.argv) > 2:
        child(int(sys.argv[1]), int(sys.argv[2]),
              bool(int(sys.argv[3])) if len(sys.argv) > 3 else False)
    else:
        main()
