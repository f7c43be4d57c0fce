"""Benchmark sweep driver: scenes x depth-mask ablations.

Equivalent of /root/reference/scripts/replica_results.py:22-111: runs the
demo over scenes x depth-mask ablations (ours / raw / ours_w_thresh /
no_depth, reference fusion/nerf_fusion.py:173-183) with --eval,
collecting the per-run online-eval results.csv and the final JSON row.

Each cell runs in its OWN subprocess -- the reference reruns
slam_demo.run in one process, but on the tunneled dev TPU a second
heavy program geometry wedges the runtime (docs/platform_notes.md #4),
and a fresh process per cell also matches the reference's per-run
results.csv renaming.  Works with any dataset the factory knows
(synthetic scenes when no data is on disk).

Usage:
    python scripts/replica_results.py --out_dir sweep_results \
        [--height 336 --width 640 --n_frames 30 --buffer 24 \
         --weights weights_synthetic.npz --fit_iters 2000]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_name", default="synthetic")
    ap.add_argument("--dataset_root", default=None,
                    help="root containing scene subdirs (replica layout)")
    ap.add_argument("--scenes", nargs="*",
                    default=["room0", "room1", "office0"])
    ap.add_argument("--masks", nargs="*",
                    default=["ours", "raw", "ours_w_thresh", "no_depth"])
    ap.add_argument("--out_dir", default="sweep_results")
    ap.add_argument("--buffer", type=int, default=16)
    ap.add_argument("--n_frames", type=int, default=16)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--fit_iters", type=int, default=0)
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--eval_views", type=int, default=4)
    ap.add_argument("--timeout_s", type=float, default=3600.0)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rows = []
    scenes = args.scenes if args.dataset_root else ["synthetic"]
    for scene in scenes:
        for mask in args.masks:
            run_dir = os.path.join(args.out_dir, f"{scene}_{mask}")
            os.makedirs(run_dir, exist_ok=True)
            argv = [sys.executable, "-m", "nerf_slam_tpu.cli.slam_demo",
                    "--fusion", "nerf", "--eval",
                    "--mask_type", mask,
                    "--buffer", str(args.buffer),
                    "--n_frames", str(args.n_frames),
                    "--height", str(args.height),
                    "--width", str(args.width),
                    "--eval_every", str(args.eval_every),
                    "--eval_views", str(args.eval_views),
                    "--out", os.path.join(run_dir, "results.csv")]
            if args.fit_iters:
                argv += ["--fit_iters", str(args.fit_iters)]
            if args.weights:
                argv += ["--weights", args.weights]
            if args.dataset_root:
                argv += ["--dataset_name", args.dataset_name,
                         "--dataset_dir",
                         os.path.join(args.dataset_root, scene)]
            print(f"=== {scene} / {mask} ===", flush=True)
            proc = subprocess.run(argv, capture_output=True, text=True,
                                  timeout=args.timeout_s, cwd=ROOT)
            res = {}
            for line in reversed(proc.stdout.splitlines()):
                try:
                    res = json.loads(line)
                    break
                except (json.JSONDecodeError, ValueError):
                    continue
            if proc.returncode != 0:
                print(f"[{scene}/{mask} rc={proc.returncode}] "
                      + proc.stderr[-800:], flush=True)
                res.setdefault("failed", True)
            res.update({"scene": scene, "mask": mask})
            print(json.dumps(res), flush=True)
            rows.append(res)

    keys = sorted({k for r in rows for k in r})
    out_csv = os.path.join(args.out_dir, "results.csv")
    with open(out_csv, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=keys)
        wr.writeheader()
        wr.writerows(rows)
    print(f"wrote {out_csv} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
