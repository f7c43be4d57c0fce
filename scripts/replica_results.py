"""Benchmark sweep driver.

Equivalent of /root/reference/scripts/replica_results.py:22-111: runs the
demo over scenes x depth-mask ablations with --eval, collecting per-run
result rows into CSVs.  Works with any dataset the factory knows
(synthetic scenes when no data is on disk).
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_name", default="synthetic")
    ap.add_argument("--dataset_root", default=None,
                    help="root containing scene subdirs (replica layout)")
    ap.add_argument("--scenes", nargs="*",
                    default=["room0", "room1", "office0"])
    ap.add_argument("--masks", nargs="*",
                    default=["ours", "raw", "no_depth"])
    ap.add_argument("--out_dir", default="sweep_results")
    ap.add_argument("--buffer", type=int, default=16)
    ap.add_argument("--n_frames", type=int, default=16)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    args = ap.parse_args()

    from nerf_slam_tpu.cli import slam_demo

    os.makedirs(args.out_dir, exist_ok=True)
    rows = []
    scenes = args.scenes if args.dataset_root else ["synthetic"]
    for scene in scenes:
        for mask in args.masks:
            argv = ["--fusion", "nerf", "--eval",
                    "--buffer", str(args.buffer),
                    "--n_frames", str(args.n_frames),
                    "--height", str(args.height),
                    "--width", str(args.width)]
            if args.dataset_root:
                argv += ["--dataset_name", args.dataset_name,
                         "--dataset_dir",
                         os.path.join(args.dataset_root, scene)]
            run_args = slam_demo.parse_args(argv)

            # thread the mask ablation through the fusion config
            import nerf_slam_tpu.cli.slam_demo as demo
            orig = demo.build_fusion

            def masked_fusion(a, _mask=mask):
                fusion, mode = orig(a)
                if hasattr(fusion, "cfg") and hasattr(fusion.cfg,
                                                      "mask_type"):
                    fusion.cfg.mask_type = _mask
                return fusion, mode

            demo.build_fusion = masked_fusion
            try:
                res = slam_demo.run(run_args)
            finally:
                demo.build_fusion = orig
            res.update({"scene": scene, "mask": mask})
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
