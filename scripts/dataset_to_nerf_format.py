"""Convert any supported dataset to the transforms.json (nerf) format.

Equivalent of /root/reference/scripts/replica_to_nerf_dataset.py.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_name", default="replica")
    ap.add_argument("--dataset_dir", default=None)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--img_stride", type=int, default=1)
    ap.add_argument("--n_frames", type=int, default=40,
                    help="synthetic only")
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n_objects", type=int, default=0,
                    help="synthetic only: interior objects")
    args = ap.parse_args()

    from nerf_slam_tpu.datasets import build_dataset
    from nerf_slam_tpu.datasets.nerf_dataset import export_nerf_format

    if args.dataset_name == "synthetic" and args.n_objects:
        from nerf_slam_tpu.datasets import (SyntheticConfig,
                                            SyntheticDataset)
        ds = SyntheticDataset(SyntheticConfig(
            n_frames=args.n_frames, height=args.height,
            width=args.width, seed=args.seed,
            n_objects=args.n_objects))
    else:
        ds = build_dataset(args.dataset_name, args.dataset_dir,
                           img_stride=args.img_stride,
                           n_frames=args.n_frames, height=args.height,
                           width=args.width)
    out = export_nerf_format(ds, args.out_dir)
    print(f"exported {len(ds)} frames to {out}")


if __name__ == "__main__":
    main()
