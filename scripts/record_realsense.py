"""Record a live RealSense stream to the nerf (transforms.json) format.

Equivalent of the reference's scripts/record_real_sense.py.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--n_frames", type=int, default=300)
    args = ap.parse_args()

    from nerf_slam_tpu.datasets.realsense_dataset import RealSenseDataset
    from nerf_slam_tpu.datasets.nerf_dataset import export_nerf_format

    ds = RealSenseDataset(buffer=args.n_frames)

    def frames():
        for _ in range(args.n_frames):
            yield ds.stream()

    export_nerf_format(frames(), args.out_dir)
    print(f"recorded {args.n_frames} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
