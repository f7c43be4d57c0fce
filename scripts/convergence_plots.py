"""Plot PSNR / depth-L1 convergence curves from sweep results.csv files.

Script equivalent of the reference's scripts/convergence_plots.ipynb.
"""
from __future__ import annotations

import argparse
import csv
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+", help="results.csv files")
    ap.add_argument("--out", default="convergence.png")
    ap.add_argument("--x", default="iteration",
                    choices=["iteration", "wall_s"])
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    for path in args.csvs:
        rows = list(csv.DictReader(open(path)))
        label = os.path.basename(os.path.dirname(path)) or path
        xs = [float(r.get(args.x, i)) for i, r in enumerate(rows)]
        psnr = [float(r["psnr"]) for r in rows if r.get("psnr")]
        l1 = [float(r["depth_l1_cm"]) for r in rows
              if r.get("depth_l1_cm")]
        ax1.plot(xs[:len(psnr)], psnr, label=label)
        ax2.plot(xs[:len(l1)], l1, label=label)
    ax1.set_xlabel(args.x)
    ax1.set_ylabel("PSNR [dB]")
    ax2.set_xlabel(args.x)
    ax2.set_ylabel("depth L1 [cm]")
    ax1.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
