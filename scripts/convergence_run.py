"""Convergence-horizon runs: the pipeline + mapping to 25k iterations.

VERDICT r4 #4: the reference evaluates PSNR / depth-L1 to 20k-25k
mapping iterations (fusion/nerf_fusion.py:54,264-265;
scripts/convergence_plots.ipynb plots to xlim=25000); this driver
produces the equivalent committed artifact on >=2 scenes:

  1. the synthetic benchmark scene (the bench.py sequence) through the
     full production pipeline, then --fit_iters 25000;
  2. an OBJECT-rich synthetic scene exported to the nerf
     transforms.json format and ingested through NeRFDataset --
     exercising the reference's actual demo data path (README.md:117).

One subprocess per run (docs/platform_notes.md #4); results land in
<out_dir>/<name>/results.csv and are plotted with
scripts/convergence_plots.py into <out_dir>/convergence.png.

Usage: python scripts/convergence_run.py [--iters 25000] \
           [--out_dir convergence_results] [--weights weights_synthetic.npz]
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cell(name, extra_argv, args):
    run_dir = os.path.join(args.out_dir, name)
    os.makedirs(run_dir, exist_ok=True)
    argv = [sys.executable, "-m", "nerf_slam_tpu.cli.slam_demo",
            "--fusion", "nerf", "--eval",
            "--buffer", str(args.buffer),
            "--fit_iters", str(args.iters),
            "--eval_every", str(args.eval_every),
            "--eval_views", str(args.eval_views),
            "--out", os.path.join(run_dir, "results.csv")] + extra_argv
    if args.weights:
        argv += ["--weights", args.weights]
    print(f"=== {name}: {' '.join(argv[2:])} ===", flush=True)
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
        print(f"[{name} rc={proc.returncode}] " + proc.stderr[-1000:],
              flush=True)
    res["run"] = name
    print(json.dumps(res), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=25000)
    ap.add_argument("--out_dir", default="convergence_results")
    ap.add_argument("--weights", default="weights_synthetic.npz")
    ap.add_argument("--buffer", type=int, default=24)
    ap.add_argument("--n_frames", type=int, default=30)
    ap.add_argument("--height", type=int, default=336)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--eval_every", type=int, default=1000)
    ap.add_argument("--eval_views", type=int, default=3)
    ap.add_argument("--timeout_s", type=float, default=5400.0)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    size = ["--height", str(args.height), "--width", str(args.width),
            "--n_frames", str(args.n_frames)]
    rows = [run_cell("synthetic_bench", size, args)]

    # scene 2: export an object scene to transforms.json, ingest as nerf
    nerf_dir = os.path.join(args.out_dir, "object_scene_nerf")
    if not os.path.exists(os.path.join(nerf_dir, "transforms.json")):
        rc = subprocess.call(
            [sys.executable, os.path.join(ROOT, "scripts",
                                          "dataset_to_nerf_format.py"),
             "--dataset_name", "synthetic", "--out_dir", nerf_dir,
             "--n_frames", str(args.n_frames),
             "--height", str(args.height), "--width", str(args.width),
             "--seed", "21", "--n_objects", "8"], cwd=ROOT)
        assert rc == 0, "nerf export failed"
    rows.append(run_cell(
        "object_scene", ["--dataset_name", "nerf", "--dataset_dir",
                         nerf_dir] + size[-2:], args))

    csvs = [os.path.join(args.out_dir, r["run"], "results.csv")
            for r in rows
            if os.path.exists(os.path.join(args.out_dir, r["run"],
                                           "results.csv"))]
    if csvs:
        subprocess.call(
            [sys.executable, os.path.join(ROOT, "scripts",
                                          "convergence_plots.py"),
             *csvs, "--out",
             os.path.join(args.out_dir, "convergence.png")], cwd=ROOT)
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out_dir}/summary.json", flush=True)


if __name__ == "__main__":
    main()
