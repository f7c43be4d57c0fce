#!/usr/bin/env bash
# Fetch the Cube-Diorama nerf-format dataset (reference
# scripts/download_cube.bash) used by the README demo and the
# convergence plots ("room" scene).
set -euo pipefail
OUT="${1:-datasets}"
mkdir -p "$OUT"
cd "$OUT"
git clone https://github.com/jc211/nerf-cube-diorama-dataset.git
echo "done: $OUT/nerf-cube-diorama-dataset (use --dataset_name nerf \
--dataset_dir $OUT/nerf-cube-diorama-dataset/room)"
