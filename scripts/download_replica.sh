#!/usr/bin/env bash
# Download the Replica (NICE-SLAM export) scenes used by the benchmarks.
# Mirror of the reference's scripts/download_replica.bash targets.
set -euo pipefail
OUT="${1:-datasets/Replica}"
mkdir -p "$OUT"
URL="https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip"
echo "Fetching $URL -> $OUT"
curl -L "$URL" -o "$OUT/Replica.zip"
unzip -q "$OUT/Replica.zip" -d "$OUT/.."
rm "$OUT/Replica.zip"
echo "done"
