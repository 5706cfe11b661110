#!/bin/bash
# Download the KITTI Raw Sync drives referenced by the installed split files.
# Usage: DATA_ROOT=/path/to/data ./kitti_raw_sync.sh [max_parallel]
set -euo pipefail

ROOT="${DATA_ROOT:?set DATA_ROOT}/kitti_raw_sync"
P="${1:-5}"
BASE="https://s3.eu-central-1.amazonaws.com/avg-kitti/raw_data"
mkdir -p "$ROOT"

# Drives = unique sequence dirs named in any split file; calib per date.
drives=$(cat "$ROOT"/splits/*/*_files.txt 2>/dev/null | awk '{print $1}' | cut -d/ -f2 | sort -u)
dates=$(echo "$drives" | cut -c1-10 | sort -u)

for d in $dates; do
  wget -q -nc "$BASE/${d}_calib.zip" -P "$ROOT" && unzip -qo "$ROOT/${d}_calib.zip" -d "$ROOT" &
done
wait

echo "$drives" | xargs -P "$P" -I{} sh -c '
  f="{}/{}_sync.zip"; f="${f/\//_}";  # date prefix
  wget -q -nc "'"$BASE"'/{}/{}_sync.zip" -P "'"$ROOT"'" &&
  unzip -qo "'"$ROOT"'/{}_sync.zip" -d "'"$ROOT"'"'
echo done
