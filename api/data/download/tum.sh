#!/bin/bash
# TUM RGB-D dynamic-scene sequences used by the eval split (freiburg2 desk
# + the freiburg3 sitting/walking set), 5 parallel downloads.
# Ref api/data/download/tum.sh.
# Layout: $DATA_ROOT/TUM_RGBD/rgbd_dataset_freiburg*/ (devkits/tum.py).
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/TUM_RGBD"
mkdir -p "$ROOT"

fr2=(freiburg2_desk_with_person)
fr3=(
    freiburg3_sitting_static
    freiburg3_sitting_xyz
    freiburg3_sitting_halfsphere
    freiburg3_sitting_rpy
    freiburg3_walking_static
    freiburg3_walking_xyz
    freiburg3_walking_halfsphere
    freiburg3_walking_rpy
)

fetch() {  # fetch <freiburgN> <sequence>
    local file="rgbd_dataset_$2.tgz"
    wget -c "https://vision.in.tum.de/rgbd/dataset/$1/${file}" -P "$ROOT"
    tar -xzf "$ROOT/${file}" -C "$ROOT"
    rm -f "$ROOT/${file}"
}

n=0
for seq in "${fr2[@]}"; do
    fetch freiburg2 "$seq" &
    (( ++n % 5 == 0 )) && wait
done
for seq in "${fr3[@]}"; do
    fetch freiburg3 "$seq" &
    (( ++n % 5 == 0 )) && wait
done
wait
