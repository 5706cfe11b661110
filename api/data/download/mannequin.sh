#!/bin/bash
# MannequinChallenge release: per-sequence video URLs + frame timestamps +
# camera poses (google.github.io/mannequinchallenge). The tar only carries
# the split metadata; extract frames from the videos and compute COLMAP
# depth with api/data/preprocess/compute_mannequin_depth.py afterwards.
# Ref api/data/download/mannequin.sh.
# Layout: $DATA_ROOT/MannequinChallenge/{train,val,test}/... (devkits/mannequin.py).
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/MannequinChallenge"
mkdir -p "$ROOT"

wget -c https://storage.googleapis.com/mannequinchallenge-data/MannequinChallenge.tar -P "$ROOT"
tar -xf "$ROOT/MannequinChallenge.tar" -C "$ROOT"
rm -f "$ROOT/MannequinChallenge.tar"

# The tar unpacks into a nested MannequinChallenge/; flatten it.
if [ -d "$ROOT/MannequinChallenge" ]; then
    mv "$ROOT"/MannequinChallenge/* "$ROOT"/ && rmdir "$ROOT/MannequinChallenge"
fi
