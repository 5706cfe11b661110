#!/bin/bash
# Download the corrected KITTI depth benchmark ground truth, then merge it
# into the raw tree with api/data/preprocess/copy_kitti_depth_benchmark.py.
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/kitti_depth_benchmark"
mkdir -p "$ROOT"
wget -nc https://s3.eu-central-1.amazonaws.com/avg-kitti/data_depth_annotated.zip -P "$ROOT"
unzip -qo "$ROOT/data_depth_annotated.zip" -d "$ROOT"
