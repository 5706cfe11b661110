#!/bin/bash
# NYU Depth v2 labeled subset (eval-only) + the standard split .mat.
# After downloading, run api/data/preprocess/export_nyud.py to unpack the
# .mat into the png/npy layout the devkit reads. Ref api/data/download/nyud.sh.
# Layout: $DATA_ROOT/NYUD_v2/{splits/, test/{rgb,depth}/...} (devkits/nyud.py).
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/NYUD_v2"
mkdir -p "$ROOT"

wget -c https://raw.githubusercontent.com/wangq95/NYUd2-Toolkit/master/splits.mat -P "$ROOT"
wget -c http://horatio.cs.nyu.edu/mit/silberman/nyu_depth_v2/nyu_depth_v2_labeled.mat -P "$ROOT"
