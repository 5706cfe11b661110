#!/bin/bash
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/Sintel"
mkdir -p "$ROOT"
wget -nc http://files.is.tue.mpg.de/sintel/MPI-Sintel-complete.zip -P "$ROOT"
wget -nc http://files.is.tue.mpg.de/jwulff/sintel/MPI-Sintel-depth-training-20150305.zip -P "$ROOT"
unzip -qo "$ROOT/MPI-Sintel-complete.zip" -d "$ROOT"
unzip -qo "$ROOT/MPI-Sintel-depth-training-20150305.zip" -d "$ROOT"
