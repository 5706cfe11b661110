#!/bin/bash
# Export every eval-dataset GT target in one go (the reference's
# api/data/export_gt/export_all.sh). Run from anywhere; requires the
# datasets to be downloaded + preprocessed (see api/data/download/ and
# api/data/preprocess/). Each target lands as targets_<mode>.npz next to
# the split file, the layout api/eval/eval_depth.py consumes.
set -uo pipefail
cd "$(dirname "$0")/../../.."

run() { echo "-> $*"; python "$@" || echo "!! failed: $*"; }

# DDAD
run api/data/export_gt/from_dataset.py --type ddad --mode val --save-stem targets_val

# DIODE (indoor + outdoor scenes)
run api/data/export_gt/from_dataset.py --type diode --mode val --kw scene=indoors --save-stem targets_val_indoors
run api/data/export_gt/from_dataset.py --type diode --mode val --kw scene=outdoor --save-stem targets_val_outdoor

# KITTI (eigen uses raw velodyne depth; the others use the improved benchmark GT)
run api/data/export_gt/kitti.py --split eigen --mode test --use-velo-depth 1 --save-stem targets_test
run api/data/export_gt/kitti.py --split eigen_zhou --mode test --use-velo-depth 0 --save-stem targets_test
run api/data/export_gt/kitti.py --split eigen_benchmark --mode test --use-velo-depth 0 --save-stem targets_test

# MANNEQUIN CHALLENGE
run api/data/export_gt/from_dataset.py --type mannequin --mode test --save-stem targets_test

# NYUD
run api/data/export_gt/from_dataset.py --type nyud --mode test --save-stem targets_test

# SINTEL (GT only exists for the train split)
run api/data/export_gt/from_dataset.py --type sintel --mode train --save-stem targets_train

# TUM
run api/data/export_gt/from_dataset.py --type tum --mode test --save-stem targets_test

# SYNS-Patches val (test GT is withheld by the benchmark server)
run api/data/export_gt/from_dataset.py --type syns_patches --mode val \
    --datum "image depth edge K" --save-stem targets_val
