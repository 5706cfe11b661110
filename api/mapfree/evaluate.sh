#!/bin/bash
# Package + score MapFreeReloc submissions through Niantic's official
# map-free-reloc benchmark repo (github.com/nianticlabs/map-free-reloc).
# Equivalent of the reference `api/mapfree/evaluate.sh:1`: for each depth
# model (predictions already written by api/mapfree/generate_preds.py into
# the dataset tree as <stem>.<model>.png), clone a matching LoFTR config
# from the repo's DPT-KITTI template, run `submission.py`, then score the
# zip with `benchmark.mapfree`.
#
# Usage:
#   MAPFREE_ROOT=/path/to/map-free-reloc [MAPFREE_PY=python] \
#     api/mapfree/evaluate.sh [model ...]
# Each `model` is a depth-source tag, e.g. kbr_042, midas_DPT_Large,
# newcrfs_indoor (default: the KBR seeds + external baselines below).
set -euo pipefail

MAPFREE_ROOT="${MAPFREE_ROOT:?set MAPFREE_ROOT to a map-free-reloc checkout}"
MAPFREE_PY="${MAPFREE_PY:-python}"
SPLIT="${SPLIT:-val}"

if [ "$#" -gt 0 ]; then
    MODELS=("$@")
else
    MODELS=(
        kbr_042 kbr_195 kbr_335
        midas_MiDaS midas_DPT_Large midas_DPT_BEiT_L_512
        newcrfs_indoor newcrfs_outdoor
    )
fi

run() {  # run <model> <solver: pnp|emat>
    local model=$1 solver=$2
    echo "== ${model} (${solver} solver, ${SPLIT} split)"

    local base_cfg=config/matching/mapfree/loftr_${solver}_dptkitti.yaml
    local new_cfg=config/matching/mapfree/loftr_${solver}_${model}.yaml
    local out_dir=results/loftr_${solver}_${model}

    # The benchmark repo selects the depth-file suffix via the cfg's depth
    # source name; point the template at our generated <stem>.<model>.png.
    sed -e "s/dptkitti/${model}/g" "$base_cfg" > "$new_cfg"

    "$MAPFREE_PY" submission.py "$new_cfg" -o "$out_dir" --split "$SPLIT"
    rm -f "$new_cfg"
    "$MAPFREE_PY" -m benchmark.mapfree "$out_dir/submission.zip" \
        --split "$SPLIT" > "$out_dir/metrics.json"
    echo "-> $out_dir/metrics.json"
}

cd "$MAPFREE_ROOT"
export PYTHONPATH="$MAPFREE_ROOT${PYTHONPATH:+:$PYTHONPATH}"

for model in "${MODELS[@]}"; do
    for solver in pnp emat; do
        run "$model" "$solver"
    done
done
