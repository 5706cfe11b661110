#!/bin/bash
# Niantic Map-Free Relocalization benchmark (train/val/test zips).
# NOTE: access is licence-gated — accept the terms at
# research.nianticlabs.com/mapfree-reloc-benchmark first; the public bucket
# mirrors the release. Ref api/data/download/mapfree.sh.
# Layout: $DATA_ROOT/mapfree/{train,val,test}/<scene>/seq?/*.jpg (devkits/mapfreereloc.py).
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/mapfree"
mkdir -p "$ROOT"

for file in train val test; do
    wget -c "https://storage.googleapis.com/niantic-lon-static/research/map-free-reloc/dataset/${file}.zip" -P "$ROOT"
    unzip -qo "$ROOT/${file}.zip" -d "$ROOT"
    rm -f "$ROOT/${file}.zip"
done
