#!/bin/bash
# DIODE val release (eval-only: diode_indoors / diode_outdoor splits).
# Official sources per diode-dataset.org; ref api/data/download/diode.sh.
# Layout: $DATA_ROOT/Diode/{data_list/*.csv, val/...} (devkits/diode.py).
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/Diode"
mkdir -p "$ROOT"

wget -c https://diode-1254389886.cos.ap-hongkong.myqcloud.com/data_list.zip -P "$ROOT"
unzip -qo "$ROOT/data_list.zip" -d "$ROOT"
rm -f "$ROOT/data_list.zip" && rm -rf "$ROOT/__MACOSX"

wget -c http://diode-dataset.s3.amazonaws.com/val.tar.gz -P "$ROOT"
tar -xf "$ROOT/val.tar.gz" -C "$ROOT"
rm -f "$ROOT/val.tar.gz"
