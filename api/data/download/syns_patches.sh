#!/bin/bash
# SYNS-Patches (the MDEB/KBR headline eval set). The images+edges zip is
# distributed through the MDEC CodaLab page (licence-gated dataset key);
# ground-truth depths are withheld for test — eval via the benchmark server,
# or use the val split locally. Ref api/data/download/syns_patches.sh.
# Layout: $DATA_ROOT/syns_patches/{splits/, <scene>/images/...} (devkits/syns_patches.py).
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/syns_patches"
mkdir -p "$ROOT"

key=6407c34a-39af-448c-8ab9-c74c9f1eef35
wget -c "https://codalab.lisn.upsaclay.fr/my/datasets/download/${key}" -O "$ROOT/syns_patches.zip"
unzip -qo "$ROOT/syns_patches.zip" -d "$ROOT"
rm -f "$ROOT/syns_patches.zip"
