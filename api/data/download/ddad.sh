#!/bin/bash
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/DDAD"
mkdir -p "$ROOT"
wget -nc https://tri-ml-public.s3.amazonaws.com/github/DDAD/datasets/DDAD.tar -P "$ROOT"
tar -xf "$ROOT/DDAD.tar" -C "$ROOT"
