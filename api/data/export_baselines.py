"""Export external-baseline checkpoints (NeWCRFs / MiDaS) to portable npz.

The reference loads these baselines from torch-hub / released checkpoints at
runtime (`src/external_libs/{midas,newcrfs}/tools.py`). In this framework the
architectures are native Flax (`models.NewCRFDepth`, `models.MidasDPT`) and
the weights are grafted from the released files; this script converts them to
npz once so torch isn't needed at prediction time.

Run on any machine WITH the downloaded checkpoints (and torch):

    # NeWCRFs: https://github.com/aliyun/NeWCRFs released models.
    python api/data/export_baselines.py newcrfs path/to/model_nyu.ckpt
    python api/data/export_baselines.py newcrfs path/to/model_kittieigen.ckpt

    # MiDaS DPT_Large: torch-hub intel-isl/MiDaS checkpoint.
    python api/data/export_baselines.py midas path/to/dpt_large-midas-2f21e586.pt

Outputs land in `<model_root>/{newcrfs,midas}/<stem>.npz`, where the
predictors (`core/predictors.py`) pick them up.
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu.paths import MODEL_ROOTS  # noqa: E402


def export(kind: str, ckpt: Path, out_dir: Path | None) -> Path:
    if kind == 'newcrfs':
        from slowtv_monodepth_tpu.models.import_newcrfs import \
            load_newcrfs_state_dict
        sd = load_newcrfs_state_dict(ckpt)
    else:
        from slowtv_monodepth_tpu.models.import_midas import \
            load_midas_state_dict
        sd = load_midas_state_dict(ckpt)

    out_dir = out_dir or (Path(MODEL_ROOTS[-1]) / kind)
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f'{ckpt.stem}.npz'
    np.savez(out, **sd)
    print(f'-> {out} ({len(sd)} tensors)')
    return out


if __name__ == '__main__':
    parser = ArgumentParser('Export baseline checkpoints to npz.')
    parser.add_argument('kind', choices=['newcrfs', 'midas'])
    parser.add_argument('ckpts', nargs='+', type=Path)
    parser.add_argument('--out', type=Path, default=None)
    args = parser.parse_args()

    for ckpt in args.ckpts:
        export(args.kind, ckpt, args.out)
