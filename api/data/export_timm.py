"""Export timm pretrained encoder weights to portable npz dumps.

Run on any machine WITH timm + network access; copy the resulting
`<model_root>/timm/<name>.npz` files next to this repo's model root. Training
then picks them up automatically when a net cfg sets `pretrained: True`
(see `slowtv_monodepth_tpu/models/encoders/pretrained.py`).

Usage:
    python api/data/export_timm.py convnext_base convnext_tiny resnet18
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


def export(name: str, out_dir: Path) -> Path:
    import timm
    model = timm.create_model(name, pretrained=True)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    out = out_dir / f'{name}.npz'
    np.savez(out, **sd)
    print(f'-> {out} ({len(sd)} tensors)')
    return out


if __name__ == '__main__':
    parser = ArgumentParser('Export timm pretrained weights to npz.')
    parser.add_argument('names', nargs='+')
    parser.add_argument('--out', type=Path, default=None)
    args = parser.parse_args()

    out_dir = args.out or (Path(MODEL_ROOTS[-1]) / 'timm')
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in args.names:
        export(name, out_dir)
