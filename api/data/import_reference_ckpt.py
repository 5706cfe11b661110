"""Convert a reference (PyTorch-Lightning) checkpoint into our format.

The reference releases its trained models as Lightning checkpoints with the
full cfg embedded (`src/core/trainer.py:34`); this converts one — e.g. the
released KBR `last.ckpt` — into our orbax checkpoint layout so quickstart /
export_preds / eval_depth can run it directly and the published `results/`
numbers can be reproduced on TPU:

    python api/data/import_reference_ckpt.py kbr.ckpt --out models/kbr

The output directory then works anywhere ours do:

    python api/quickstart/run.py --ckpt-file models/kbr/last --img-dir ...
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path

import jax.numpy as jnp

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu.core.checkpoint import save_checkpoint  # noqa: E402
from slowtv_monodepth_tpu.core.trainer import TrainState  # noqa: E402
from slowtv_monodepth_tpu.models.import_reference import (  # noqa: E402
    convert_reference_ckpt, load_reference_ckpt)


def import_ckpt(ckpt_file: Path, out_dir: Path) -> Path:
    sd, cfg = load_reference_ckpt(ckpt_file)
    params, aux = convert_reference_ckpt(sd, cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       aux=aux, opt_state=())
    out = out_dir / 'last'
    save_checkpoint(out, state, cfg)
    print(f'-> {out} (nets: {sorted(params)})')
    return out


def main():
    parser = ArgumentParser('Import a reference Lightning checkpoint.')
    parser.add_argument('ckpt', type=Path)
    parser.add_argument('--out', type=Path, required=True)
    args = parser.parse_args()
    import_ckpt(args.ckpt, args.out)


if __name__ == '__main__':
    main()
