"""Export network predictions on an eval dataset -> compressed NPZ.

Equivalent of `api/eval/export_preds.py:22-96` (reference): predictor dispatch
by ckpt string (`midas.DPT_Large`, `newcrfs.indoor`, else 'ours'), per-dataset
input shapes, the `finished`-marker guard on unfinished training dirs, and
`np.savez_compressed(file, pred=preds)` output.
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

from slowtv_monodepth_tpu import LOGGER, PRED_REG, parsers, trigger_preds  # noqa: E402
from slowtv_monodepth_tpu.config import load_yaml  # noqa: E402
from slowtv_monodepth_tpu.data import DataLoader  # noqa: E402
from slowtv_monodepth_tpu.paths import find_model_file  # noqa: E402


def save_preds(file: Path, preds: np.ndarray) -> None:
    file.parent.mkdir(parents=True, exist_ok=True)
    LOGGER.info(f"Saving network predictions to '{file}'...")
    np.savez_compressed(file, pred=preds)


def compute_preds(cfg: dict, ckpt: str, cfg_model=None, overwrite: bool = False,
                  batch_size: int = 12, num_workers: int = 8,
                  devices: int = 1, model_shards: int = 1,
                  spatial_shards: int = 1) -> np.ndarray:
    """Compute predictions for a dataset cfg + checkpoint (or external name).

    :param devices: Shard prediction work over this many local devices
        (beyond the reference's single-GPU eval). 1 keeps the exact
        single-device path.
    :param model_shards: Tensor-shard the network weights over this many of
        the `devices` (must divide it; `parallel/tp.py`). Batches shard over
        the remaining `devices / model_shards` data shards.
    :param spatial_shards: Shard the image HEIGHT over this many of the
        `devices` (`parallel/spatial.py` — XLA derives conv halo exchanges),
        for eval resolutions whose activations exceed one chip. Composable
        with `model_shards`: devices = data x spatial x model.
    """
    trigger_preds()
    model_type = ckpt.split('.', maxsplit=1)[0]
    model_type = model_type if model_type in PRED_REG else 'ours'

    mesh = None
    if devices and devices > 1:
        from slowtv_monodepth_tpu.parallel import make_mesh
        shards = {'spatial': max(spatial_shards or 1, 1),
                  'model': max(model_shards or 1, 1)}
        special = shards['spatial'] * shards['model']
        if devices % special:
            raise ValueError(f'--spatial-shards x --model-shards ({special}) '
                             f'must divide --devices {devices}.')
        if special > 1:
            shape = [devices // special]
            names = ['data']
            for ax in ('spatial', 'model'):
                if shards[ax] > 1:
                    shape.append(shards[ax])
                    names.append(ax)
            mesh = make_mesh(tuple(shape), tuple(names))
        else:
            mesh = make_mesh(devices)
    predictor = PRED_REG[model_type](mesh=mesh)
    if model_type == 'ours':
        ckpt_path = Path(ckpt) if Path(ckpt).exists() else find_model_file(ckpt)
        run_dir = ckpt_path.parent
        if not (run_dir / 'finished').is_file() and not overwrite:
            LOGGER.error(f"Training for '{ckpt_path}' has not finished... "
                         'Set `--overwrite 1` to evaluate anyway.')
            raise SystemExit(1)
        net = predictor.load_model(ckpt_path, cfg_model)
    else:
        net = predictor.load_model(ckpt.split('.', maxsplit=1)[1])

    cfg = dict(cfg)
    cfg.pop('target_stem', None)
    ds_type = cfg.pop('type')
    cfg.update({'shape': predictor.get_img_shape(ds_type),
                'use_aug': False, 'log_time': False})

    ds = next(iter(parsers.get_ds({ds_type: cfg}).values()))
    dl = DataLoader(ds, batch_size=batch_size, num_workers=num_workers,
                    shuffle=False, drop_last=False)

    LOGGER.info('Computing predictions...')
    return predictor(net, dl, use_stereo_blend=False)


def main():
    parser = ArgumentParser(description='Export network predictions on a target dataset.')
    parser.add_argument('--cfg-file', required=True, type=Path)
    parser.add_argument('--ckpt', required=True, type=str)
    parser.add_argument('--cfg-model', default=None, nargs='*', type=Path)
    parser.add_argument('--save-file', default=None, type=Path)
    parser.add_argument('--overwrite', default=0, type=int)
    parser.add_argument('--devices', default=1, type=int,
                        help='Shard prediction batches over N local devices.')
    parser.add_argument('--model-shards', default=1, type=int,
                        help='Tensor-shard the network over M of the N devices '
                             '(M must divide N; Megatron-style TP for trunks '
                             'too big to replicate).')
    parser.add_argument('--spatial-shards', default=1, type=int,
                        help='Shard the image height over S of the N devices '
                             '(conv halo exchange; for eval resolutions whose '
                             'activations exceed one chip).')
    args = parser.parse_args()

    if args.save_file and args.save_file.is_file() and not args.overwrite:
        LOGGER.error(f"Prediction file already exists '{args.save_file}'... "
                     'Set `--overwrite 1` to export anyway.')
        raise SystemExit(1)

    cfg = load_yaml(args.cfg_file)['dataset']
    preds = compute_preds(cfg, args.ckpt, args.cfg_model, args.overwrite,
                          devices=args.devices, model_shards=args.model_shards,
                          spatial_shards=args.spatial_shards)
    if args.save_file:
        save_preds(args.save_file, preds)


if __name__ == '__main__':
    main()
