"""Generate MapFreeReloc depth predictions (challenge submission format).

Equivalent of `api/mapfree/generate_preds.py:17-118` (reference): predict
scaleless disparity per frame, upsample to the GT shape, least-squares align
in disparity space against the DPT metric baseline depth, and save uint16 mm
PNGs via an async worker pool.
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from multiprocessing import Pool
from pathlib import Path

import cv2
import numpy as np

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu import LOGGER, PRED_REG, parsers, trigger_preds  # noqa: E402
from slowtv_monodepth_tpu.data import DataLoader  # noqa: E402
from slowtv_monodepth_tpu.data.devkits import mapfreereloc as mfr  # noqa: E402
from slowtv_monodepth_tpu.eval.evaluator import MonoDepthEvaluator, _to_inv  # noqa: E402
from slowtv_monodepth_tpu.paths import find_model_file  # noqa: E402


def process_single_pred(args) -> None:
    target, pred, file = args
    pred = upsample(pred, target)
    pred = align(pred, target)
    save_depth_image(file, pred)


def upsample(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    if pred.shape == target.shape:
        return pred
    h, w = target.shape
    return cv2.resize(pred, (w, h), interpolation=cv2.INTER_LINEAR)


def align(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """LSQR-align disparity against the metric baseline, convert to depth."""
    mask = (target > 0) & (target < 100)
    scale, shift = MonoDepthEvaluator._align_lsqr(pred[mask], _to_inv(target[mask]))
    return _to_inv(scale * pred + shift)


def save_depth_image(path, depth: np.ndarray) -> None:
    cv2.imwrite(str(path), (depth * 1000).astype(np.uint16))


def process_batch_preds(batch, preds: np.ndarray, name: str, pool: Pool) -> None:
    m = batch[2]
    files = [mfr.Item(*items).get_depth_file(name)
             for items in zip(m['mode'], m['scene'], m['seq'], m['stem'])]
    targets = np.asarray(batch[1]['depth'])[..., 0]
    pool.map_async(process_single_pred, zip(targets, preds[..., 0], files))


def compute_preds(name: str, cfg: dict, ckpt: str, cfg_model=None,
                  overwrite: bool = False, devices: int = 1) -> None:
    trigger_preds()
    model_type = ckpt.split('.', maxsplit=1)[0]
    model_type = model_type if model_type in PRED_REG else 'ours'

    mesh = None
    if devices and devices > 1:  # Shard prediction batches over local chips.
        from slowtv_monodepth_tpu.parallel import make_mesh
        mesh = make_mesh(devices)
    predictor = PRED_REG[model_type](mesh=mesh)
    if model_type == 'ours':
        ckpt_path = Path(ckpt) if Path(ckpt).exists() else find_model_file(ckpt)
        if not (ckpt_path.parent / 'finished').is_file() and not overwrite:
            LOGGER.error(f"Training for '{ckpt_path}' has not finished... "
                         'Set `--overwrite 1` to predict anyway.')
            raise SystemExit(1)
        net = predictor.load_model(ckpt_path, cfg_model)
    else:
        net = predictor.load_model(ckpt.split('.', maxsplit=1)[1])

    cfg = dict(cfg)
    ds_type = cfg.pop('type')
    cfg.update({'shape': predictor.get_img_shape(ds_type),
                'use_aug': False, 'log_time': False})
    ds = next(iter(parsers.get_ds({ds_type: cfg}).values()))
    dl = DataLoader(ds, batch_size=16, num_workers=8, shuffle=False, drop_last=False)

    LOGGER.info('Computing predictions...')
    with Pool() as pool:
        predictor.apply(net, dl, func=process_batch_preds, name=name, pool=pool)
        pool.close()
        pool.join()


def main():
    parser = ArgumentParser()
    parser.add_argument('--ckpt', required=True, type=str)
    parser.add_argument('--name', type=str, required=True)
    parser.add_argument('--mode', type=str, default='val')
    parser.add_argument('--depth-src', type=str, default='dptkitti',
                        choices={'dptkitti', 'dptnyud'})
    parser.add_argument('--cfg-model', default=None, nargs='*', type=Path)
    parser.add_argument('--devices', default=1, type=int,
                        help='Shard prediction batches over N local devices.')
    args = parser.parse_args()

    cfg = dict(type='mapfree', mode=args.mode, depth_src=args.depth_src,
               datum='image depth')
    compute_preds(args.name, cfg, args.ckpt, cfg_model=args.cfg_model,
                  devices=args.devices)


if __name__ == '__main__':
    main()
