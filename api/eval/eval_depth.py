"""Evaluate predictions (file or computed) against exported GT targets.

Equivalent of `api/eval/eval_depth.py:22-89` (reference): loads the exported
`targets_<mode>.npz`, runs `MonoDepthEvaluator` with the cfg's `args` section
(align mode overridable on the CLI, float = fixed metric factor), and saves
the mean-metric YAML consumed by `generate_tables.py`.
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np
import yaml

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu import LOGGER, parsers  # noqa: E402
from slowtv_monodepth_tpu.config import load_yaml  # noqa: E402
from slowtv_monodepth_tpu.eval import MonoDepthEvaluator  # noqa: E402

try:
    # Relative: works under any installed top-level name (the wheel ships
    # this tree as `slowtv_api`, a repo checkout imports it as `api`).
    from .export_preds import compute_preds  # noqa: E402
except ImportError:  # direct `python api/eval/eval_depth.py` invocation
    from export_preds import compute_preds  # noqa: E402


def save_metrics(file: Path, metrics: dict) -> None:
    LOGGER.info(f'Saving results to "{file}"...')
    file.parent.mkdir(exist_ok=True, parents=True)
    with open(file, 'w') as f:
        yaml.safe_dump(metrics, f, default_flow_style=False, sort_keys=False)


def compute_eval_metrics(preds: np.ndarray, cfg_file: Path, align_mode,
                         nproc=None, max_items=None):
    """Targets npz + predictions -> (mean metrics, per-item metrics)."""
    cfg = load_yaml(cfg_file)
    cfg_ds, cfg_args = dict(cfg['dataset']), dict(cfg['args'])
    try:
        cfg_args['align_mode'] = float(align_mode)
    except (ValueError, TypeError):
        cfg_args['align_mode'] = align_mode

    target_stem = cfg_ds.pop('target_stem', f"targets_{cfg.get('mode', 'test')}")
    ds = next(iter(parsers.get_ds({cfg_ds.pop('type'): cfg_ds}).values()))
    target_file = ds.split_file.parent / f'{target_stem}.npz'

    LOGGER.info(f'Loading targets from "{target_file}"...')
    data = dict(np.load(target_file, allow_pickle=True))
    return MonoDepthEvaluator(**cfg_args).run(preds, data, nproc=nproc,
                                              max_items=max_items)


def main():
    parser = ArgumentParser()
    parser.add_argument('--align-mode', default='lsqr', type=str)
    parser.add_argument('--cfg-file', required=True, type=Path)
    parser.add_argument('--pred-file', default=None, type=Path)
    parser.add_argument('--ckpt', default=None, type=str)
    parser.add_argument('--cfg-model', default=None, nargs='*', type=Path)
    parser.add_argument('--save-file', default=None, type=Path)
    parser.add_argument('--overwrite', default=0, type=int)
    parser.add_argument('--nproc', default=None, type=int)
    parser.add_argument('--max-items', default=None, type=int)
    args = parser.parse_args()

    if args.save_file and args.save_file.is_file() and not args.overwrite:
        LOGGER.error(f"Evaluation file already exists '{args.save_file}'... "
                     'Set `--overwrite 1` to evaluate anyway.')
        raise SystemExit(1)

    if args.pred_file:
        LOGGER.info(f"Loading predictions from '{args.pred_file}'...")
        preds = np.load(args.pred_file)['pred']
    else:
        if not args.ckpt:
            raise ValueError('Must provide either `--pred-file` or `--ckpt`!')
        cfg = load_yaml(args.cfg_file)['dataset']
        preds = compute_preds(cfg, args.ckpt, args.cfg_model, args.overwrite)

    mean_metrics, metrics = compute_eval_metrics(
        preds, args.cfg_file, args.align_mode, args.nproc, args.max_items)
    if args.save_file:
        save_metrics(args.save_file, mean_metrics)


if __name__ == '__main__':
    main()
