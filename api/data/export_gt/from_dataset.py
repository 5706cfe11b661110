"""Export GT evaluation targets from any registered dataset -> npz.

Generic equivalent of the reference's per-dataset `api/data/export_gt/*.py`
scripts (ddad/diode/mannequin/nyud/sintel/tum, ~400 LoC of near-identical
loops): iterate the dataset's eval split and export
{depth, K, [edge], [cat], [subcat]} next to the split file, the layout
`api/eval/eval_depth.py` consumes.

Usage:
    python api/data/export_gt/from_dataset.py --type syns_patches \
        --mode test --datum "image depth edge K"
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from slowtv_monodepth_tpu import parsers  # noqa: E402


def export(ds_type: str, mode: str, datum: str, save_stem: str,
           overwrite: bool = False, **kw) -> Path:
    ds = next(iter(parsers.get_ds(
        {ds_type: {'mode': mode, 'datum': datum, 'use_aug': False,
                   'log_time': False, **kw}}).values()))

    save_file = ds.split_file.parent / f'{save_stem}.npz'
    if not overwrite and save_file.is_file():
        raise FileExistsError(f'Target file "{save_file}" exists. Use `--overwrite 1`.')

    out: dict = {'depth': [], 'K': []}
    cats, subcats, edges = [], [], []
    for i in range(len(ds)):
        x, y, m = ds[i]
        out['depth'].append(y['depth'][..., 0])
        out['K'].append(y['K'])
        if 'edges' in y:
            edges.append(y['edges'][..., 0])
        if 'cat' in m:
            cats.append(m['cat'])
            subcats.append(m.get('subcat', ''))

    arrs = {
        'depth': np.array(out['depth']) if len({d.shape for d in out['depth']}) == 1
        else np.array(out['depth'], dtype=object),
        'K': np.array(out['K']),
    }
    if edges:
        arrs['edge'] = np.array(edges)
    if cats:
        arrs['cat'] = np.array(cats)
        arrs['subcat'] = np.array(subcats)

    print(f'-> Saving {len(out["depth"])} targets to "{save_file}"...')
    np.savez_compressed(save_file, **arrs)
    return save_file


def main():
    parser = ArgumentParser('Export GT evaluation targets from a dataset.')
    parser.add_argument('--type', required=True, help='Registered dataset key.')
    parser.add_argument('--mode', default='test')
    parser.add_argument('--datum', default='image depth K')
    parser.add_argument('--save-stem', default=None)
    parser.add_argument('--overwrite', default=0, type=int)
    parser.add_argument('--kw', action='append', default=[],
                        help='Extra dataset kwargs as key=value (e.g. --kw scene=indoors).')
    args = parser.parse_args()

    kw = dict(item.split('=', 1) for item in args.kw)
    export(args.type, args.mode, args.datum,
           args.save_stem or f'targets_{args.mode}', args.overwrite, **kw)


if __name__ == '__main__':
    main()
