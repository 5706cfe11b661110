"""Export KITTI ground-truth evaluation targets (npz {depth, K}).

Equivalent of `api/data/export_gt/kitti.py:22-90` (reference): the Eigen split
uses raw velodyne LiDAR depth (legacy-incorrect on purpose, matching published
numbers); all other splits use the corrected benchmark depth. Depths save as
an object array (per-drive image sizes differ).
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path
from typing import Optional

import numpy as np

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from slowtv_monodepth_tpu.data.devkits import kitti_raw as kr  # noqa: E402


def save(file: Path, **kwargs) -> None:
    print(f'\n-> Saving to "{file}"...')
    np.savez_compressed(file, **kwargs)


def export_kitti(depth_split: str, mode: str, use_velo_depth: bool = False,
                 save_stem: Optional[str] = None, overwrite: bool = False) -> None:
    print(f'\n-> Exporting ground truth depths for KITTI "{depth_split}/{mode}"...')
    split_file = kr.get_split_file(depth_split, mode='test')
    lines = [line.split() for line in kr.load_split(split_file)]
    items = [{'seq': line[0], 'cam': 2 if line[2] == 'l' else 3, 'stem': int(line[1])}
             for line in lines]

    save_file = split_file.parent / f'{save_stem}.npz'
    if not overwrite and save_file.is_file():
        raise FileExistsError(f'Target file "{save_file}" exists. Use `--overwrite 1`.')

    depths, Ks = [], []
    for d in items:
        cam2cam, _, velo2cam = kr.load_calib(d['seq'].split('/')[0])
        if use_velo_depth:
            file = kr.get_velodyne_file(d['seq'], d['stem'])
            depth = kr.load_depth_velodyne(file, velo2cam, cam2cam, cam=d['cam'],
                                           use_velo_depth=use_velo_depth)
        else:
            file = kr.get_depth_file(d['seq'], f'image_0{d["cam"]}', d['stem'])
            depth = kr.load_depth(file)
        depths.append(depth)
        Ks.append(cam2cam[f'K_0{d["cam"]}'])

    save(save_file, depth=np.array(depths, dtype=object), K=np.array(Ks))


def main():
    parser = ArgumentParser('Export KITTI target depths as npz.')
    parser.add_argument('--split', required=True,
                        choices={'eigen', 'eigen_benchmark', 'eigen_zhou'})
    parser.add_argument('--mode', default='test', choices={'train', 'val', 'test'})
    parser.add_argument('--use-velo-depth', default=None, type=int)
    parser.add_argument('--save-stem', default=None)
    parser.add_argument('--overwrite', default=0, type=int)
    args = parser.parse_args()

    if args.use_velo_depth is None:
        args.use_velo_depth = args.split == 'eigen'
    if args.save_stem is None:
        args.save_stem = f'targets_{args.mode}'
    export_kitti(args.split, args.mode, args.use_velo_depth, args.save_stem,
                 args.overwrite)


if __name__ == '__main__':
    main()
