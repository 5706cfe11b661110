"""Unpack NYUD-v2 from the labeled .mat release into png/npy splits.

Equivalent of `api/data/preprocess/export_nyud.py` (reference): read
`nyu_depth_v2_labeled.mat` (HDF5) + `splits.mat`, export rgb pngs + depth
npys and split files.
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path

import h5py
import numpy as np
from PIL import Image

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from slowtv_monodepth_tpu.paths import DATA_PATHS  # noqa: E402


def loadmat(file) -> dict:
    with h5py.File(file) as f:
        return {k: np.array(v) for k, v in f.items()}


def export_split(mode: str, idxs, data: dict, dst: Path) -> None:
    img_dir = dst / mode / 'rgb'
    depth_dir = dst / mode / 'depth'
    split_file = dst / 'splits' / f'{mode}_files.txt'
    for d in (img_dir, depth_dir, split_file.parent):
        d.mkdir(parents=True, exist_ok=True)

    with open(split_file, 'w') as f:
        for i in idxs:
            i -= 1  # Matlab 1-indexing.
            stem = f'{i:05}'
            img = data['images'][i - 1].transpose((2, 1, 0))
            depth = data['depths'][i - 1].T[..., None]
            Image.fromarray(img.astype(np.uint8)).save(img_dir / f'{stem}.png')
            np.save(depth_dir / f'{stem}.npy', depth.astype(np.float32))
            f.write(stem + '\n')


def main(dst: Path) -> None:
    import scipy.io as sio
    data = loadmat(dst / 'nyu_depth_v2_labeled.mat')
    splits = sio.loadmat(dst / 'splits.mat')
    export_split('train', splits['trainNdxs'].squeeze(), data, dst)
    export_split('test', splits['testNdxs'].squeeze(), data, dst)


if __name__ == '__main__':
    parser = ArgumentParser()
    parser.add_argument('--dst', type=Path, default=None)
    args = parser.parse_args()
    main(args.dst or DATA_PATHS['nyud'])
