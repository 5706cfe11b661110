"""Build pack record stores from the raw dataset trees.

Equivalent of the reference LMDB builders (`api/data/lmdb/{kitti,mannequin,
slow_tv}.py`, ~355 LoC): converts raw file trees into the single-file pack
stores consumed by the `*_lmdb`-keyed datasets. Split files and txt metadata
are copied alongside.

Usage:
    python api/data/pack/build.py slow_tv
    python api/data/pack/build.py mannequin --mode train
    python api/data/pack/build.py kitti
"""
from __future__ import annotations

import pickle
import shutil
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from slowtv_monodepth_tpu.databases import (  # noqa: E402
    write_image_database, write_label_database)
from slowtv_monodepth_tpu.paths import DATA_PATHS  # noqa: E402


def build_slow_tv(out_root: Path) -> None:
    """Per-sequence image packs + one calibs pack (ref `api/data/lmdb/slow_tv.py`)."""
    from slowtv_monodepth_tpu.data.devkits import slow_tv as stv
    src = DATA_PATHS['slow_tv']
    calibs = {}
    for seq in stv.get_seqs():
        files = sorted((src / seq).glob('*.png'))
        print(f'-> {seq}: {len(files)} images')
        write_image_database({f.stem: f for f in files}, out_root / seq)
        calibs[seq] = stv.load_intrinsics(seq)
    write_label_database(calibs, out_root / 'calibs')
    shutil.copytree(src / 'splits', out_root / 'splits', dirs_exist_ok=True)


def build_mannequin(out_root: Path, mode: str) -> None:
    """images/depths/intrinsics/shapes/poses packs per mode
    (ref `api/data/lmdb/mannequin.py`)."""
    from slowtv_monodepth_tpu.data.devkits import mannequin as mc
    src = DATA_PATHS['mannequin']
    imgs, depths, Ks, shapes, poses = {}, {}, {}, {}, {}
    for seq_dir in sorted((src / mode).iterdir()):
        if not seq_dir.is_dir():
            continue
        seq = seq_dir.stem
        info = mc.load_info(mode, seq)
        first = next(iter(info.values()))
        Ks[seq], shapes[seq] = first['K'], first['shape']
        poses[seq] = {k: v['T'] for k, v in info.items()}
        for f in sorted(seq_dir.glob('*.jpg')):
            imgs[f'{seq}/{f.stem}'] = f
        for f in sorted(seq_dir.glob('*.npy')):
            depths[f'{seq}/{f.stem}'] = np.load(f)
        print(f'-> {seq}: {len(info)} frames')

    write_image_database(imgs, out_root / mode / 'images')
    write_label_database(depths, out_root / mode / 'depths')
    write_label_database(Ks, out_root / mode / 'intrinsics')
    write_label_database(shapes, out_root / mode / 'shapes')
    write_label_database(poses, out_root / mode / 'poses')
    shutil.copytree(src / 'splits', out_root / 'splits', dirs_exist_ok=True)


def build_kitti(out_root: Path) -> None:
    """Per-drive image/depth/velo/hint packs + per-seq calibration packs
    (ref `api/data/lmdb/kitti.py:20-55`)."""
    from slowtv_monodepth_tpu.data.devkits import kitti_raw as kr
    src = DATA_PATHS['kitti_raw']

    for seq_dir in sorted(src.iterdir()):
        if not seq_dir.is_dir() or seq_dir.stem not in kr.SEQS:
            continue
        seq = seq_dir.stem
        cam2cam, imu2velo, velo2cam = kr.load_calib(seq)
        calib = {f'cam2cam/{k}': v for k, v in cam2cam.items()}
        calib |= {f'imu2velo/{k}': v for k, v in imu2velo.items()}
        calib |= {f'velo2cam/{k}': v for k, v in velo2cam.items()}
        write_label_database(calib, out_root / seq / 'calibration')

        for drive_dir in sorted(seq_dir.glob(f'{seq}_drive_*_sync')):
            drive = drive_dir.stem
            for cam in ('image_02', 'image_03'):
                files = sorted((drive_dir / cam / 'data').glob('*.png'))
                if files:
                    write_image_database({f.stem: f for f in files},
                                         out_root / seq / drive / cam / 'data')
            velos = sorted((drive_dir / 'velodyne_points' / 'data').glob('*.bin'))
            if velos:
                write_label_database({f.stem: kr.load_velo(f) for f in velos},
                                     out_root / seq / drive / 'velodyne_points' / 'data')
            oxts = sorted((drive_dir / 'oxts' / 'data').glob('*.txt'))
            if oxts:
                write_label_database({f.stem: kr.load_oxts(f) for f in oxts},
                                     out_root / seq / drive / 'oxts' / 'data')
            print(f'-> {drive}')

        # Benchmark depths + SGBM hints mirror the raw layout when present.
        for sub, pat in (('depth_benchmark', 'proj_depth/groundtruth'),):
            for d in sorted((src / sub / seq).glob(f'*/{pat}/image_0[23]')):
                files = sorted(d.glob('*.png'))
                drive = d.parents[2].stem
                write_image_database(
                    {f.stem: f for f in files},
                    out_root / sub / seq / drive / 'proj_depth' / 'groundtruth' / d.stem)
        for d in sorted((src / 'depth_hints' / seq).glob('*/image_0[23]')):
            files = sorted(d.glob('*.npy'))
            write_label_database({f.stem: np.load(f) for f in files},
                                 out_root / 'depth_hints' / seq / d.parent.stem / d.stem)

    if (src / 'splits').is_dir():
        shutil.copytree(src / 'splits', out_root / 'splits', dirs_exist_ok=True)


BUILDERS = {'slow_tv': build_slow_tv, 'mannequin': build_mannequin, 'kitti': build_kitti}
OUT_KEYS = {'slow_tv': 'slow_tv_lmdb', 'mannequin': 'mannequin_lmdb', 'kitti': 'kitti_raw_lmdb'}


def main():
    parser = ArgumentParser('Build pack record stores from raw dataset trees.')
    parser.add_argument('dataset', choices=sorted(BUILDERS))
    parser.add_argument('--mode', default='train', help='(mannequin only)')
    parser.add_argument('--out', type=Path, default=None,
                        help='Output root (default: <data_root>/<name>_lmdb layout).')
    args = parser.parse_args()

    from slowtv_monodepth_tpu.paths import DATA_ROOTS, DATASET_NAMES
    out = args.out or (Path(DATA_ROOTS[-1]) / DATASET_NAMES[OUT_KEYS[args.dataset]])
    out.mkdir(parents=True, exist_ok=True)
    if args.dataset == 'mannequin':
        build_mannequin(out, args.mode)
    else:
        BUILDERS[args.dataset](out)
    print(f'Done -> {out}')


if __name__ == '__main__':
    main()
