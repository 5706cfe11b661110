"""Compute MannequinChallenge GT depth via COLMAP dense reconstruction.

Equivalent of `api/data/preprocess/compute_mannequin_depth.py:14-154`
(reference): per-sequence COLMAP pipeline (feature extraction with the
reference's tuned SIFT/matcher/mapper settings -> bundle adjust -> undistort
-> PatchMatch stereo with geometric consistency) and geometric .bin depth-map
export decoded by `read_array` into per-frame .npy files.

Requires an external `colmap` binary (GPU recommended).
"""
from __future__ import annotations

import shutil
import subprocess
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from slowtv_monodepth_tpu.paths import DATA_PATHS  # noqa: E402


def read_array(path) -> np.ndarray:
    """Decode a COLMAP .bin depth map (official format; ref `:14-28`)."""
    with open(path, 'rb') as fid:
        width, height, channels = np.genfromtxt(
            fid, delimiter='&', max_rows=1, usecols=(0, 1, 2), dtype=int)
        fid.seek(0)
        num_delimiter = 0
        byte = fid.read(1)
        while True:
            if byte == b'&':
                num_delimiter += 1
                if num_delimiter >= 3:
                    break
            byte = fid.read(1)
        array = np.fromfile(fid, np.float32)
    array = array.reshape((width, height, channels), order='F')
    return np.transpose(array, (1, 0, 2)).squeeze().astype(np.float32)


def _call(cmd: list) -> None:
    try:
        subprocess.call([str(c) for c in cmd])
    except FileNotFoundError:
        raise RuntimeError('Missing external binary "colmap" — install it to '
                           'compute MannequinChallenge depth.') from None


def export_seq(src: Path, dst: Path, overwrite: bool = False) -> None:
    depth_dir = dst / 'depths'
    if not overwrite and depth_dir.is_dir():
        print(f'-> Skipping sequence "{src.stem}"...')
        return
    print(f'-> Exporting sequence "{src.stem}"...')
    shutil.rmtree(dst, ignore_errors=True)

    db = dst / 'database.db'
    img_dir, sparse_dir = dst / 'images', dst / 'sparse'
    refined_dir, dense_dir = dst / 'refined', dst / 'dense'
    for d in (img_dir, sparse_dir, refined_dir, dense_dir):
        d.mkdir(parents=True)
    for f in sorted(src.glob('*.jpg')):
        shutil.copy(f, img_dir)

    _call(['colmap', 'feature_extractor',
           '--ImageReader.single_camera', '1',
           '--ImageReader.default_focal_length_factor', '0.85',
           '--SiftExtraction.peak_threshold', '0.02',
           '--database_path', db, '--image_path', img_dir])
    _call(['colmap', 'exhaustive_matcher',
           '--SiftMatching.max_error', '3',
           '--SiftMatching.min_inlier_ratio', '0.3',
           '--SiftMatching.min_num_inliers', '30',
           '--SiftMatching.guided_matching', '1',
           '--database_path', db])
    _call(['colmap', 'mapper',
           '--Mapper.tri_merge_max_reproj_error', '3',
           '--Mapper.ignore_watermarks', '1',
           '--Mapper.filter_max_reproj_error', '2',
           '--database_path', db, '--image_path', img_dir,
           '--output_path', sparse_dir])
    _call(['colmap', 'bundle_adjuster',
           '--input_path', sparse_dir / '0', '--output_path', refined_dir])
    _call(['colmap', 'image_undistorter',
           '--input_path', refined_dir, '--image_path', img_dir,
           '--output_path', dense_dir, '--output_type', 'COLMAP',
           '--max_image_size', '1600'])
    _call(['colmap', 'patch_match_stereo',
           '--PatchMatchStereo.window_radius', '5',
           '--PatchMatchStereo.num_samples', '15',
           '--PatchMatchStereo.geom_consistency_regularizer', '1',
           '--PatchMatchStereo.geom_consistency_max_cost', '1.5',
           '--PatchMatchStereo.filter_min_ncc', '0.2',
           '--PatchMatchStereo.filter_min_num_consistent', '3',
           '--PatchMatchStereo.geom_consistency', 'true',
           '--workspace_path', dense_dir, '--workspace_format', 'COLMAP'])

    depth_dir.mkdir(parents=True, exist_ok=True)
    for f in sorted((dense_dir / 'stereo' / 'depth_maps').glob('*.geometric.bin')):
        depth = read_array(f)
        np.save(depth_dir / f'{f.name.split(".")[0]}.npy', depth)


def export_split(split: str, src: Path, dst: Path, overwrite: bool = False) -> None:
    print(f'-> Exporting "{split}" split...')
    out = dst / split
    out.mkdir(parents=True, exist_ok=True)
    for seq in sorted(d for d in (src / split).iterdir() if d.is_dir()):
        export_seq(seq, out / seq.stem, overwrite)


if __name__ == '__main__':
    parser = ArgumentParser('Compute MannequinChallenge COLMAP depth.')
    parser.add_argument('--split', default='test', choices={'train', 'val', 'test'})
    parser.add_argument('--src', type=Path, default=None,
                        help='Raw video-frames root (default: mannequin data dir).')
    parser.add_argument('--overwrite', default=0, type=int)
    args = parser.parse_args()

    src = args.src or DATA_PATHS['mannequin']
    export_split(args.split, src, DATA_PATHS['mannequin'], args.overwrite)
