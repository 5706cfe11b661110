"""SlowTV dataset creation: extract frames, decimate, splits, COLMAP intrinsics.

Equivalent of `api/data/preprocess/export_slow_tv.py` + the creation half of
`src/devkits/slow_tv.py:100-243` (reference): ffmpeg frame extraction at
10fps with 5-min trims, non-uniform decimation (keep 100 per interval),
90/10 train/val splits with a 100-frame gap, and COLMAP single-camera
intrinsics estimation over 200-frame windows with seed retries.

Requires external `ffmpeg`/`ffprobe`/`colmap` binaries (not bundled here);
each call fails with a clear error when missing.
"""
from __future__ import annotations

import random
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

from slowtv_monodepth_tpu.data.devkits import slow_tv as stv  # noqa: E402
from slowtv_monodepth_tpu.paths import DATA_PATHS  # noqa: E402

FPS = '10'
TRIM = 300            # Trim first/last 5 min.
DATA_SCALE = 4        # 4x more data than sampling at 1 FPS.
N_KEEP = 100
PER_INTERVAL = (N_KEEP * int(FPS)) // DATA_SCALE
P_TRAIN = 0.9
VAL_SKIP = 100
N_COLMAP_IMGS = 200
COLMAP_INTERVAL = 1
SEEDS = (42, 195, 335, 558, 724)


def _run(cmd: list) -> None:
    try:
        subprocess.run([str(c) for c in cmd], check=True)
    except FileNotFoundError:
        raise RuntimeError(f'Missing external binary "{cmd[0]}" — install it to '
                           'run SlowTV dataset creation.') from None


def _non_uniform_decimate(seq: list, n_keep: int, per_interval: int) -> list:
    """Keep the first `n_keep` of every `per_interval` items (ref `:88-97`)."""
    out = []
    for i in range(0, len(seq), per_interval):
        out += seq[i:i + n_keep]
    return out


def extract_frames(vid_file: Path, save_dir: Path, overwrite: bool = False) -> None:
    duration = float(subprocess.check_output([
        'ffprobe', '-v', '0', '-show_entries', 'format=duration',
        '-of', 'compact=p=0:nk=1', str(vid_file)]))
    trim_end = duration - TRIM

    if not overwrite and save_dir.is_dir() and any(save_dir.iterdir()):
        print(f'-> Skipping video "{vid_file}"...')
        return
    shutil.rmtree(save_dir, ignore_errors=True)
    save_dir.mkdir(parents=True)

    print(f'-> Exporting video to "{save_dir}"...')
    _run(['ffmpeg', '-i', vid_file, '-r', FPS, '-vf', f'trim={TRIM}:{trim_end}',
          save_dir / '%010d.png'])

    files = sorted(save_dir.glob('*.png'))
    keep = set(_non_uniform_decimate(files, N_KEEP, PER_INTERVAL))
    for f in set(files) - keep:
        f.unlink()


def add_frames_to_split(seq_dir: Path, *splits: str) -> None:
    seq = seq_dir.stem
    fs = sorted(f.stem for f in seq_dir.glob('*.png'))
    n = int(len(fs) * P_TRAIN)
    train_fs, val_fs = fs[:n - VAL_SKIP], fs[n + VAL_SKIP:]

    for split in splits:
        train_file = stv.get_split_file('train', split.lower())
        val_file = stv.get_split_file('val', split.lower())
        train_file.parent.mkdir(parents=True, exist_ok=True)
        with open(train_file, 'a') as ft:
            ft.writelines(f'{seq} {i}\n' for i in train_fs)
        with open(val_file, 'a') as fv:
            fv.writelines(f'{seq} {i}\n' for i in val_fs)


def estimate_intrinsics(seq_dir: Path, save_root: Path, seed: int,
                        overwrite: bool = False) -> None:
    """COLMAP single-camera intrinsics over a random window (ref `:168-243`)."""
    rng = random.Random(seed)
    seq = seq_dir.stem
    files = sorted(seq_dir.iterdir())
    skip = N_COLMAP_IMGS * COLMAP_INTERVAL
    start = rng.randint(0, max(len(files) - skip, 0))
    files = files[start:start + skip:COLMAP_INTERVAL]

    out_dir = save_root / seq
    if not overwrite and out_dir.is_dir():
        print(f'-> Skipping directory "{out_dir}"...')
        return
    shutil.rmtree(out_dir, ignore_errors=True)

    try:
        db = out_dir / 'database.db'
        img_dir, sparse_dir, txt_dir = out_dir / 'images', out_dir / 'sparse', out_dir / 'txt'
        for d in (img_dir, sparse_dir, txt_dir):
            d.mkdir(parents=True)
        for f in files:
            shutil.copy(f, img_dir)

        _run(['colmap', 'feature_extractor', '--ImageReader.single_camera', '1',
              '--database_path', db, '--image_path', img_dir])
        _run(['colmap', 'sequential_matcher', '--database_path', db])
        _run(['colmap', 'mapper', '--database_path', db, '--image_path', img_dir,
              '--output_path', sparse_dir])
        _run(['colmap', 'model_converter', '--input_path', sparse_dir / '0',
              '--output_path', txt_dir, '--output_type', 'TXT'])

        cams = [line for line in (txt_dir / 'cameras.txt').read_text().splitlines()
                if not line.startswith('#')]
        assert len(cams) == 1
        cam = [float(v) for v in cams[0].split()[2:]]  # [w, h, f, cx, cy, r]
        assert cam[:2] == [1280, 720]
        w, h, f, cx, cy, r = cam
        np.savetxt(stv.get_intrinsics_file(seq), np.array([
            [f, r, cx, 0], [r, f, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]]))
    except Exception as e:
        shutil.rmtree(out_dir, ignore_errors=True)
        raise RuntimeError(f'Failed on seq "{seq}": {e}') from e


def export_scene(vid_file: Path, cat: str, overwrite: bool = False) -> None:
    seq_dir = DATA_PATHS['slow_tv'] / vid_file.stem
    extract_frames(vid_file, seq_dir, overwrite=overwrite)
    for seed in SEEDS:
        try:
            estimate_intrinsics(seq_dir, DATA_PATHS['slow_tv'] / 'colmap',
                                seed=seed, overwrite=overwrite)
            break
        except RuntimeError:
            print(f'-> Failed COLMAP intrinsics with seed "{seed}"...')
    else:
        raise RuntimeError(f'-> Tried {SEEDS} and they all failed!!')
    add_frames_to_split(seq_dir, cat, vid_file.stem, 'all')


if __name__ == '__main__':
    parser = ArgumentParser('SlowTV dataset creation from downloaded videos.')
    parser.add_argument('--idx', type=int, default=None)
    parser.add_argument('--overwrite', default=0, type=int)
    args = parser.parse_args()

    cats = stv.load_categories(subcats=False)
    vids = stv.get_vid_files()
    assert len(cats) == len(vids), 'Non-matching SlowTV videos and categories.'

    if args.idx is not None:
        export_scene(vids[args.idx], cats[args.idx], args.overwrite)
    else:
        for vid, cat in zip(vids, cats):
            export_scene(vid, cat, args.overwrite)
