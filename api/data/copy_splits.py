"""Install the canonical split lists into the dataset roots.

The reference ships its split files in-repo and copies them with
`api/data/splits/copy_splits.py`; here they are treated as release data: this
script imports them from a reference checkout (or any directory with the same
`<Dataset>/splits/...` layout) into the devkit locations this framework reads
(`<dataset_root>/splits/...`).

    python api/data/copy_splits.py /path/to/slowtv_monodepth/api/data/splits
"""
from __future__ import annotations

import shutil
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu.paths import DATA_ROOTS  # noqa: E402

# Reference split dir name -> our dataset dir name (paths.DATASET_NAMES).
_DIR_MAP = {
    'kitti_raw_sync': 'kitti_raw_sync',
    'MannequinChallenge': 'MannequinChallenge',
    'slow_tv': 'slow_tv',
    'Sintel': 'Sintel',
    'TUM_RGBD': 'TUM_RGBD',
    'mapfree': 'mapfree',
}


def main(src: Path, dst_root: Path) -> None:
    if not src.is_dir():
        raise FileNotFoundError(f'Split source dir not found: {src}')
    for ref_name, our_name in _DIR_MAP.items():
        s = src / ref_name
        if not s.is_dir():
            print(f'-- skip {ref_name} (not in {src})')
            continue
        d = dst_root / our_name / 'splits'
        d.parent.mkdir(parents=True, exist_ok=True)
        shutil.copytree(s, d, dirs_exist_ok=True)
        n = sum(1 for _ in d.rglob('*_files.txt'))
        print(f'-> {our_name}: {n} split files into {d}')


if __name__ == '__main__':
    parser = ArgumentParser('Copy canonical dataset splits into a data root.')
    parser.add_argument('src', type=Path,
                        help="Reference checkout's api/data/splits directory.")
    parser.add_argument('--dst', type=Path, default=Path(DATA_ROOTS[-1]))
    args = parser.parse_args()
    main(args.src, args.dst)
