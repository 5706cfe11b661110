"""Install the canonical split lists into the dataset roots.

The reference ships its split files in-repo and copies them with
`api/data/splits/copy_splits.py` (ref `/root/reference/api/data/splits/copy_splits.py:1`);
this framework does the same: the canonical lists live gzipped under
`api/data/splits/<Dataset>/splits/**` (release data — they define every
published number) and this script installs them into the devkit locations
(`<dataset_root>/splits/...`), decompressing on the way.

    python api/data/copy_splits.py                  # in-repo splits -> DATA_ROOT
    python api/data/copy_splits.py --src /other/splits --dst /data
"""
from __future__ import annotations

import gzip
import shutil
import sys
from argparse import ArgumentParser
from pathlib import Path

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu.paths import DATA_ROOTS  # noqa: E402

REPO_SPLITS = Path(__file__).resolve().parent / 'splits'

# Split dir name -> our dataset dir name (paths.DATASET_NAMES).
_DIR_MAP = {
    'kitti_raw_sync': 'kitti_raw_sync',
    'MannequinChallenge': 'MannequinChallenge',
    'slow_tv': 'slow_tv',
    'Sintel': 'Sintel',
    'TUM_RGBD': 'TUM_RGBD',
    'mapfree': 'mapfree',
}


def _install(src: Path, dst: Path) -> int:
    """Copy `src`'s tree into `dst`, gunzipping `*.gz` members. Returns #files."""
    n = 0
    for f in sorted(p for p in src.rglob('*') if p.is_file()):
        rel = f.relative_to(src)
        if f.suffix == '.gz':
            out = dst / rel.with_suffix('')  # strip .gz
            out.parent.mkdir(parents=True, exist_ok=True)
            with gzip.open(f, 'rb') as fin, open(out, 'wb') as fout:
                shutil.copyfileobj(fin, fout)
        else:
            out = dst / rel
            out.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(f, out)
        n += 1
    return n


def main(src: Path, dst_root: Path) -> None:
    if not src.is_dir():
        raise FileNotFoundError(f'Split source dir not found: {src}')
    for src_name, our_name in _DIR_MAP.items():
        s = src / src_name
        if not s.is_dir():
            print(f'-- skip {src_name} (not in {src})')
            continue
        d = dst_root / our_name
        n = _install(s, d)
        print(f'-> {our_name}: {n} files into {d}')


def cli():
    parser = ArgumentParser('Install canonical dataset splits into a data root.')
    parser.add_argument('--src', type=Path, default=REPO_SPLITS,
                        help='Splits tree (default: the in-repo api/data/splits).')
    parser.add_argument('--dst', type=Path, default=Path(DATA_ROOTS[-1]))
    args = parser.parse_args()
    main(args.src, args.dst)


if __name__ == '__main__':
    cli()
