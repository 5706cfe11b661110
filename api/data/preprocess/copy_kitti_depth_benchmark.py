"""Copy KITTI Benchmark depth maps into the Raw Sync folder structure.

Equivalent of `api/data/preprocess/copy_kitti_depth_benchmark.py` (reference).
"""
from __future__ import annotations

import shutil
import sys
from argparse import ArgumentParser
from pathlib import Path

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from slowtv_monodepth_tpu.data.devkits import kitti_raw as kr  # noqa: E402
from slowtv_monodepth_tpu.paths import DATA_PATHS  # noqa: E402


def main(src: Path, dst: Path) -> None:
    root = dst / 'depth_benchmark'
    root.mkdir(exist_ok=True)
    for seq in kr.SEQS:
        (root / seq).mkdir(exist_ok=True)

    for mode in ('train', 'val'):
        for path in sorted((src / mode).iterdir()):
            seq = next(s for s in kr.SEQS if path.stem.startswith(s))
            shutil.copytree(path, root / seq / path.stem, dirs_exist_ok=True)


if __name__ == '__main__':
    parser = ArgumentParser()
    parser.add_argument('--src', type=Path, default=None)
    parser.add_argument('--dst', type=Path, default=None)
    args = parser.parse_args()
    main(args.src or DATA_PATHS['kitti_depth'], args.dst or DATA_PATHS['kitti_raw'])
