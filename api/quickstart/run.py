"""Minimal-deps inference: checkpoint -> depth maps over an image directory.

Equivalent of `api/quickstart/run.py:99-126` (reference): loads the depth net
from the checkpoint's embedded cfg, aspect-preserving resize to multiples of
32 (`run.py:63-72`), predicts scale-0 disparity, and saves a turbo-colormap
png and/or raw npy per image.

Usage:
    python api/quickstart/run.py --ckpt-file models/kbr/best \
        --img-dir imgs/ --out-dir out/
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np
from PIL import Image

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slowtv_monodepth_tpu.core.predictors import BenchmarkPredictor  # noqa: E402
from slowtv_monodepth_tpu.data.base_mde import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402
from slowtv_monodepth_tpu.ops import resize  # noqa: E402
from slowtv_monodepth_tpu.tools import rgb_from_disp  # noqa: E402


def get_files(path: Path, ext: str) -> list:
    files = sorted(path.glob(f'*{ext}'))
    if not files:
        raise FileNotFoundError(f'No files found in "{path}" with extension "{ext}".')
    print(f'-> Found {len(files)} files to predict...')
    return files


def get_img_shape(shape, w: int, h: int) -> tuple:
    """Landscape -> fixed width; portrait -> fixed height; snap to mult-32."""
    img_h, img_w = shape
    new_h, new_w = (int(w * img_h / img_w), w) if img_w >= img_h else (h, int(h * img_w / img_h))
    return round(new_h / 32) * 32, round(new_w / 32) * 32


def load_img(img_file: Path, width: int, height: int):
    img = Image.open(img_file).convert('RGB')
    img = np.array(img, dtype=np.float32) / 255.0
    ref_shape = img.shape[:2]
    shape = get_img_shape(ref_shape, width, height)
    img = np.asarray(resize(jnp.asarray(img[None]), shape))
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    return img, ref_shape


def save_disp(disp: np.ndarray, img_file: Path, out_dir: Path, out_ext: list) -> None:
    name = img_file.stem
    disp = np.asarray(disp).squeeze()
    for ext in out_ext:
        if ext == '.png':
            rgb = (rgb_from_disp(disp) * 255).astype(np.uint8)
            Image.fromarray(rgb).save(out_dir / f'{name}{ext}')
        elif ext == '.npy':
            np.save(out_dir / f'{name}{ext}', disp)
        else:
            raise ValueError(f'Invalid extension "{ext}".')


def default_img_dir() -> Path:
    """`assets/demo`, generated on first use (assets/README.md).

    Mirrors the reference's demo default (ref `api/quickstart/run.py:118`
    points at its `assets/` photos); ours are synthetic stand-ins created
    locally since the real photos are release artifacts.
    """
    demo = Path(__file__).resolve().parents[2] / 'assets' / 'demo'
    if not (demo.is_dir() and any(demo.glob('*.png'))):
        import runpy
        gen = demo.parent / 'generate.py'
        print(f'-> Generating demo images in "{demo}"...')
        runpy.run_path(str(gen), run_name='__main__')
    return demo


def main(args):
    if args.img_dir is None:
        args.img_dir = default_img_dir()
    predictor = BenchmarkPredictor()
    net = predictor.load_model(args.ckpt_file)

    if args.out_dir:
        args.out_dir.mkdir(parents=True, exist_ok=True)
        print(f'-> Saving predictions to "{args.out_dir}"...')

    for file in get_files(args.img_dir, args.img_ext):
        img, ref_shape = load_img(file, args.width, args.height)
        disp = net(jnp.asarray(img))['disp'][0]
        disp = resize(disp, tuple(ref_shape))
        if args.out_dir:
            save_disp(np.asarray(disp), file, args.out_dir, args.out_ext)


def cli():
    parser = ArgumentParser('Run KBR predictions on a directory of images.')
    parser.add_argument('--ckpt-file', type=Path, required=True)
    parser.add_argument('--img-dir', type=Path, default=None,
                        help='Defaults to assets/demo (generated on first '
                             'use; see assets/README.md).')
    parser.add_argument('--img-ext', default='.png')
    parser.add_argument('--out-dir', type=Path, default=None)
    parser.add_argument('--out-ext', nargs='+', default=['.png', '.npy'])
    parser.add_argument('--width', type=int, default=640)
    parser.add_argument('--height', type=int, default=384)
    main(parser.parse_args())


if __name__ == '__main__':
    cli()
