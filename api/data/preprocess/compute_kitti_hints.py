"""Precompute fused SGBM depth hints for proxy supervision.

Equivalent of `api/data/preprocess/compute_kitti_hints.py:26-139` (reference,
after DepthHints): 12 SGBM hyperparameter settings (block {1,2,3} x ndisp
{64,96,128,160}), each disparity converted to depth via `K fx * |baseline| /
disp`, fused per pixel by the minimum SSIM+L1 photometric error of warping the
stereo pair with each candidate depth.

TPU twist: the per-candidate warp + photometric error runs as one jitted JAX
batch over the 12 candidates (the reference loops on CPU torch); SGBM itself
stays on host cv2. Results cache per item so runs are resumable.
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path
from typing import Sequence

import cv2
import numpy as np

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slowtv_monodepth_tpu.data import KittiRawDataset  # noqa: E402
from slowtv_monodepth_tpu.losses import PhotoError  # noqa: E402
from slowtv_monodepth_tpu.ops import to_inv, view_synth  # noqa: E402
from slowtv_monodepth_tpu.paths import DATA_PATHS  # noqa: E402


def generate_matchers(block_sizes: Sequence[int] = (1, 2, 3),
                      disps: Sequence[int] = (64, 96, 128, 160)) -> list:
    """SGBM matchers over the DepthHints hyperparameter grid (ref `:26-38`)."""
    w = 3  # SAD window size.
    return [
        cv2.StereoSGBM_create(
            preFilterCap=63, P1=w * w * 4, P2=w * w * 32, minDisparity=0,
            numDisparities=d, uniquenessRatio=10, speckleWindowSize=100,
            speckleRange=16, blockSize=b)
        for b in block_sizes for d in disps
    ]


def compute_depth(img, img_st, K, T, matchers) -> np.ndarray:
    """Candidate depths from each matcher (ref `:41-72`); (n, h, w, 1)."""
    img = (255 * img).astype(np.uint8)
    img_st = (255 * img_st).astype(np.uint8)

    is_invert = T[0, 3] > 0  # SGBM matches left->right only.
    if is_invert:
        img, img_st = img[:, ::-1], img_st[:, ::-1]

    disps = []
    for m in matchers:
        disp = m.compute(img, img_st) / 16  # Fixed-point -> pixel disparity.
        if is_invert:
            disp = disp[:, ::-1]
        disps.append(disp[..., None])

    disps = np.stack(disps).astype(np.float32)
    disps *= (disps > 0).astype(np.float32)
    # NOTE: still needs the 5.4x stereo scale at eval time (ref `:68-70`).
    return K[0, 0] * abs(T[0, 3]) * np.asarray(to_inv(disps))


_crit = PhotoError(weight_ssim=0.85)


@jax.jit
def _fuse(img, supp, depths, T, K):
    """Min-photometric fusion over the candidate axis (one device batch)."""
    n = depths.shape[0]
    imgs = jnp.broadcast_to(img, (n,) + img.shape)
    supps = jnp.broadcast_to(supp, (n,) + supp.shape)
    Ts = jnp.broadcast_to(T, (n, 4, 4))
    Ks = jnp.broadcast_to(K, (n, 4, 4))
    warp, _, _ = view_synth(supps, depths, Ts, Ks)
    err = _crit(warp, imgs)  # (n, h, w, 1)
    idx = jnp.argmin(err[..., 0], axis=0)  # (h, w)
    return jnp.take_along_axis(depths[..., 0], idx[None], axis=0)[0]


def export_hint(item, save_dir: Path, matchers, overwrite: bool = False,
                verbose: bool = False) -> None:
    x, y, m = item
    save_file = save_dir / f"{m['stem']}.npy"
    save_file.parent.mkdir(exist_ok=True, parents=True)
    if save_file.is_file() and not overwrite:
        if verbose:
            print(f'-> Skipping {save_file}...')
        return

    depths = compute_depth(y['imgs'], y['supp_imgs'][0], K=y['K'],
                           T=y['T_stereo'], matchers=matchers)
    depth = _fuse(jnp.asarray(y['imgs']), jnp.asarray(y['supp_imgs'][0]),
                  jnp.asarray(depths), jnp.asarray(y['T_stereo']),
                  jnp.asarray(y['K']))
    np.save(save_file, np.asarray(depth))


if __name__ == '__main__':
    SPLITS = ('eigen', 'eigen_zhou', 'eigen_benchmark', 'benchmark')
    parser = ArgumentParser(description='Precompute fused SGBM depth hints.')
    parser.add_argument('--root', type=Path, default=None)
    parser.add_argument('--split', required=True, choices=SPLITS)
    parser.add_argument('--mode', default='train', choices={'train', 'val', 'test'})
    parser.add_argument('--item', default=None, type=int)
    parser.add_argument('--overwrite', default=0, type=int)
    args = parser.parse_args()

    root = args.root or DATA_PATHS['kitti_raw']
    save_dir = root / 'depth_hints'
    save_dir.mkdir(exist_ok=True)

    matchers = generate_matchers()
    ds = KittiRawDataset(split=args.split, mode=args.mode,
                         datum='image support K', shape=(320, 1024),
                         supp_idxs=[0], log_time=False)

    if args.item is not None:
        export_hint(ds[args.item], save_dir, matchers, args.overwrite, verbose=True)
    else:
        for i in range(len(ds)):
            export_hint(ds[i], save_dir, matchers, args.overwrite)
