"""End-to-end KBR pipeline benchmark: real loader -> AR-aug -> train step.

`bench.py` measures the resident-batch synthetic step; this script measures
the FULL production path on the real chip: a PackDB-backed SlowTV store of
720x1280 JPEG frames, the threaded prefetching `DataLoader` (decode + color
aug on host), the aspect-ratio-aug bucket distribution (ref
`cfg/kbr/default.yaml`: prob 0.7, ref_shape 384x640), host->device transfer,
and the jitted bf16 train step — driven by `MonoDepthLoop.fit` itself.

Reports sustained imgs/sec per epoch; epoch 0 includes the bucket compiles
(amortized by the persistent cache on repeat runs), later epochs are steady
state. Compare the last-epoch rate against bench.py's synthetic step rate —
within ~10% means the input pipeline keeps the chip fed.

Usage:
    python tools/bench/bench_pipeline.py [--steps 50] [--epochs 2] [--small]
"""
from __future__ import annotations

import io
import json
import sys
import time
from argparse import ArgumentParser
from pathlib import Path
from tempfile import TemporaryDirectory

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu import paths  # noqa: E402
from slowtv_monodepth_tpu.core import MonoDepthLoop  # noqa: E402
from slowtv_monodepth_tpu.databases import (  # noqa: E402
    write_image_database, write_label_database)

SEQ = '00001'
N_FRAMES = 64


def build_pack(root: Path, h: int, w: int, n_train: int, n_val: int) -> None:
    """Synthetic SlowTV pack: smooth textured JPEG frames + calib + splits."""
    rng = np.random.default_rng(0)
    imgs = {}
    for stem in range(N_FRAMES):
        base = rng.random((h // 8, w // 8, 3), dtype=np.float32)
        img = np.kron(base, np.ones((8, 8, 1), np.float32))
        img += 0.08 * rng.random((h, w, 3), dtype=np.float32)
        buf = io.BytesIO()
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            buf, 'JPEG', quality=90)
        imgs[f'{stem:010}'] = buf.getvalue()
    write_image_database(imgs, root / SEQ)
    K = np.array([[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1.0]])
    write_label_database({SEQ: K}, root / 'calibs')

    valid = list(range(2, N_FRAMES - 2))
    (root / 'splits' / 'all').mkdir(parents=True)
    train = [f'{SEQ} {valid[i % len(valid)]}' for i in range(n_train)]
    val = [f'{SEQ} {valid[i % len(valid)]}' for i in range(n_val)]
    (root / 'splits' / 'all' / 'train_files.txt').write_text('\n'.join(train))
    (root / 'splits' / 'all' / 'val_files.txt').write_text('\n'.join(val))
    (root / 'splits' / 'categories.txt').write_text('natural-hiking\n')


def make_cfg(batch: int, shape, ref_shape, small: bool, workers: int) -> dict:
    """The KBR TPU recipe (cfg/kbr/{default,base,tpu}.yaml) on the pack store."""
    enc_d, enc_p = ('resnet18', 'resnet18') if small else \
        ('convnext_base', 'convnext_tiny')
    return {
        'net': {
            'depth': {'enc_name': enc_d, 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1, 2, 3],
                      **({} if small else {'gelu': 'tanh'})},
            'pose': {'enc_name': enc_p, 'pretrained': False, 'learn_K': True,
                     **({} if small else {'gelu': 'tanh'})},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'dataset': {
            'slow_tv_lmdb': {
                'split': 'all', 'datum': 'image support K', 'supp_idxs': [-1, 1],
                'randomize_supp': True,
                # TPU input path: derive x on device; ship y as uint8 (8x
                # fewer H2D bytes than the reference's two-f32-copies
                # contract — exact here: JPEG decode at native resolution).
                'device_transform': True, 'transfer_uint8': True,
                'train': {'mode': 'train', 'use_aug': True, 'shape': list(shape)},
                'val': {'mode': 'val', 'use_aug': False, 'shape': [384, 640]},
            },
        },
        'loader': {'batch_size': batch, 'drop_last': True,
                   'num_workers': workers,
                   'train': {'shuffle': True}, 'val': {'shuffle': False}},
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'scheduler': {'steplr': {'step_size': 40, 'gamma': 0.1},
                      'linear': {'start_factor': 0.1, 'total_iters': 4}},
        'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False,
                    'precision': None if small else 'bf16',
                    'monitor': 'loss', 'log_every_n_steps': 1000,
                    'limit_val_batches': 1,
                    'aspect_ratio_aug_prob': 0.7,
                    'aspect_ratio_ref_shape': list(ref_shape),
                    'precompile_buckets': True},
    }


class TimedLoop(MonoDepthLoop):
    epoch_stats: list

    def train_epoch(self, epoch: int) -> None:
        t0 = time.perf_counter()
        super().train_epoch(epoch)  # Ends with a host fetch (honest sync).
        dt = time.perf_counter() - t0
        n_imgs = len(self.train_dl) * self.train_dl.batch_size
        self.epoch_stats.append((n_imgs, dt))
        print(f'[epoch {epoch}] {n_imgs} imgs in {dt:.2f}s '
              f'= {n_imgs / dt:.2f} imgs/s')


def main():
    ap = ArgumentParser()
    ap.add_argument('--steps', type=int, default=50, help='train steps/epoch')
    ap.add_argument('--epochs', type=int, default=2)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--workers', type=int, default=8)
    ap.add_argument('--small', action='store_true',
                    help='resnet18 at 96x160 (CPU smoke test of this script)')
    args = ap.parse_args()

    import jax
    from slowtv_monodepth_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache('bench')

    shape, ref_shape = ((96, 160), (64, 96)) if args.small else \
        ((720, 1280), (384, 640))

    with TemporaryDirectory() as td:
        root = Path(td) / 'slow_tv_lmdb'
        print(f'Building synthetic {shape[0]}x{shape[1]} SlowTV pack...')
        build_pack(root, *shape, n_train=args.steps * args.batch,
                   n_val=args.batch)
        paths.DATA_PATHS['slow_tv_lmdb'] = root

        cfg = make_cfg(args.batch, shape, ref_shape, args.small, args.workers)
        cfg['trainer']['max_epochs'] = args.epochs

        # Host-side capability first: loader-only throughput (JPEG decode +
        # aug + collate, no device), and the H2D payload per batch. Together
        # with the synthetic step rate these attribute any e2e gap: on this
        # repo's remote-tunnel TPU the transfer link (~30 MB/s observed) is
        # the binding constraint, not the loader or the step.
        from slowtv_monodepth_tpu import parsers
        dl = parsers.get_dl('train', cfg['dataset'], cfg['loader'])
        t0 = time.perf_counter()
        n_imgs = bytes_per_batch = 0
        for x, y, m in dl:
            if not n_imgs:
                bytes_per_batch = sum(
                    v.nbytes for d in (x, y) for v in d.values()
                    if hasattr(v, 'nbytes'))
            n_imgs += len(m['items'])
        loader_rate = n_imgs / (time.perf_counter() - t0)
        print(f'[loader-only] {n_imgs} imgs at {loader_rate:.2f} imgs/s host '
              f'decode+aug; H2D payload {bytes_per_batch / 1e6:.1f} MB/batch')

        loop = TimedLoop(cfg, ckpt_dir=Path(td) / 'ckpt', use_markers=False)
        loop.epoch_stats = []
        loop.ckpt.step = lambda *a, **kw: None  # Not measuring checkpoint IO.
        loop.fit()

    n, dt = loop.epoch_stats[-1]
    print(json.dumps({
        'metric': 'kbr_e2e_pipeline_imgs_per_sec',
        'value': round(n / dt, 3),
        'unit': 'imgs/sec (sustained, last epoch)',
        'epochs': [round(i / d, 2) for i, d in loop.epoch_stats],
        'loader_only_imgs_per_sec': round(loader_rate, 2),
        'h2d_mb_per_batch': round(bytes_per_batch / 1e6, 1),
    }))


if __name__ == '__main__':
    main()
