"""The flagship KBR call stack as ONE program (SURVEY §3.1, VERDICT r03 #3).

Every piece of the KBR recipe is unit-tested elsewhere (round-robin loading in
`test_data.py`, AR-aug bucketing in `test_loop.py`, learned K in
`test_trainer.py`, pack stores in `test_databases.py`); this module executes
the reference's daily-driven wiring END-TO-END, exactly as
`cfg/kbr/default.yaml` composes it (ref `src/tools/parsers.py:154-202`,
`src/utils/loader.py:10-35`):

    tri-dataset (kitti_lmdb + mannequin_lmdb + slow_tv_lmdb pack stores)
    -> per-dataset shapes at the real aspect ratios (distinct AR-aug buckets)
    -> round-robin ConcatDataLoader with per-dataset sampler seeds
    -> aspect-ratio aug (p=0.7, ref budget) on device
    -> learned intrinsics + min-reprojection/automask + edge-aware smoothness
    -> grad accumulation 2 -> MonoDepthLoop.fit on the 8-device CPU mesh
    -> 2 epochs -> best/last checkpoints + finished marker.

Asserted: ONE executable per (shape bucket, datum signature); per-dataset
sampler seeds distinct and advanced per epoch; round-robin order holds;
optimizer applied every 2 mini-steps; learned-K + depth-metric scalars logged
finite; checkpoints written and resumable.
"""
import io
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from slowtv_monodepth_tpu import paths
from slowtv_monodepth_tpu.core import MonoDepthLoop, load_checkpoint
from slowtv_monodepth_tpu.databases import (
    write_image_database, write_label_database)
from slowtv_monodepth_tpu.parallel import make_mesh

N_FRAMES = 26


def _png_bytes(shape, seed):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, shape + (3,), dtype=np.uint8))
    b = io.BytesIO()
    img.save(b, 'PNG')
    return b.getvalue()


def _depth_png_bytes(shape, seed):
    rng = np.random.default_rng(seed)
    depth = (rng.random(shape) * 50 * 256).astype(np.uint16)
    b = io.BytesIO()
    Image.fromarray(depth, mode='I;16').save(b, 'PNG')
    return b.getvalue()


@pytest.fixture
def kitti_pack_root(tmp_path):
    """KITTI pack store, laid out as `api/data/pack/build.py:build_kitti`
    writes it: per-drive image packs (both cams) + benchmark-depth packs."""
    root = tmp_path / 'kitti_raw_sync_lmdb'
    seq, drive = '2011_09_26', '2011_09_26_drive_0001_sync'
    for cam in ('image_02', 'image_03'):
        write_image_database(
            {f'{i:010d}': _png_bytes((48, 160), i) for i in range(N_FRAMES)},
            root / seq / drive / cam / 'data')
        write_image_database(
            {f'{i:010d}': _depth_png_bytes((48, 160), i) for i in range(N_FRAMES)},
            root / 'depth_benchmark' / seq / drive / 'proj_depth' / 'groundtruth' / cam)
    split = root / 'splits' / 'tiny'
    split.mkdir(parents=True)
    (split / 'train_files.txt').write_text(
        '\n'.join(f'{seq}/{drive} {i} l' for i in range(1, 19)))
    (split / 'val_files.txt').write_text(
        '\n'.join(f'{seq}/{drive} {i} l' for i in range(1, 9)))
    paths.DATA_PATHS['kitti_raw_lmdb'] = root
    yield root
    paths.DATA_PATHS.pop('kitti_raw_lmdb', None)


@pytest.fixture
def slowtv_pack_root(tmp_path):
    """Raw SlowTV tree -> pack store via the real builder."""
    raw = tmp_path / 'slow_tv'
    seq = '00001'
    for stem in range(N_FRAMES):
        p = raw / seq / f'{stem:010}.png'
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.open(io.BytesIO(_png_bytes((64, 112), stem))).save(p)
    np.savetxt(raw / seq / 'intrinsics.txt',
               np.array([[600, 0, 640, 0], [0, 600, 360, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1.0]]))
    (raw / 'splits' / 'all').mkdir(parents=True)
    (raw / 'splits' / 'all' / 'train_files.txt').write_text(
        '\n'.join(f'{seq} {i}' for i in range(6, 24)))
    (raw / 'splits' / 'all' / 'val_files.txt').write_text(
        '\n'.join(f'{seq} {i}' for i in range(6, 14)))
    (raw / 'splits' / 'categories.txt').write_text('natural-hiking\n')
    paths.DATA_PATHS['slow_tv'] = raw

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / 'api' / 'data' / 'pack'))
    import build as pack_build
    out = tmp_path / 'slow_tv_lmdb'
    pack_build.build_slow_tv(out)
    paths.DATA_PATHS['slow_tv_lmdb'] = out
    yield out
    paths.DATA_PATHS.pop('slow_tv', None)
    paths.DATA_PATHS.pop('slow_tv_lmdb', None)


@pytest.fixture
def mannequin_pack_root(tmp_path):
    """Raw MannequinChallenge train+val trees -> pack stores via the builder."""
    raw = tmp_path / 'MannequinChallenge'
    for mode, seq in (('train', 'seqA'), ('val', 'seqB')):
        for stem in range(N_FRAMES):
            p = raw / mode / seq / f'{stem:05}.jpg'
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.open(io.BytesIO(_png_bytes((64, 112), stem))).convert('RGB').save(p)
        lines = [f'{N_FRAMES} 0']
        for _ in range(N_FRAMES):
            lines += ['0 64 0 112', '0.9 1.6 0.5 0.5',
                      '1 0 0', '0 1 0', '0 0 1', '0 0 0']
        (raw / mode / seq / 'calibration.txt').write_text('\n'.join(lines) + '\n')
    (raw / 'splits').mkdir(parents=True)
    (raw / 'splits' / 'train_files.txt').write_text(
        '\n'.join(f'seqA {i:05}' for i in range(6, 24)) + '\n')
    (raw / 'splits' / 'val_files.txt').write_text(
        '\n'.join(f'seqB {i:05}' for i in range(6, 14)) + '\n')
    paths.DATA_PATHS['mannequin'] = raw

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / 'api' / 'data' / 'pack'))
    import build as pack_build
    out = tmp_path / 'MannequinChallenge_lmdb'
    pack_build.build_mannequin(out, 'train')
    pack_build.build_mannequin(out, 'val')
    paths.DATA_PATHS['mannequin_lmdb'] = out
    yield out
    paths.DATA_PATHS.pop('mannequin', None)
    paths.DATA_PATHS.pop('mannequin_lmdb', None)


def make_kbr_cfg():
    """`cfg/kbr/default.yaml` scaled down: same structure, same knobs, same
    per-dataset aspect ratios (KITTI 48x160 ~ 376/1242, SlowTV/Mannequin
    64x112 ~ 720/1280), toy-capacity nets."""
    return {
        'net': {
            'depth': {'enc_name': 'toy', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1, 2, 3]},
            'pose': {'enc_name': 'toy', 'pretrained': False, 'learn_K': True},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'dataset': {
            'kitti_lmdb': {
                'split': 'tiny', 'datum': 'image support depth K',
                'supp_idxs': [-1, 1], 'max_len': 16, 'randomize': True,
                'randomize_supp': True,
                'train': {'mode': 'train', 'use_aug': True, 'shape': [48, 160]},
                'val': {'mode': 'val', 'use_aug': False, 'shape': [32, 96]},
            },
            'mannequin_lmdb': {
                'datum': 'image support K',
                'supp_idxs': [-1, 1], 'max_len': 16, 'randomize': True,
                'randomize_supp': True,
                'train': {'mode': 'train', 'use_aug': True, 'shape': [64, 112]},
                'val': {'mode': 'val', 'use_aug': False, 'shape': [32, 64]},
            },
            'slow_tv_lmdb': {
                'split': 'all', 'datum': 'image support K',
                'supp_idxs': [-1, 1], 'max_len': 16, 'randomize': True,
                'randomize_supp': True,
                'train': {'mode': 'train', 'use_aug': True, 'shape': [64, 112]},
                'val': {'mode': 'val', 'use_aug': False, 'shape': [32, 64]},
            },
        },
        'loader': {'batch_size': 8, 'drop_last': True, 'num_workers': 0,
                   'train': {'shuffle': True}, 'val': {'shuffle': False}},
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'scheduler': {'steplr': {'step_size': 40, 'gamma': 0.1},
                      'linear': {'start_factor': 0.1, 'total_iters': 4}},
        'trainer': {'max_epochs': 2, 'min_depth': 0.1, 'max_depth': 100,
                    'monitor': 'loss', 'log_every_n_steps': 1,
                    'aspect_ratio_aug_prob': 0.7,
                    'aspect_ratio_ref_shape': [48, 80],
                    'accumulate_grad_batches': 2, 'always_fwd_pose': False},
    }


class _Writer:
    def __init__(self):
        self.logged = []

    def add_scalar(self, tag, val, step):
        self.logged.append((tag, val, step))


@pytest.mark.slow
def test_kbr_flagship_wiring_end_to_end(
        kitti_pack_root, mannequin_pack_root, slowtv_pack_root, tmp_path):
    import random
    random.seed(0)  # AR-aug bucket sampling (host-side) determinism.
    np.random.seed(0)
    ckpt_dir = tmp_path / 'kbr_run'
    writer = _Writer()
    mesh = make_mesh(8)
    loop = MonoDepthLoop(make_kbr_cfg(), ckpt_dir, mesh=mesh, writer=writer)

    # Instrument the AR-aug output: (post-aug image shape, datum signature)
    # per train batch, in arrival order.
    seen = []
    orig_aug = loop.ar_aug

    def recording_aug(batch, **kw):
        out = orig_aug(batch, **kw)
        seen.append((tuple(out[0]['imgs'].shape), 'depth' in out[1]))
        return out

    loop.ar_aug = recording_aug
    loop.fit()

    # --- Loop ran the full tri-dataset round-robin: 3 datasets x 2
    # batches/epoch x 2 epochs (16 items / batch 8 = 2 per dataset).
    assert len(seen) == 12
    assert int(loop.state.step) == 12
    # Round-robin order is kitti, mannequin, slow_tv (cfg key order); only
    # kitti batches carry GT depth.
    assert [has_depth for _, has_depth in seen] == [i % 3 == 0 for i in range(12)]
    # AR-aug produced >1 bucket and every output is a mult-of-32 snap of the
    # [48, 80] reference budget.
    train_shapes = {s for s, _ in seen}
    assert len(train_shapes) >= 2, f'AR-aug degenerate: {train_shapes}'
    for (b, h, w, c) in train_shapes:
        assert b == 8 and c == 3 and h % 32 == 0 and w % 32 == 0, (h, w)

    # --- ONE executable per (shape bucket, datum signature): XLA recompiles
    # only for genuinely new shapes; repeats hit the jit cache.
    train_step = loop._steps[((-1, 1), True)]
    assert train_step._cache_size() == len(set(seen)), \
        f'{train_step._cache_size()} executables for {len(set(seen))} buckets'
    val_step = loop._steps[((-1, 1), False)]
    assert val_step._cache_size() == 2  # kitti (32,96)+depth | mc/stv (32,64).

    # --- Per-dataset sampler seeds distinct (ref seed*10^i) and advanced to
    # the final epoch on every dataset (ConcatDataLoader.set_epoch fan-out).
    seeds = [dl.sampler.seed for dl in loop.train_dl.loaders]
    assert len(set(seeds)) == 3, seeds
    assert all(dl.sampler.epoch == 1 for dl in loop.train_dl.loaders)
    assert all(dl.sampler.epoch == 1 for dl in loop.val_dl.loaders)

    # --- Grad accumulation 2: the wrapped optimizer applied every 2nd
    # mini-step (12 mini-steps -> 6 updates).
    assert int(loop.state.opt_state.gradient_step) == 6
    assert int(loop.state.opt_state.mini_step) == 0

    # --- Learned K + depth metrics flowed into the scalar stream, finite.
    tags = {t for t, _, _ in writer.logged}
    assert any('fx' in t for t in tags), 'learn_K summaries missing'
    assert any('AbsRel' in t for t in tags), 'depth-GT train metrics missing'
    assert any(t.startswith('val_') for t in tags), 'val epoch missing'
    assert all(np.isfinite(v) for _, v, _ in writer.logged)

    # --- Checkpoints + markers; the last ckpt resumes.
    assert (ckpt_dir / 'finished').is_file()
    state, meta = load_checkpoint(ckpt_dir / 'last')
    assert meta['epoch'] == 1
    assert meta['cfg']['trainer']['accumulate_grad_batches'] == 2
    assert (ckpt_dir / 'best').is_dir()
