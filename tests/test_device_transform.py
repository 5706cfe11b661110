"""Device-side x derivation (`device_transform`): parity with the host path.

A dataset with `device_transform: true` ships only the raw `y` images plus
the sampled photo-jiggle parameters; `core/device_transform.derive_x`
recreates the standardized `x` on device. These tests pin the device replay
against the host numpy pipeline (identical seeds -> identical augment draws).
"""
import random

import jax
import numpy as np
import pytest

from slowtv_monodepth_tpu import paths
from slowtv_monodepth_tpu.core.device_transform import derive_x, needs_derive
from slowtv_monodepth_tpu.data import SlowTvDataset
from slowtv_monodepth_tpu.data.augment import PHOTO_OP_IDS, ColorJiggle
from slowtv_monodepth_tpu.data.base_mde import IMAGENET_MEAN, IMAGENET_STD

RNG = np.random.default_rng(7)


@pytest.fixture
def slowtv_root(tmp_path):
    from PIL import Image
    root = tmp_path / 'slow_tv'
    seq = '00001'
    for stem in range(5):
        p = root / seq / f'{stem:010}.png'
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.random.default_rng(stem).integers(
            0, 255, (48, 64, 3), dtype=np.uint8)).save(p)
    np.savetxt(root / seq / 'intrinsics.txt',
               np.array([[600, 0, 640, 0], [0, 600, 360, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1.0]]))
    splits = root / 'splits'
    (splits / 'all').mkdir(parents=True)
    (splits / 'all' / 'train_files.txt').write_text(f'{seq} 1\n{seq} 2\n{seq} 3\n')
    (splits / 'categories.txt').write_text('natural-hiking\n')
    paths.DATA_PATHS['slow_tv'] = root
    yield root
    paths.DATA_PATHS.pop('slow_tv', None)


def test_jiggle_replay_matches_host():
    """The jnp op twins replay a sampled (order, factors) sequence to the
    host numpy values."""
    imgs = RNG.random((3, 16, 24, 3), dtype=np.float32)
    for seed in range(6):
        jig = ColorJiggle(rng=random.Random(seed))
        ops = jig.sample()
        want = ColorJiggle.apply(imgs, ops)

        x = {'photo_order': np.array([[PHOTO_OP_IDS[f] for f, _ in ops]], np.int32),
             'photo_factors': np.array([[v for _, v in ops]], np.float32),
             'photo_on': np.array([True])}
        y = {'imgs': imgs[None, 0], 'supp_imgs': imgs[1:, None]}
        got = derive_x(x, y)
        got_raw = np.concatenate(
            [np.asarray(got['imgs'])[None],
             np.asarray(got['supp_imgs'])[:, 0][:, None]], 0)[:, 0]
        want_std = (want - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(got_raw, want_std, atol=2e-5, rtol=1e-5,
                                   err_msg=f'seed={seed}')


def _batch(ds, items, seed):
    out = []
    for k, it in enumerate(items):
        random.seed(seed + k)  # Aligns flip/photo draws across the two modes.
        out.append(ds[it])
    return ds.collate_fn(out)


@pytest.mark.parametrize('use_aug', [True, False])
def test_dataset_device_transform_parity(slowtv_root, use_aug):
    kw = dict(split='all', mode='train', datum='image support K',
              supp_idxs=[-1, 1], shape=(48, 64), use_aug=use_aug,
              randomize=False)
    host = SlowTvDataset(**kw)
    dev = SlowTvDataset(device_transform=True, **kw)

    xh, yh, _ = _batch(host, [0, 1, 2], seed=123)
    xd, yd, _ = _batch(dev, [0, 1, 2], seed=123)

    assert 'imgs' not in xd and needs_derive(xd)
    np.testing.assert_array_equal(yh['imgs'], yd['imgs'])
    np.testing.assert_array_equal(yh['supp_imgs'], yd['supp_imgs'])

    xd = jax.device_put(xd)
    got = derive_x(xd, jax.device_put({'imgs': yd['imgs'],
                                       'supp_imgs': yd['supp_imgs']}))
    assert 'photo_order' not in got
    np.testing.assert_allclose(np.asarray(got['imgs']), xh['imgs'],
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got['supp_imgs']), xh['supp_imgs'],
                               atol=2e-5, rtol=1e-5)


def test_transfer_uint8_exact_at_native_resolution(slowtv_root):
    """With no resize, uint8 shipping roundtrips y to within 1 ulp (XLA
    lowers /255 to a reciprocal multiply) and the derived x matches host."""
    from slowtv_monodepth_tpu.core.device_transform import derive_batch

    kw = dict(split='all', mode='train', datum='image support K',
              supp_idxs=[-1, 1], shape=(48, 64), use_aug=True,
              randomize=False)
    host = SlowTvDataset(**kw)
    dev = SlowTvDataset(device_transform=True, transfer_uint8=True, **kw)

    xh, yh, _ = _batch(host, [0, 1, 2], seed=321)
    xd, yd, _ = _batch(dev, [0, 1, 2], seed=321)
    assert yd['imgs'].dtype == np.uint8 and yd['supp_imgs'].dtype == np.uint8

    xd.pop('supp_idxs')
    (got_x, got_y) = derive_batch(jax.device_put(xd), jax.device_put(
        {'imgs': yd['imgs'], 'supp_imgs': yd['supp_imgs'], 'K': yd['K']}))
    np.testing.assert_allclose(np.asarray(got_y['imgs']), yh['imgs'],
                               rtol=2e-7)
    np.testing.assert_allclose(np.asarray(got_y['supp_imgs']),
                               yh['supp_imgs'], rtol=2e-7)
    np.testing.assert_array_equal(np.asarray(got_y['K']), yh['K'])
    np.testing.assert_allclose(np.asarray(got_x['imgs']), xh['imgs'],
                               atol=2e-5, rtol=1e-5)

    with pytest.raises(ValueError):
        SlowTvDataset(transfer_uint8=True, **kw)  # Requires device_transform.


def test_transfer_uint8_bit_identical_under_resize(slowtv_root):
    """PIL resizes interpolate in uint8 BEFORE the f32 conversion, so the
    uint8-native path equals the f32 path exactly even with a resize."""
    kw = dict(split='all', mode='train', datum='image support K',
              supp_idxs=[-1, 1], shape=(32, 48), use_aug=False,
              randomize=False)
    f32 = SlowTvDataset(device_transform=True, **kw)
    u8 = SlowTvDataset(device_transform=True, transfer_uint8=True, **kw)
    _, yf, _ = f32[0]
    _, yu, _ = u8[0]
    assert yu['imgs'].dtype == np.uint8
    np.testing.assert_array_equal(
        yu['imgs'].astype(np.float32) / 255, yf['imgs'])
    np.testing.assert_array_equal(
        yu['supp_imgs'].astype(np.float32) / 255, yf['supp_imgs'])


def test_loop_derives_before_ar_aug(slowtv_root):
    """`MonoDepthLoop._place` recreates x on device for a shipped batch."""
    from slowtv_monodepth_tpu.core.loop import MonoDepthLoop

    cfg = {
        'net': {'depth': {'enc_name': 'resnet18', 'pretrained': False,
                          'out_scales': [0, 1]},
                'pose': {'enc_name': 'resnet18', 'pretrained': False}},
        'loss': {'img_recon': {'weight': 1}},
        'dataset': {'slow_tv': {
            'split': 'all', 'datum': 'image support K', 'supp_idxs': [-1, 1],
            'device_transform': True, 'randomize': False,
            'train': {'mode': 'train', 'use_aug': True, 'shape': [48, 64]},
        }},
        'loader': {'batch_size': 2, 'num_workers': 0},
        'optimizer': {'type': 'adam', 'lr': 1e-4},
        'trainer': {'max_epochs': 1},
    }
    loop = MonoDepthLoop.__new__(MonoDepthLoop)
    loop.mesh = None

    ds = SlowTvDataset(split='all', mode='train', datum='image support K',
                       supp_idxs=[-1, 1], shape=(48, 64), use_aug=True,
                       randomize=False, device_transform=True)
    x, y, m = ds.collate_fn([ds[0], ds[1]])
    xb, yb = loop._place(x, y)
    assert 'imgs' in xb and xb['imgs'].shape == yb['imgs'].shape
    assert 'photo_order' not in xb
    # Standardized: mean far from the raw [0, 1] band.
    assert float(np.asarray(xb['imgs']).mean()) < 0.45
    del cfg
