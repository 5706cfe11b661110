"""Data pipeline tests: synthetic on-disk fixtures per dataset + loader logic."""
import numpy as np
import pytest
from PIL import Image

from slowtv_monodepth_tpu import paths
from slowtv_monodepth_tpu.data import (
    ColorJiggle, ConcatDataLoader, DataLoader, KittiRawDataset, MannequinDataset,
    ShardedSampler, SlowTvDataset, SynsPatchesDataset,
)


def _write_img(path, shape=(48, 64), seed=0):
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, shape + (3,), dtype=np.uint8)).save(path)


@pytest.fixture
def kitti_root(tmp_path):
    """Minimal kitti_raw_sync tree: 1 drive, 4 frames, both cams, calib, depth."""
    root = tmp_path / 'kitti_raw_sync'
    seq = '2011_09_26/2011_09_26_drive_0001_sync'
    for cam in ('image_02', 'image_03'):
        for stem in range(4):
            _write_img(root / seq / cam / 'data' / f'{stem:010d}.png', seed=stem)
    for stem in range(4):
        f = root / 'depth_benchmark' / seq / 'proj_depth' / 'groundtruth' / 'image_02' / f'{stem:010d}.png'
        f.parent.mkdir(parents=True, exist_ok=True)
        depth = (np.random.default_rng(stem).random((48, 64)) * 50 * 256).astype(np.uint16)
        Image.fromarray(depth, mode='I;16').save(f)
    split = root / 'splits' / 'tiny'
    split.mkdir(parents=True)
    (split / 'train_files.txt').write_text(
        f'{seq} 1 l\n{seq} 2 l\n')
    paths.DATA_PATHS['kitti_raw'] = root
    yield root
    paths.DATA_PATHS.pop('kitti_raw', None)


@pytest.fixture
def slowtv_root(tmp_path):
    root = tmp_path / 'slow_tv'
    seq = '00001'
    for stem in range(5):
        _write_img(root / seq / f'{stem:010}.png', seed=stem)
    np.savetxt(root / seq / 'intrinsics.txt',
               np.array([[600, 0, 640, 0], [0, 600, 360, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]]))
    splits = root / 'splits'
    (splits / 'all').mkdir(parents=True)
    (splits / 'all' / 'train_files.txt').write_text(f'{seq} 1\n{seq} 2\n{seq} 3\n')
    (splits / 'categories.txt').write_text('natural-hiking\n')
    (splits / 'urls.txt').write_text('http://example.com\n')
    paths.DATA_PATHS['slow_tv'] = root
    yield root
    paths.DATA_PATHS.pop('slow_tv', None)


@pytest.fixture
def mannequin_root(tmp_path):
    root = tmp_path / 'MannequinChallenge'
    seq = 'seqA'
    n = 4
    for stem in range(n):
        _write_img(root / 'train' / seq / f'{stem:05}.jpg', seed=stem)
        np.save(root / 'train' / seq / f'{stem:05}.npy',
                1 + np.random.default_rng(stem).random((48, 64)).astype(np.float32))
    lines = [f'{n} 0']
    for i in range(n):
        lines += ['0 48 0 64', '0.9 1.6 0.5 0.5',
                  '1 0 0', '0 1 0', '0 0 1', '0 0 0']
    (root / 'train' / seq / 'calibration.txt').write_text('\n'.join(lines) + '\n')
    (root / 'splits').mkdir(parents=True)
    (root / 'splits' / 'train_files.txt').write_text(
        '\n'.join(f'{seq} {i:05}' for i in range(1, 3)) + '\n')
    paths.DATA_PATHS['mannequin'] = root
    yield root
    paths.DATA_PATHS.pop('mannequin', None)


@pytest.fixture
def syns_root(tmp_path):
    root = tmp_path / 'syns_patches'
    scene = '01'
    for stem in ('00.png', '01.png'):
        _write_img(root / scene / 'images' / stem, seed=1)
        (root / scene / 'depths').mkdir(parents=True, exist_ok=True)
        np.save(root / scene / 'depths' / stem.replace('.png', '.npy'),
                1 + np.random.default_rng(0).random((48, 64)).astype(np.float32))
        edges = np.zeros((48, 64), np.uint8)
        edges[20] = 255
        (root / scene / 'edges').mkdir(parents=True, exist_ok=True)
        Image.fromarray(edges).save(root / scene / 'edges' / stem)
    (root / scene / 'info.txt').write_text('Scene 01\nScene Category: Outdoor: Park\n')
    (root / 'splits').mkdir(parents=True)
    (root / 'splits' / 'test_files.txt').write_text(f'{scene} 00.png\n{scene} 01.png\n')
    paths.DATA_PATHS['syns_patches'] = root
    yield root
    paths.DATA_PATHS.pop('syns_patches', None)


class TestKitti:
    def test_item_and_collate(self, kitti_root):
        ds = KittiRawDataset(split='tiny', mode='train', shape=(32, 64),
                             datum='image support depth K', supp_idxs=[-1, 1, 0],
                             use_aug=False, log_time=False)
        x, y, m = ds[0]
        assert x['imgs'].shape == (32, 64, 3)
        assert x['supp_imgs'].shape == (3, 32, 64, 3)
        assert y['depth'].shape == (376, 1242, 1)  # GT kept at SHAPE.
        assert y['K'].shape == (4, 4)
        assert y['T_stereo'][0, 3] == pytest.approx(-0.1)  # image_02 -> -1 sign.
        # Standardization applied to x only.
        assert x['imgs'].min() < 0 <= y['imgs'].min()

        xb, yb, mb = ds.collate_fn([ds[0], ds[1]])
        assert xb['imgs'].shape == (2, 32, 64, 3)
        assert xb['supp_imgs'].shape == (3, 2, 32, 64, 3)
        assert (xb['supp_idxs'] == np.array([-1, 1, 0])).all()

    def test_missing_support_retries(self, kitti_root):
        """Item 1 (stem 2) has no stem 3+2 -> SuppImageNotFoundError -> retry."""
        ds = KittiRawDataset(split='tiny', mode='train', shape=(32, 64),
                             datum='image support K', supp_idxs=[-1, 2],
                             use_aug=False, log_time=False)
        x, y, m = ds[1]  # stem 2 + offset 2 = stem 4: missing.
        assert m['errors'] != ''
        assert x['imgs'].shape == (32, 64, 3)

    def test_flip_aug_flips_stereo_sign(self, kitti_root):
        ds = KittiRawDataset(split='tiny', mode='train', shape=(32, 64),
                             datum='image support K', supp_idxs=[0],
                             use_aug=True, augmentations={'flip': 1.0, 'photo': 0.0},
                             log_time=False)
        x, y, m = ds[0]
        assert '[FlipLR]' in m['augs']
        assert y['T_stereo'][0, 3] == pytest.approx(0.1)  # Sign flipped.

    def test_rejects_double_depth(self, kitti_root):
        with pytest.raises(ValueError, match='one source of depth'):
            KittiRawDataset(split='tiny', mode='train', shape=(32, 64),
                            datum='image depth depth_velo K', log_time=False)


class TestSlowTv:
    def test_item(self, slowtv_root):
        ds = SlowTvDataset(split='all', mode='train', shape=(32, 64),
                           datum='image support K', supp_idxs=[-1, 1],
                           use_aug=False, log_time=False)
        x, y, m = ds[0]
        assert x['supp_imgs'].shape == (2, 32, 64, 3)
        # K resized from 720x1280 to 32x64.
        assert y['K'][0, 0] == pytest.approx(600 * 64 / 1280)

    def test_randomized_supp_scale(self, slowtv_root):
        ds = SlowTvDataset(split='all', mode='train', shape=(32, 64),
                           datum='image support K', supp_idxs=[-1, 1],
                           randomize_supp=True, use_aug=False, log_time=False)
        ks = {ds.get_supp_scale(ds.items_data[0]) for _ in range(50)}
        assert ks <= {1, 2, 3, 4, 5} and len(ks) > 1  # natural: max offset 5.

    def test_rejects_stereo(self, slowtv_root):
        with pytest.raises(ValueError, match='stereo'):
            SlowTvDataset(split='all', mode='train', shape=(32, 64),
                          datum='image support K', supp_idxs=[0], log_time=False)


class TestMannequin:
    def test_item(self, mannequin_root):
        ds = MannequinDataset(mode='train', shape=(32, 64),
                              datum='image support depth K', supp_idxs=[-1, 1],
                              use_aug=False, log_time=False)
        x, y, m = ds[0]
        assert y['depth'].shape == (32, 64, 1)
        assert np.isfinite(y['K']).all()


class TestSyns:
    def test_item(self, syns_root):
        ds = SynsPatchesDataset(mode='test', shape=(32, 64), log_time=False)
        x, y, m = ds[0]
        assert y['depth'].shape == (32, 64, 1)
        assert y['edges'].dtype == bool
        assert m['cat'] == 'Outdoor'
        assert m['subcat'] == 'Park'

    def test_rejects_aug_and_support(self, syns_root):
        with pytest.raises(ValueError):
            SynsPatchesDataset(mode='test', use_aug=True, log_time=False)
        with pytest.raises(ValueError):
            SynsPatchesDataset(mode='test', supp_idxs=[-1], log_time=False)


def _rng_probe():
    import os
    import random
    import time
    time.sleep(0.3)  # Hold the worker so both workers get one probe.
    return os.getpid(), random.random()


class TestLoader:
    def test_sharded_sampler_disjoint(self):
        samplers = [ShardedSampler(20, shuffle=True, seed=1, shard_id=i, num_shards=4)
                    for i in range(4)]
        idxs = [list(s) for s in samplers]
        assert all(len(i) == 5 for i in idxs)
        assert len(set().union(*map(set, idxs))) == 20

    def test_sampler_epoch_reshuffles(self):
        s = ShardedSampler(20, shuffle=True, seed=1)
        a = list(s)
        s.set_epoch(1)
        b = list(s)
        assert a != b and sorted(a) == sorted(b)

    def test_dataloader_batches(self, slowtv_root):
        ds = SlowTvDataset(split='all', mode='train', shape=(32, 64),
                           datum='image support K', supp_idxs=[-1, 1],
                           use_aug=False, log_time=False)
        dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, drop_last=False)
        batches = list(dl)
        assert len(batches) == len(dl) == 2
        x, y, m = batches[0]
        assert x['imgs'].shape == (2, 32, 64, 3)
        assert x['supp_imgs'].shape == (2, 2, 32, 64, 3)

    def test_dataloader_sync_matches_threaded(self, slowtv_root):
        ds = SlowTvDataset(split='all', mode='train', shape=(32, 64),
                           datum='image support K', supp_idxs=[-1, 1],
                           use_aug=False, log_time=False)
        dl0 = DataLoader(ds, batch_size=3, shuffle=False, num_workers=0, drop_last=False)
        dl4 = DataLoader(ds, batch_size=3, shuffle=False, num_workers=4, drop_last=False)
        b0 = next(iter(dl0))
        b4 = next(iter(dl4))
        np.testing.assert_allclose(b0[0]['imgs'], b4[0]['imgs'])

    def test_dataloader_process_workers_match(self, slowtv_root):
        """`worker_mode='process'` (forked workers inheriting the dataset,
        torch-DataLoader-style) returns the same batches as in-process."""
        ds = SlowTvDataset(split='all', mode='train', shape=(32, 64),
                           datum='image support K', supp_idxs=[-1, 1],
                           use_aug=False, log_time=False)
        dl0 = DataLoader(ds, batch_size=3, shuffle=False, num_workers=0,
                         drop_last=False)
        dlp = DataLoader(ds, batch_size=3, shuffle=False, num_workers=2,
                         drop_last=False, worker_mode='process')
        b0, bp = next(iter(dl0)), next(iter(dlp))
        np.testing.assert_allclose(b0[0]['imgs'], bp[0]['imgs'])
        np.testing.assert_allclose(b0[1]['K'], bp[1]['K'])

    def test_process_workers_rng_decorrelated(self, slowtv_root):
        """Forked workers must NOT inherit identical aug RNG streams: the
        initializer reseeds per worker (torch worker_init equivalent).
        Probes sleep so each worker draws its own first sample."""
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        from slowtv_monodepth_tpu.data import loader as loader_mod

        ctx = mp.get_context('fork')
        with ProcessPoolExecutor(max_workers=2, mp_context=ctx,
                                 initializer=loader_mod._worker_init,
                                 initargs=(ctx.Value('i', 0), 123)) as pool:
            results = [f.result() for f in [pool.submit(_rng_probe),
                                            pool.submit(_rng_probe)]]
        pids = {pid for pid, _ in results}
        draws = [v for _, v in results]
        if len(pids) == 2:  # Both workers exercised: first draws must differ.
            assert draws[0] != draws[1]

    def test_concurrent_process_loaders_keep_own_dataset(self):
        """Two process-mode loaders iterated interleaved (the ConcatDataLoader
        situation) must each serve THEIR dataset: `ProcessPoolExecutor` forks
        workers lazily at submit time, so a single-slot worker global would
        let a late fork in loader A's pool inherit loader B's dataset. The
        registry is keyed per iteration to prevent exactly that."""

        class _IdxDataset:
            def __init__(self, offset):
                self.offset = offset

            def __len__(self):
                return 8

            def __getitem__(self, j):
                return self.offset + j

            @staticmethod
            def collate_fn(items):
                return list(items)

        dla = DataLoader(_IdxDataset(0), batch_size=1, shuffle=False,
                         num_workers=2, prefetch=1, drop_last=False,
                         worker_mode='process')
        dlb = DataLoader(_IdxDataset(1000), batch_size=1, shuffle=False,
                         num_workers=2, prefetch=1, drop_last=False,
                         worker_mode='process')
        got_a, got_b = [], []
        for ba, bb in zip(iter(dla), iter(dlb)):
            got_a += ba
            got_b += bb
        assert got_a == list(range(8))
        assert got_b == list(range(1000, 1008))

    def test_concat_round_robin(self, slowtv_root, mannequin_root):
        ds1 = SlowTvDataset(split='all', mode='train', shape=(32, 64),
                            datum='image K', use_aug=False, log_time=False)
        ds2 = MannequinDataset(mode='train', shape=(16, 32),
                               datum='image K', use_aug=False, log_time=False)
        dl = ConcatDataLoader([
            DataLoader(ds1, batch_size=1, num_workers=0),
            DataLoader(ds2, batch_size=1, num_workers=0),
        ])
        shapes = [b[0]['imgs'].shape[1:3] for b in dl]
        assert len(dl) == len(shapes) == 4
        assert shapes == [(32, 64), (16, 32), (32, 64), (16, 32)]


class TestColorJiggle:
    def test_range_and_shape(self):
        import random
        cj = ColorJiggle(rng=random.Random(0))
        imgs = np.random.default_rng(0).random((3, 16, 16, 3)).astype(np.float32)
        out = cj(imgs)
        assert out.shape == imgs.shape
        assert out.min() >= 0 and out.max() <= 1
        assert not np.allclose(out, imgs)

    def test_identity_factors(self):
        from slowtv_monodepth_tpu.data.augment import (
            adjust_brightness, adjust_contrast, adjust_hue, adjust_saturation)
        img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
        np.testing.assert_allclose(adjust_brightness(img, 1.0), img, atol=1e-6)
        np.testing.assert_allclose(adjust_contrast(img, 1.0), img, atol=1e-6)
        np.testing.assert_allclose(adjust_saturation(img, 1.0), img, atol=1e-6)
        np.testing.assert_allclose(adjust_hue(img, 0.0), img, atol=1e-5)
        np.testing.assert_allclose(adjust_hue(adjust_hue(img, 0.3), -0.3), img, atol=1e-5)


class TestPlayCli:
    """`python -m slowtv_monodepth_tpu.data.play` — the registry-wide
    equivalent of the reference's per-file `__main__` -> `.play()` visual
    smoke blocks (ref `src/datasets/kitti_raw.py:201-207`, SURVEY.md §4)."""

    def _run(self, argv, monkeypatch):
        import slowtv_monodepth_tpu.data.play as play
        monkeypatch.setattr('sys.argv', ['play'] + argv)
        play.main()

    def test_unknown_type_exits_with_listing(self, monkeypatch):
        with pytest.raises(SystemExit, match='nope_ds'):
            self._run(['nope_ds'], monkeypatch)

    def test_plays_registered_dataset_with_kw(self, monkeypatch):
        from slowtv_monodepth_tpu import DATA_REG
        calls = {}

        class _FakeDs:
            def __init__(self, mode, **kw):
                calls['init'] = (mode, kw)

            def __len__(self):
                return 3

            def play(self, fps, skip, reverse):
                calls['play'] = (fps, skip, reverse)

        monkeypatch.setitem(DATA_REG, 'fake_ds', _FakeDs)
        self._run(['fake_ds', '--mode', 'val', '--kw', '{shape: [32, 64]}',
                   '--fps', '2', '--skip', '5', '--reverse'], monkeypatch)
        assert calls['init'] == ('val', {'shape': [32, 64]})
        assert calls['play'] == (2.0, 5, True)
