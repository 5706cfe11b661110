"""PackDB storage layer + pack-backed dataset tests."""
import io
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from slowtv_monodepth_tpu import paths
from slowtv_monodepth_tpu.databases import (
    ArrayDatabase, ImageDatabase, LabelDatabase, PackReader, PackWriter,
    native_available, write_array_database, write_image_database,
    write_label_database,
)


class TestPackFormat:
    def test_roundtrip_and_meta(self, tmp_path):
        f = tmp_path / 't.pack'
        with PackWriter(f, meta={'kind': 'test'}) as w:
            for i in range(100):
                w.put(f'key/{i:03}', bytes([i]) * (i + 1))
        r = PackReader(str(f), use_native=False)
        assert len(r) == 100
        assert r.get('key/042') == b'\x2a' * 43
        assert r.meta['kind'] == 'test'
        with pytest.raises(KeyError):
            r.get('nope')

    @pytest.mark.skipif(not native_available(), reason='native lib not built')
    def test_native_matches_python(self, tmp_path):
        f = tmp_path / 't.pack'
        rng = np.random.default_rng(0)
        blobs = {f'k{i}': rng.bytes(rng.integers(1, 200)) for i in range(500)}
        with PackWriter(f) as w:
            for k, v in blobs.items():
                w.put(k, v)
        py = PackReader(str(f), use_native=False)
        nat = PackReader(str(f), use_native=True)
        assert len(py) == len(nat) == 500
        assert sorted(py.keys) == sorted(nat.keys)
        for k, v in blobs.items():
            assert py.get(k) == nat.get(k) == v
        with pytest.raises(KeyError):
            nat.get('missing')


class TestTypedDatabases:
    def test_image_label_array(self, tmp_path):
        img = Image.fromarray(np.random.randint(0, 255, (8, 12, 3), dtype=np.uint8))
        b = io.BytesIO()
        img.save(b, 'PNG')
        write_image_database({'x': b.getvalue()}, tmp_path / 'imgs')
        db = ImageDatabase(tmp_path / 'imgs')
        assert db['x'].shape == (8, 12, 3)
        assert 0 <= db['x'].min() and db['x'].max() <= 1
        assert db.pil('x').size == (12, 8)

        write_label_database({'a': {'n': 1}}, tmp_path / 'labels')
        assert LabelDatabase(tmp_path / 'labels')['a'] == {'n': 1}

        arr = np.arange(6.0).reshape(2, 3)
        write_array_database({'z': arr}, tmp_path / 'arrs')
        np.testing.assert_array_equal(ArrayDatabase(tmp_path / 'arrs')['z'], arr)

    def test_batch_get(self, tmp_path):
        write_label_database({'a': 1, 'b': 2}, tmp_path / 'db')
        db = LabelDatabase(tmp_path / 'db')
        assert db[['a', 'b']] == [1, 2]
        assert db.index(0)[0] in ('a', 'b')


@pytest.fixture
def slowtv_pack_root(tmp_path):
    """Raw slow_tv tree -> pack store via the builder script."""
    raw = tmp_path / 'slow_tv'
    seq = '00001'
    for stem in range(8):
        p = raw / seq / f'{stem:010}.png'
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.full((16, 24, 3), stem * 20, np.uint8)).save(p)
    np.savetxt(raw / seq / 'intrinsics.txt',
               np.array([[600, 0, 640, 0], [0, 600, 360, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1.0]]))
    (raw / 'splits' / 'all').mkdir(parents=True)
    (raw / 'splits' / 'all' / 'train_files.txt').write_text(
        '\n'.join(f'{seq} {i}' for i in range(2, 6)))
    (raw / 'splits' / 'categories.txt').write_text('natural-x\n')
    paths.DATA_PATHS['slow_tv'] = raw

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / 'api' / 'data' / 'pack'))
    import build as pack_build
    out = tmp_path / 'slow_tv_lmdb'
    pack_build.build_slow_tv(out)
    paths.DATA_PATHS['slow_tv_lmdb'] = out
    yield out
    paths.DATA_PATHS.pop('slow_tv', None)
    paths.DATA_PATHS.pop('slow_tv_lmdb', None)


class TestPackDataset:
    def test_pack_matches_files(self, slowtv_pack_root):
        from slowtv_monodepth_tpu.data import SlowTvDataset
        from slowtv_monodepth_tpu.data.slow_tv_pack import SlowTvPackDataset
        kw = dict(split='all', mode='train', shape=(16, 24),
                  datum='image support K', supp_idxs=[-1, 1],
                  use_aug=False, log_time=False)
        ds_file = SlowTvDataset(**kw)
        ds_pack = SlowTvPackDataset(**kw)
        assert len(ds_file) == len(ds_pack)
        xf, yf, _ = ds_file[0]
        xp, yp, _ = ds_pack[0]
        np.testing.assert_allclose(xf['imgs'], xp['imgs'], atol=1e-6)
        np.testing.assert_allclose(yf['K'], yp['K'], atol=1e-5)

    def test_pack_missing_support_retries(self, slowtv_pack_root):
        from slowtv_monodepth_tpu.data.slow_tv_pack import SlowTvPackDataset
        ds = SlowTvPackDataset(split='all', mode='train', shape=(16, 24),
                               datum='image support K', supp_idxs=[-1, 3],
                               use_aug=False, log_time=False)
        x, y, m = ds[3]  # stem 5 + 3 = 8: missing -> retry.
        assert m['errors'] != ''
