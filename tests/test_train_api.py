"""api/train/train.py writer factory: wandb adapter (ref `api/train/train.py:46-49`).

Round 1 shipped a wandb branch that raised ValueError whenever wandb *was*
importable; these tests pin the fixed behavior with a stubbed wandb module.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _load_train_module():
    spec = importlib.util.spec_from_file_location(
        'api_train_train', REPO / 'api' / 'train' / 'train.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _StubWandb:
    """Minimal wandb API surface: init/log/Image/finish."""

    def __init__(self):
        self.logged = []
        self.inited = None
        self.finished = False

    def init(self, **kw):
        self.inited = kw
        return self

    def log(self, data, step=None):
        self.logged.append((dict(data), step))

    class Image:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    def finish(self):
        self.finished = True


@pytest.fixture
def stub_wandb(monkeypatch):
    stub = _StubWandb()
    mod = types.ModuleType('wandb')
    for name in ('init', 'log', 'Image', 'finish'):
        setattr(mod, name, getattr(stub, name))
    monkeypatch.setitem(sys.modules, 'wandb', mod)
    return stub


class TestWandbWriter:
    def test_make_writer_returns_adapter(self, stub_wandb, tmp_path):
        train = _load_train_module()
        w = train.make_writer('wandb', tmp_path / 'logs', name='kbr_000')
        assert isinstance(w, train.WandbWriter)
        assert stub_wandb.inited['name'] == 'kbr_000'

        w.add_scalar('train_losses/loss', 0.5, 3)
        w.add_text('train_errors', 'none', 3)
        w.add_images('train_images', np.zeros((2, 3, 4, 4), np.float32), 3)
        w.close()

        assert ({'train_losses/loss': 0.5}, 3) in stub_wandb.logged
        assert ({'train_errors': 'none'}, 3) in stub_wandb.logged
        imgs = [d for d, s in stub_wandb.logged if 'train_images' in d][0]
        assert len(imgs['train_images']) == 2
        assert imgs['train_images'][0].arr.shape == (4, 4, 3)  # NCHW -> HWC
        assert stub_wandb.finished

    def test_drives_loop_log(self, stub_wandb, tmp_path):
        """The adapter satisfies the writer contract of MonoDepthLoop._log."""
        from slowtv_monodepth_tpu.core import MonoDepthLoop

        train = _load_train_module()
        loop = MonoDepthLoop.__new__(MonoDepthLoop)
        loop.writer = train.make_writer('wandb', tmp_path / 'logs')
        loop.global_step = 7
        loop._log('train', {'loss': 0.25, 'loss_img_recon': 0.2}, {})

        tags = {k for d, s in stub_wandb.logged for k in d}
        assert 'train_losses/loss' in tags
        assert 'train_losses/img_recon' in tags
        assert all(s == 7 for _, s in stub_wandb.logged)

    def test_missing_wandb_falls_back_to_tensorboard(self, monkeypatch, tmp_path):
        monkeypatch.setitem(sys.modules, 'wandb', None)  # import -> ImportError
        train = _load_train_module()
        w = train.make_writer('wandb', tmp_path / 'logs')
        assert type(w).__name__ == 'SummaryWriter'

    def test_unknown_kind_raises(self, tmp_path):
        train = _load_train_module()
        with pytest.raises(ValueError, match='not supported'):
            train.make_writer('csv', tmp_path)
