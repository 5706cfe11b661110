"""End-to-end training loop: synthetic SlowTV-style data -> fit -> ckpt -> resume."""
import numpy as np
import pytest
from PIL import Image

from slowtv_monodepth_tpu import paths
from slowtv_monodepth_tpu.core import MonoDepthLoop, load_checkpoint
from slowtv_monodepth_tpu.core.checkpoint import save_checkpoint


@pytest.fixture
def slowtv_root(tmp_path):
    root = tmp_path / 'slow_tv'
    seq = '00001'
    for stem in range(12):
        p = root / seq / f'{stem:010}.png'
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.random.default_rng(stem).integers(
            0, 255, (48, 64, 3), dtype=np.uint8)).save(p)
    np.savetxt(root / seq / 'intrinsics.txt',
               np.array([[600, 0, 640, 0], [0, 600, 360, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1.0]]))
    (root / 'splits' / 'all').mkdir(parents=True)
    (root / 'splits' / 'all' / 'train_files.txt').write_text(
        '\n'.join(f'{seq} {i}' for i in range(2, 6)))
    (root / 'splits' / 'all' / 'val_files.txt').write_text(
        '\n'.join(f'{seq} {i}' for i in range(6, 8)))
    (root / 'splits' / 'categories.txt').write_text('natural-hiking\n')
    paths.DATA_PATHS['slow_tv'] = root
    yield root
    paths.DATA_PATHS.pop('slow_tv', None)


def make_cfg():
    return {
        'net': {
            'depth': {'enc_name': 'resnet18', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1]},
            'pose': {'enc_name': 'resnet18', 'pretrained': False, 'learn_K': True},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'dataset': {
            'slow_tv': {
                'split': 'all', 'datum': 'image support K', 'supp_idxs': [-1, 1],
                'train': {'mode': 'train', 'use_aug': True, 'shape': [32, 64]},
                'val': {'mode': 'val', 'use_aug': False, 'shape': [32, 64]},
            },
        },
        'loader': {'batch_size': 2, 'drop_last': True, 'num_workers': 0,
                   'train': {'shuffle': True}, 'val': {'shuffle': False}},
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'scheduler': {'linear': {'start_factor': 0.5, 'total_iters': 2}},
        'trainer': {'max_epochs': 2, 'min_depth': 0.1, 'max_depth': 100,
                    'always_fwd_pose': False, 'monitor': 'loss',
                    'log_every_n_steps': 1, 'accumulate_grad_batches': 1},
    }


class _Writer:
    def __init__(self):
        self.logged = []

    def add_scalar(self, tag, val, step):
        self.logged.append((tag, val, step))


class TestLoop:
    def test_fit_checkpoints_and_markers(self, slowtv_root, tmp_path):
        ckpt_dir = tmp_path / 'run'
        writer = _Writer()
        loop = MonoDepthLoop(make_cfg(), ckpt_dir, writer=writer)
        loop.fit()

        assert (ckpt_dir / 'last').is_dir()
        assert (ckpt_dir / 'best').is_dir()
        assert (ckpt_dir / 'finished').is_file()
        assert not list(ckpt_dir.glob('training_*'))
        assert any(t.startswith('train_losses/') for t, _, _ in writer.logged)
        assert any(t.startswith('val_') for t, _, _ in writer.logged)

        state, meta = load_checkpoint(ckpt_dir / 'last')
        assert meta['epoch'] == 1
        assert meta['cfg']['net']['depth']['enc_name'] == 'resnet18'
        assert int(state.step) == 4  # 2 epochs x 2 steps.

    def test_refuses_double_run(self, slowtv_root, tmp_path):
        ckpt_dir = tmp_path / 'run'
        ckpt_dir.mkdir()
        (ckpt_dir / 'finished').touch()
        with pytest.raises(ValueError, match='finished'):
            MonoDepthLoop(make_cfg(), ckpt_dir)

    def test_resume_skips_epochs(self, slowtv_root, tmp_path):
        ckpt_dir = tmp_path / 'run'
        cfg = make_cfg()
        cfg['trainer']['max_epochs'] = 1
        loop = MonoDepthLoop(cfg, ckpt_dir)
        loop.fit()
        assert int(loop.state.step) == 2

        # Second run with more epochs resumes from epoch 1.
        (ckpt_dir / 'finished').unlink()
        cfg2 = make_cfg()
        cfg2['trainer']['max_epochs'] = 2
        loop2 = MonoDepthLoop(cfg2, ckpt_dir)
        loop2.fit()
        assert loop2.start_epoch == 1
        assert int(loop2.state.step) == 4


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from slowtv_monodepth_tpu.core import MonoDepthTrainer
        from slowtv_monodepth_tpu import parsers
        cfg = make_cfg()
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        x = {'imgs': jnp.zeros((1, 32, 64, 3))}
        state = trainer.init_state(jax.random.PRNGKey(0), x, (-1, 1), tx)

        save_checkpoint(tmp_path / 'ck', state, cfg, epoch=3, monitor=1.5)
        state2, meta = load_checkpoint(tmp_path / 'ck', state)
        assert meta['epoch'] == 3 and meta['monitor'] == 1.5
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(state2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_async_save_is_donation_safe(self, tmp_path):
        """An async save must snapshot the state BEFORE later (donating) train
        steps invalidate its buffers: clobber the live params with a donated
        jit update right after submitting, then check the written checkpoint
        holds the pre-update values."""
        import jax
        import jax.numpy as jnp
        from slowtv_monodepth_tpu.core import MonoDepthTrainer
        from slowtv_monodepth_tpu.core.checkpoint import AsyncSaver
        from slowtv_monodepth_tpu import parsers
        cfg = make_cfg()
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        x = {'imgs': jnp.zeros((1, 32, 64, 3))}
        state = trainer.init_state(jax.random.PRNGKey(0), x, (-1, 1), tx)
        before = [np.asarray(v) for v in jax.tree_util.tree_leaves(state.params)]

        saver = AsyncSaver()
        save_checkpoint(tmp_path / 'ck', state, cfg, epoch=1, saver=saver)
        bump = jax.jit(
            lambda t: jax.tree_util.tree_map(lambda v: v + 1.0, t),
            donate_argnums=0)
        _ = bump(state.params)  # Donates (invalidates) the live buffers.
        saver.wait()

        tree = load_checkpoint(tmp_path / 'ck')[0]
        after = [np.asarray(v) for v in jax.tree_util.tree_leaves(tree.params)]
        assert len(before) == len(after)
        for a, b in zip(before, after):
            np.testing.assert_array_equal(a, b)

    def test_async_manager_orders_saves_and_finalizes(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from slowtv_monodepth_tpu.core import MonoDepthTrainer
        from slowtv_monodepth_tpu.core.checkpoint import CheckpointManager
        from slowtv_monodepth_tpu import parsers
        cfg = make_cfg()
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        x = {'imgs': jnp.zeros((1, 32, 64, 3))}
        state = trainer.init_state(jax.random.PRNGKey(0), x, (-1, 1), tx)

        mgr = CheckpointManager(tmp_path, monitor='loss', async_save=True)
        mgr.step(state, cfg, epoch=0, metrics={'loss': 2.0})  # last + best
        mgr.step(state, cfg, epoch=1, metrics={'loss': 1.0})  # improves best
        mgr.finalize()
        for name, epoch in (('last', 1), ('best', 1)):
            st, meta = load_checkpoint(tmp_path / name, state)
            assert meta['epoch'] == epoch, name
        assert mgr.best == 1.0

    def test_async_saver_error_surfaces_on_wait(self):
        from slowtv_monodepth_tpu.core.checkpoint import AsyncSaver
        saver = AsyncSaver()
        saver.submit(lambda: (_ for _ in ()).throw(RuntimeError('disk full')))
        with pytest.raises(RuntimeError, match='disk full'):
            saver.wait()
        saver.wait()  # The error is consumed; the saver is reusable.


class TestCallbacks:
    def test_early_stopping(self, slowtv_root, tmp_path):
        """Loop stops once the monitor stops improving for `patience` epochs."""
        cfg = make_cfg()
        cfg['trainer'].update({'max_epochs': 6, 'early_stopping': 1,
                               'monitor': 'loss'})
        loop = MonoDepthLoop(cfg, tmp_path / 'run')
        # Force non-improvement: pretend the monitor is constant.
        orig = loop.val_epoch
        loop.val_epoch = lambda epoch: {'loss': 1.0}
        loop.fit()
        assert loop._es_bad_epochs >= 1
        assert int(loop.state.step) < 6 * 2  # Stopped before max_epochs.

    def test_swa_checkpoint(self, slowtv_root, tmp_path):
        cfg = make_cfg()
        cfg['trainer'].update({'max_epochs': 2, 'swa': True})
        loop = MonoDepthLoop(cfg, tmp_path / 'run')
        loop.fit()
        assert (tmp_path / 'run' / 'swa').is_dir()


def test_fit_with_conv_hostile_native_shape(slowtv_root, tmp_path):
    """SlowTV-style training where the NATIVE dataset shape is not a
    multiple of 32 (like real 720x1280): only the AR-aug's mult-of-32
    buckets may ever reach the nets — including at init (regression:
    init_state used to trace on the raw shape and crash the decoder's skip
    concat)."""
    cfg = make_cfg()
    cfg['dataset']['slow_tv']['train']['shape'] = [40, 72]
    cfg['trainer']['aspect_ratio_aug_prob'] = 1.0
    cfg['trainer']['aspect_ratio_ref_shape'] = [32, 64]
    cfg['trainer']['max_epochs'] = 1
    loop = MonoDepthLoop(cfg, tmp_path / 'run_hostile', writer=_Writer())
    loop.fit()
    assert (tmp_path / 'run_hostile' / 'finished').is_file()


def test_precompile_buckets(slowtv_root, tmp_path):
    """trainer.precompile_buckets AOT-compiles every AR-aug bucket upfront."""
    cfg = make_cfg()
    cfg['trainer']['aspect_ratio_aug_prob'] = 1.0
    cfg['trainer']['aspect_ratio_ref_shape'] = [32, 64]
    cfg['trainer']['precompile_buckets'] = True
    cfg['trainer']['max_epochs'] = 1
    loop = MonoDepthLoop(cfg, tmp_path / 'run_pc', writer=_Writer())
    loop.fit()
    assert (tmp_path / 'run_pc' / 'finished').is_file()
