"""HeavyLogger image logging + make_grid tests."""
import jax
import jax.numpy as jnp
import numpy as np

from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.core import HeavyLogger, MonoDepthTrainer, make_grid


class _Writer:
    def __init__(self):
        self.images = {}
        self.texts = {}

    def add_images(self, tag, v, global_step):
        self.images[tag] = v

    def add_text(self, tag, v, global_step):
        self.texts[tag] = v

    def add_scalar(self, *a, **k):
        pass


def test_make_grid_shapes():
    g = make_grid(np.random.rand(5, 8, 6, 3), n=4, n_cols=2)
    assert g.shape == (1, 3, 16, 12)  # 2x2 grid of 8x6.
    g1 = make_grid(np.random.rand(2, 8, 6, 1))
    assert g1.shape == (1, 3, 8, 12)  # Single-channel replicated to RGB.


def test_heavy_logger_end_to_end():
    cfg = {
        'net': {
            'depth': {'enc_name': 'resnet18', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': (0, 1)},
            'pose': {'enc_name': 'resnet18', 'pretrained': False, 'learn_K': False},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False},
    }
    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer({'optimizer': {'type': 'adamw', 'lr': 1e-4}})

    b, h, w = 2, 32, 64
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))
    supp = jnp.stack([jnp.roll(imgs, 1, 2), jnp.roll(imgs, -1, 2)])
    K = jnp.broadcast_to(jnp.array(
        [[30, 0, 32, 0], [0, 30, 16, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]]), (b, 4, 4))
    x = {'imgs': imgs, 'supp_imgs': supp}
    y = {'imgs': imgs, 'supp_imgs': supp, 'K': K,
         'depth': 1 + 10 * jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 1))}
    m = {'items': ['1', '2'], 'augs': ['[Photo]', ''], 'errors': ['', '']}

    state = trainer.init_state(jax.random.PRNGKey(0), x, (-1, 1), tx)
    writer = _Writer()
    hl = HeavyLogger(n_imgs=4)
    hl.log_step(trainer, state, (x, y, m), (-1, 1), writer, epoch=0, mode='train')

    for tag in ('train_imgs/target', 'train_imgs/supp_-1', 'train_pred/disp',
                'train_loss/warp_-1', 'train_loss/automask', 'train_depth/lidar',
                'train_loss/disp_grad', 'train_pred/feats'):
        assert tag in writer.images, (tag, sorted(writer.images))
        v = writer.images[tag]
        assert v.ndim == 4 and v.shape[1] == 3
        assert np.isfinite(v).all()
    assert 'train_items' in writer.texts
    assert 'train_augs' in writer.texts
