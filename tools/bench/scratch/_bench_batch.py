"""Measure KBR train-step throughput vs per-chip batch size (honest sync)."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[3]))
import os, sys, time
import jax, jax.numpy as jnp

GELU = os.environ.get('GELU', 'exact')

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.core import MonoDepthTrainer
from slowtv_monodepth_tpu.parallel import make_train_step

H, W = 384, 640
cfg = {
    'net': {
        'depth': {'enc_name': 'convnext_base', 'pretrained': False, 'gelu': GELU,
                  'dec_name': 'monodepth', 'out_scales': (0, 1, 2, 3)},
        'pose': {'enc_name': 'convnext_tiny', 'pretrained': False, 'learn_K': True,
                 'gelu': GELU},
    },
    'loss': {
        'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
        'disp_smooth': {'weight': 0.001, 'use_edges': True},
    },
    'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3,
                  'backbone_lr': 1e-5},
    'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False,
                'precision': os.environ.get('PRECISION', '32')},
}
supp_idxs = (-1, 1)

for B in [int(a) for a in sys.argv[1:]] or [4, 8, 16]:
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (B, H, W, 3))
    supp = jnp.stack([jnp.roll(imgs, 2, axis=2), jnp.roll(imgs, -2, axis=2)])
    K = jnp.broadcast_to(jnp.array(
        [[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0],
         [0, 0, 1, 0], [0, 0, 0, 1.0]]), (B, 4, 4))
    x = {'imgs': imgs, 'supp_imgs': supp}
    y = {'imgs': imgs, 'supp_imgs': supp, 'K': K}

    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer(cfg, steps_per_epoch=1000)
    state = trainer.init_state(jax.random.PRNGKey(1), x, supp_idxs, tx)
    step = make_train_step(trainer, supp_idxs, tx, donate=True)

    rngs = [jax.random.PRNGKey(100 + i) for i in range(13)]
    for i in range(3):
        state, sc = step(state, x, y, rngs[i])
    float(sc['loss'])
    t0 = time.perf_counter(); prev = None
    for i in range(10):
        state, sc = step(state, x, y, rngs[3 + i])
        if prev is not None:
            float(prev)
        prev = sc['loss']
    float(prev)
    dt = time.perf_counter() - t0
    print(f'B={B:3d}: {B * 10 / dt:7.2f} imgs/s  ({dt / 10 * 1e3:.1f} ms/step)', flush=True)
