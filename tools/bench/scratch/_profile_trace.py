"""Capture a jax.profiler trace of the KBR train step on the real chip.

Writes to /tmp/jtrace; we then inspect whatever artifacts appear (perfetto
trace.json.gz has per-op device lanes when the platform supports tracing).
"""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[3]))
import time
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.core import MonoDepthTrainer
from slowtv_monodepth_tpu.parallel import make_train_step

B, H, W = 4, 384, 640
cfg = {
    'net': {
        'depth': {'enc_name': 'convnext_base', 'pretrained': False, 'gelu': 'tanh',
                  'dec_name': 'monodepth', 'out_scales': (0, 1, 2, 3)},
        'pose': {'enc_name': 'convnext_tiny', 'pretrained': False, 'learn_K': True, 'gelu': 'tanh'},
    },
    'loss': {
        'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
        'disp_smooth': {'weight': 0.001, 'use_edges': True},
    },
    'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3,
                  'backbone_lr': 1e-5},
    'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False, 'precision': 'bf16'},
}
supp_idxs = (-1, 1)
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
step = make_train_step(trainer, supp_idxs, tx, donate=False)

for i in range(3):
    state, sc = step(state, x, y, jax.random.PRNGKey(i))
float(sc['loss'])

jax.profiler.start_trace('/tmp/jtrace')
for i in range(3):
    state, sc = step(state, x, y, jax.random.PRNGKey(10 + i))
    float(sc['loss'])
jax.profiler.stop_trace()
print('trace done')
