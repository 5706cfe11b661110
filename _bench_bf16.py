import json, time, os
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.core import MonoDepthTrainer
from slowtv_monodepth_tpu.parallel import make_train_step

B, H, W = 4, 384, 640
for prec in ('bf16',):
    cfg = {
        'net': {'depth': {'enc_name': 'convnext_base', 'pretrained': False,
                          'dec_name': 'monodepth', 'out_scales': (0,1,2,3)},
                'pose': {'enc_name': 'convnext_tiny', 'pretrained': False, 'learn_K': True}},
        'loss': {'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
                 'disp_smooth': {'weight': 0.001, 'use_edges': True}},
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3, 'backbone_lr': 1e-5},
        'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False,
                    'precision': prec},
    }
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (B, H, W, 3))
    supp = jnp.stack([jnp.roll(imgs, 2, 2), jnp.roll(imgs, -2, 2)])
    K = jnp.broadcast_to(jnp.array([[0.58*W,0,0.5*W,0],[0,1.92*H,0.5*H,0],[0,0,1,0],[0,0,0,1.]]), (B,4,4))
    x = {'imgs': imgs, 'supp_imgs': supp}
    y = {'imgs': imgs, 'supp_imgs': supp, 'K': K}
    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(1), x, (-1,1), tx)
    step = make_train_step(trainer, (-1,1), tx, donate=True)
    for i in range(3):
        state, sc = step(state, x, y, jax.random.PRNGKey(i))
    jax.block_until_ready(sc['loss'])
    t0 = time.perf_counter()
    for i in range(10):
        state, sc = step(state, x, y, jax.random.PRNGKey(100+i))
    jax.block_until_ready(sc['loss'])
    dt = time.perf_counter() - t0
    print(json.dumps({'precision': prec, 'imgs_per_sec': round(B*10/dt, 2),
                      'loss': float(sc['loss'])}))
