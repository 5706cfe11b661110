"""Break down KBR train-step time: encoder fwd/bwd vs warp+loss on TPU."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[3]))
import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.core import MonoDepthTrainer
from slowtv_monodepth_tpu.core import handlers as h
from slowtv_monodepth_tpu.losses import ReconstructionLoss

B, H, W = 4, 384, 640

def timeit(f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000

key = jax.random.PRNGKey(0)
imgs = jax.random.uniform(key, (B, H, W, 3))
supp = jnp.stack([jnp.roll(imgs, 2, 2), jnp.roll(imgs, -2, 2)])
K = jnp.broadcast_to(jnp.array([[0.58*W,0,0.5*W,0],[0,1.92*H,0.5*H,0],[0,0,1,0],[0,0,0,1.]]), (B,4,4))
Ts = jnp.broadcast_to(jnp.eye(4), (2,B,4,4)).at[:, :, 0, 3].set(0.1)
depths = {s: 5 + jax.random.uniform(key, (B,H,W,1)) for s in range(4)}

crit = ReconstructionLoss(use_min=True, use_automask=True)

@jax.jit
def loss_only(depths, imgs, supp, Ts, K, rng):
    l, ld = h.image_recon(crit, depths, None, imgs, supp, Ts, K, rng=rng)
    return l

@jax.jit
def loss_grad(depths, imgs, supp, Ts, K, rng):
    return jax.grad(lambda d: h.image_recon(crit, d, None, imgs, supp, Ts, K, rng=rng)[0])(depths)

rng = jax.random.PRNGKey(1)
print('img_recon fwd (2supp x 4sc x b4 @384x640):', round(timeit(loss_only, depths, imgs, supp, Ts, K, rng), 2), 'ms')
print('img_recon fwd+bwd:', round(timeit(loss_grad, depths, imgs, supp, Ts, K, rng), 2), 'ms')

# Encoder fwd+bwd
cfg = {
    'net': {'depth': {'enc_name': 'convnext_base', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': (0,1,2,3)},
            'pose': {'enc_name': 'convnext_tiny', 'pretrained': False, 'learn_K': True}},
    'loss': {'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
             'disp_smooth': {'weight': 0.001, 'use_edges': True}},
    'optimizer': {'type': 'adamw', 'lr': 1e-4},
    'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False},
}
trainer = MonoDepthTrainer(cfg)
tx = parsers.make_optimizer(cfg)
x = {'imgs': imgs, 'supp_imgs': supp}
y = {'imgs': imgs, 'supp_imgs': supp, 'K': K}
state = trainer.init_state(jax.random.PRNGKey(0), x, (-1,1), tx)

from slowtv_monodepth_tpu.parallel import make_train_step
step = make_train_step(trainer, (-1,1), tx, donate=False)
def run_step(state, x, y, r):
    s2, sc = step(state, x, y, r)
    return sc['loss']
print('full step:', round(timeit(run_step, state, x, y, rng, n=10), 2), 'ms')

# Depth net fwd only
net = trainer.nets['depth']
v = {'params': state.params['depth'], **state.aux['depth']}
@jax.jit
def depth_fwd(v, imgs):
    return net.apply(v, imgs, train=False)['disp'][0]
print('depth net fwd:', round(timeit(depth_fwd, v, imgs), 2), 'ms')
