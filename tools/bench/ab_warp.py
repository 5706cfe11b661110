"""Same-process A/B of trainer.warp_bf16 on the real chip.

Cross-session bench.py comparisons carry session-to-session tunnel/chip
variance (observed: ~30 ms of host-side gap between two runs minutes apart);
this driver times both variants interleaved in ONE process so the comparison
is honest. Usage: python tools/bench/ab_warp.py [--iters 10] [--rounds 3]
"""
from __future__ import annotations

import sys
import time
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

from slowtv_monodepth_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('bench')
import jax.numpy as jnp

B, H, W = 8, 384, 640


def build(warp_bf16: bool):
    from slowtv_monodepth_tpu import parsers
    from slowtv_monodepth_tpu.core import MonoDepthTrainer
    from slowtv_monodepth_tpu.parallel import make_train_step

    cfg = {
        'net': {
            'depth': {'enc_name': 'convnext_base', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': (0, 1, 2, 3),
                      'gelu': 'tanh', 'dec_pad_mode': 'zeros'},
            'pose': {'enc_name': 'convnext_tiny', 'pretrained': False,
                     'learn_K': True, 'gelu': 'tanh'},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'scheduler': {'steplr': {'step_size': 40, 'gamma': 0.1},
                      'linear': {'start_factor': 0.1, 'total_iters': 4}},
        'trainer': {'min_depth': 0.1, 'max_depth': 100,
                    'always_fwd_pose': False, 'precision': 'bf16',
                    'warp_bf16': warp_bf16},
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
    compiled = step.lower(state, x, y, jax.random.PRNGKey(0)).compile()
    return compiled, state, x, y


def timed(compiled, state, x, y, iters: int) -> float:
    """Pipelined honest host-fetch timing (bench.py pattern)."""
    rngs = [jax.random.PRNGKey(100 + i) for i in range(3 + iters)]
    for i in range(3):
        state, sc = compiled(state, x, y, rngs[i])
    float(sc['loss'])
    t0 = time.perf_counter()
    prev = None
    for i in range(iters):
        state, sc = compiled(state, x, y, rngs[3 + i])
        if prev is not None:
            float(prev)
        prev = sc['loss']
    float(prev)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = ArgumentParser()
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--rounds', type=int, default=3)
    args = ap.parse_args()

    a = build(False)
    b = build(True)
    ms_a, ms_b = [], []
    for r in range(args.rounds):
        ms_a.append(timed(*a, args.iters))
        ms_b.append(timed(*b, args.iters))
        print(f'round {r}: f32 {ms_a[-1]:.1f} ms  bf16-packed {ms_b[-1]:.1f} ms')
    best_a, best_b = min(ms_a), min(ms_b)
    print(f'best-of-{args.rounds}: f32 {best_a:.1f} ms ({B / best_a * 1000:.1f}'
          f' imgs/s)  bf16-packed {best_b:.1f} ms ({B / best_b * 1000:.1f}'
          f' imgs/s)  delta {(best_a - best_b) / best_a * 100:+.1f}%')


if __name__ == '__main__':
    main()
