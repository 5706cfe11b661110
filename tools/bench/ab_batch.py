"""Same-process A/B of per-chip batch size on the real chip.

Motivation: per-STEP costs (optimizer update over ~116M params, loss-chain
glue, kernel launch tails) are batch-independent, so a bigger per-chip batch
amortizes them. Batch 16 at 2x LR is the reference's own scaling rule — its
LR auto-scales by devices x accumulation (ref `api/train/train.py:125-128`),
so B=16/chip is SGD-equivalent to a 2-GPU-per-chip reference run.

Cross-session bench comparisons carry ~15% tunnel variance; this driver
times all variants interleaved in ONE process. Usage:
    python tools/bench/ab_batch.py [--batches 8 16] [--iters 10] [--rounds 3]
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

H, W = 384, 640


def lower(batch: int, remat: bool = False, flatten: bool = False,
          pose_scale: int = 1, phase_up: bool = False,
          xla_fallback: bool = False, enc_remat: str = ''):
    """Build state/batch and LOWER the train step without compiling.

    One lowered step can be `.compile()`d repeatedly with different
    `compiler_options`, all variants sharing a single state/batch set —
    five per-variant state copies at batch 8 RESOURCE_EXHAUST the chip
    (`ab_copts.py`).
    """
    from slowtv_monodepth_tpu import parsers
    from slowtv_monodepth_tpu.core import MonoDepthTrainer
    from slowtv_monodepth_tpu.parallel import make_train_step

    cfg = {
        'net': {
            'depth': {'enc_name': 'convnext_base', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': (0, 1, 2, 3),
                      'gelu': 'tanh', 'dec_pad_mode': 'zeros',
                      **({'dec_phase_up': True} if phase_up else {}),
                      **({'enc_remat': enc_remat} if enc_remat else {})},
            'pose': {'enc_name': 'convnext_tiny', 'pretrained': False,
                     'learn_K': True, 'gelu': 'tanh',
                     'input_scale': pose_scale},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3,
                      **({'flatten': True} if flatten else {})},
        'scheduler': {'steplr': {'step_size': 40, 'gamma': 0.1},
                      'linear': {'start_factor': 0.1, 'total_iters': 4}},
        'trainer': {'min_depth': 0.1, 'max_depth': 100,
                    'always_fwd_pose': False, 'precision': 'bf16',
                    **({'remat': True} if remat else {})},
    }
    supp_idxs = (-1, 1)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (batch, H, W, 3))
    supp = jnp.stack([jnp.roll(imgs, 2, axis=2), jnp.roll(imgs, -2, axis=2)])
    K = jnp.broadcast_to(jnp.array(
        [[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0],
         [0, 0, 1, 0], [0, 0, 0, 1.0]]), (batch, 4, 4))
    x = {'imgs': imgs, 'supp_imgs': supp}
    y = {'imgs': imgs, 'supp_imgs': supp, 'K': K}
    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer(cfg, steps_per_epoch=1000)
    state = trainer.init_state(jax.random.PRNGKey(1), x, supp_idxs, tx)
    step = make_train_step(trainer, supp_idxs, tx, donate=False)
    if xla_fallback:
        # Trace with the Pallas warp/photo kernels pinned to their exact XLA
        # fallbacks — the kernel set the spatial/TP-sharded paths run
        # (`parallel/mesh.py` spatial_step), measured here in the DP path so
        # the per-kernel downgrade is isolated from the sharding collectives.
        from slowtv_monodepth_tpu.ops.dispatch import disable_pallas
        with disable_pallas('warp', 'photo'):
            return step.lower(state, x, y, jax.random.PRNGKey(0)), state, x, y
    return step.lower(state, x, y, jax.random.PRNGKey(0)), state, x, y


def build(batch: int, remat: bool = False, flatten: bool = False,
          pose_scale: int = 1, phase_up: bool = False,
          xla_fallback: bool = False, enc_remat: str = '',
          compiler_options: dict | None = None):
    lowered, state, x, y = lower(batch, remat, flatten, pose_scale, phase_up,
                                 xla_fallback, enc_remat)
    return lowered.compile(compiler_options=compiler_options), state, x, y


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
    ap.add_argument('--batches', type=int, nargs='+', default=[8, 16])
    ap.add_argument('--remat', action='store_true',
                    help='enable remat on every variant')
    ap.add_argument('--ab-flatten', action='store_true',
                    help='A/B optimizer.flatten at the FIRST batch size '
                         'instead of batch sizes')
    ap.add_argument('--ab-pose-scale', action='store_true',
                    help='A/B pose input_scale 1 vs 2 at the FIRST batch size')
    ap.add_argument('--ab-phase-up', action='store_true',
                    help='A/B dec_phase_up off vs on at the FIRST batch size')
    ap.add_argument('--ab-xla-fallback', action='store_true',
                    help='A/B Pallas warp/photo kernels vs their XLA '
                         'fallbacks (the spatial/TP-sharded kernel set) at '
                         'the FIRST batch size')
    ap.add_argument('--ab-enc-remat', action='store_true',
                    help="A/B encoder block_remat '' vs 'dots' vs 'full' at "
                         'the FIRST batch size')
    ap.add_argument('--pose-scale', type=int, default=1,
                    help='pose input_scale applied to every variant')
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--rounds', type=int, default=3)
    args = ap.parse_args()

    b0 = args.batches[0]
    if args.ab_flatten:
        specs = {f'B{b0}-flat{f}': (b0, f, args.pose_scale, False, False, '')
                 for f in (False, True)}
    elif args.ab_pose_scale:
        specs = {f'B{b0}-pose{ps}': (b0, False, ps, False, False, '')
                 for ps in (1, 2)}
    elif args.ab_phase_up:
        specs = {f'B{b0}-phase{pu}': (b0, False, args.pose_scale, pu, False, '')
                 for pu in (False, True)}
    elif args.ab_xla_fallback:
        specs = {f'B{b0}-xlafb{fb}': (b0, False, args.pose_scale, False, fb, '')
                 for fb in (False, True)}
    elif args.ab_enc_remat:
        specs = {f'B{b0}-remat[{er}]': (b0, False, args.pose_scale, False,
                                        False, er)
                 for er in ('', 'dots', 'full')}
    else:
        specs = {f'B{b}': (b, False, args.pose_scale, False, False, '')
                 for b in args.batches}

    variants = {}
    for key, (b, flat, ps, pu, fb, er) in specs.items():
        try:
            variants[key] = build(b, remat=args.remat, flatten=flat,
                                  pose_scale=ps, phase_up=pu, xla_fallback=fb,
                                  enc_remat=er)
        except Exception as e:  # noqa: BLE001 — report OOM/compile failures per-variant
            print(f'{key}: build failed: {type(e).__name__}: {str(e)[:300]}')
    # NOTE: all variants' params/opt-states are co-resident on the chip, so a
    # large batch can OOM here while fitting standalone — confirm a suspected
    # OOM with a solo `--batches N` run before concluding it doesn't fit.
    best = {k: float('inf') for k in variants}
    for r in range(args.rounds):
        for key, v in list(variants.items()):
            try:
                ms = timed(*v, args.iters)
            except Exception as e:  # noqa: BLE001 — drop the variant, keep the A/B alive
                print(f'round {r}: {key} runtime failure, dropping: '
                      f'{type(e).__name__}: {str(e)[:300]}')
                variants.pop(key)
                best.pop(key)
                continue
            best[key] = min(best[key], ms)
            b = specs[key][0]
            print(f'round {r}: {key} {ms:.1f} ms/step '
                  f'({b / ms * 1000:.1f} imgs/s)')
    for key, ms in best.items():
        b = specs[key][0]
        print(f'best-of-{args.rounds}: {key} {ms:.1f} ms/step '
              f'({b / ms * 1000:.1f} imgs/s)')


if __name__ == '__main__':
    main()
