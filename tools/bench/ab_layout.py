"""A/B: XLA-chosen (AUTO) jit-boundary layouts vs default layouts
(VERDICT r04 item 4a — the one untried structural lever).

The train step's params/opt-state/batch cross the jit boundary every step;
by default JAX fixes their device layouts to row-major-ish defaults and XLA
inserts any transposes it wants INSIDE the program. `Format(Layout.AUTO)`
instead lets the compiler pick the boundary layouts it would prefer
(propagating from the conv/matmul operands), and the carried TrainState then
LIVES in that layout between steps — deleting boundary-adjacent transposes
from every step, if XLA wanted any.

Protocol (perf-gotchas doc): both variants compiled in ONE process, timed
interleaved best-of-rounds with pipelined host-fetch sync, full-res pose
(the deviation-free recipe whose 53->60 imgs/s gap this investigates).

Usage: python tools/bench/ab_layout.py [--batch 8] [--iters 10] [--rounds 3]
"""
from __future__ import annotations

import sys
import time
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('bench')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental.layout import Format, Layout  # noqa: E402


def build(batch: int, pose_scale: int):
    from slowtv_monodepth_tpu import parsers
    from slowtv_monodepth_tpu.core import MonoDepthTrainer

    B, H, W = batch, 384, 640
    cfg = {
        'net': {
            'depth': {'enc_name': 'convnext_base', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': (0, 1, 2, 3),
                      'gelu': 'tanh', 'dec_pad_mode': 'zeros'},
            'pose': {'enc_name': 'convnext_tiny', 'pretrained': False,
                     'learn_K': True, 'gelu': 'tanh',
                     'input_scale': pose_scale},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'scheduler': {'steplr': {'step_size': 40, 'gamma': 0.1},
                      'linear': {'start_factor': 0.1, 'total_iters': 4}},
        'trainer': {'min_depth': 0.1, 'max_depth': 100,
                    'always_fwd_pose': False, 'precision': 'bf16'},
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
    step = trainer.make_step_fn(supp_idxs, tx, train=True)
    return step, state, x, y


def time_variant(compiled, state, x, y, rngs, iters, rounds):
    dt = float('inf')
    for r in range(rounds):
        t0 = time.perf_counter()
        prev = None
        for i in range(iters):
            state, scalars = compiled(state, x, y, rngs[r * iters + i])
            if prev is not None:
                float(prev)
            prev = scalars['loss']
        float(prev)
        dt = min(dt, time.perf_counter() - t0)
    return dt, state


def main():
    ap = ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--rounds', type=int, default=3)
    ap.add_argument('--pose-scale', type=int, default=1)
    args = ap.parse_args()

    step, state, x, y = build(args.batch, args.pose_scale)
    rng = jax.random.PRNGKey(42)
    n = args.rounds * args.iters + 3
    rngs = [jax.random.PRNGKey(100 + i) for i in range(2 * n)]

    # --- A: default layouts (the bench.py configuration).
    print('compiling default...', flush=True)
    base = jax.jit(step, donate_argnums=(0,)).lower(state, x, y, rng).compile()
    print('compiled default', flush=True)

    # --- B: AUTO boundary layouts. Donated state must carry a consistent
    # layout step-over-step, so the OUTPUT state formats are re-pinned to
    # whatever AUTO chose for the input state.
    auto = Format(Layout.AUTO)
    print('compiling AUTO...', flush=True)
    fmt_probe = (jax.jit(step, donate_argnums=(0,),
                         in_shardings=auto, out_shardings=auto)
                 .lower(state, x, y, rng).compile())
    print('compiled AUTO', flush=True)
    in_fmts = fmt_probe.input_formats
    out_fmts = fmt_probe.output_formats
    state_in_fmt = in_fmts[0][0] if isinstance(in_fmts, tuple) and len(in_fmts) == 2 else in_fmts[0]
    print('AUTO state-in == state-out formats:',
          jax.tree_util.tree_all(jax.tree_util.tree_map(
              lambda a, b: a == b, state_in_fmt, out_fmts[0])))

    # Materialize operands in the chosen layouts.
    a_args = in_fmts[0] if isinstance(in_fmts, tuple) and len(in_fmts) == 2 else in_fmts
    state_b = jax.device_put(state, a_args[0])
    x_b = jax.device_put(x, a_args[1])
    y_b = jax.device_put(y, a_args[2])
    jax.block_until_ready(state_b)
    print('operands placed', flush=True)

    # Layout diff summary: how many leaves did AUTO lay out differently?
    def m2m(fmt):
        try:
            return fmt.layout.major_to_minor
        except Exception:
            return None
    default_fmts = (base.input_formats[0] if isinstance(base.input_formats, tuple)
                    and len(base.input_formats) == 2 else base.input_formats)
    diffs = jax.tree_util.tree_map(
        lambda a, b: int(m2m(a) != m2m(b)), a_args, default_fmts)
    n_diff = sum(jax.tree_util.tree_leaves(diffs))
    n_tot = len(jax.tree_util.tree_leaves(diffs))
    print(f'AUTO chose a non-default layout for {n_diff}/{n_tot} '
          f'boundary leaves')

    # Interleaved warmup + timing (fetch each step to localize failures).
    for i in range(3):
        state, s1 = base(state, x, y, rngs[i])
        l1 = float(s1['loss'])
        state_b, s2 = fmt_probe(state_b, x_b, y_b,
                                jax.device_put(rngs[n + i], a_args[3]))
        l2 = float(s2['loss'])
    print('losses agree:', abs(l1 - l2) < 1e-3, l1, l2)

    dts = {'default': [], 'auto': []}
    for r in range(args.rounds):
        sl = slice(3 + r * args.iters, 3 + (r + 1) * args.iters)
        t, state = time_variant(base, state, x, y, rngs[sl], args.iters, 1)
        dts['default'].append(t)
        rngs_b = [jax.device_put(k, a_args[3])
                  for k in rngs[n + 3 + r * args.iters:n + 3 + (r + 1) * args.iters]]
        t, state_b = time_variant(fmt_probe, state_b, x_b, y_b,
                                  rngs_b, args.iters, 1)
        dts['auto'].append(t)

    for k, v in dts.items():
        best = min(v)
        print(f'{k:8s}: best {1000 * best / args.iters:7.2f} ms/step '
              f'({args.batch * args.iters / best:6.2f} imgs/s)  all='
              f'{[round(1000 * t / args.iters, 1) for t in v]}')


if __name__ == '__main__':
    main()
