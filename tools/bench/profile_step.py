"""Capture + parse a device trace of the flagship KBR train step.

Runs the exact `bench.py` configuration (batch 8 @ 384x640, bf16, tanh GELU),
captures a `jax.profiler` trace, and aggregates the perfetto XLA-ops lane
(pid/tid 3 carries per-op device slices; `args.tf_op` has the HLO/module
attribution) into a per-category table: convs, matmuls, pallas kernels,
copies/transposes/DMA, elementwise fusions.

Usage:
    python tools/bench/profile_step.py [--batch 8] [--steps 3] [--top 40]
"""
from __future__ import annotations

import collections
import gzip
import json
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

TRACE_DIR = '/tmp/jtrace'


def capture(batch: int, steps: int, warp_bf16: bool = False,
            pose_scale: int = 2) -> None:
    import jax
    import jax.numpy as jnp

    from slowtv_monodepth_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache('bench')

    from slowtv_monodepth_tpu import parsers
    from slowtv_monodepth_tpu.core import MonoDepthTrainer
    from slowtv_monodepth_tpu.parallel import make_train_step

    B, H, W = batch, 384, 640
    cfg = {
        'net': {
            'depth': {'enc_name': 'convnext_base', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': (0, 1, 2, 3),
                      'gelu': 'tanh', 'dec_pad_mode': 'zeros'},
            'pose': {'enc_name': 'convnext_tiny', 'pretrained': False,
                     'learn_K': True, 'gelu': 'tanh', 'input_scale': pose_scale},
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

    for i in range(3):
        state, sc = step(state, x, y, jax.random.PRNGKey(i))
    float(sc['loss'])

    jax.profiler.start_trace(TRACE_DIR)
    for i in range(steps):
        state, sc = step(state, x, y, jax.random.PRNGKey(10 + i))
        float(sc['loss'])
    jax.profiler.stop_trace()


CATEGORIES = (
    ('conv', ('convolution', 'conv_general')),
    ('matmul/dot', ('dot', 'einsum')),
    ('pallas', ('pallas', 'custom-call', 'tpu_custom_call')),
    ('copy/transpose/DMA', ('copy', 'transpose', 'dynamic-slice',
                            'dynamic_update', 'concatenate', 'pad', 'slice',
                            'reshape', 'bitcast', 'gather', 'scatter',
                            'dma', 'infeed', 'outfeed', 'all-reduce')),
    ('reduce', ('reduce',)),
)


def classify(name: str, tf_op: str) -> str:
    # NOTE: match copy/DMA keywords against the HLO op NAME only — the tf_op
    # attribution of every backward op contains `transpose(jvp(...))` (the
    # autodiff transpose), which is not a layout transpose. Compute categories
    # may match either field.
    nl, s = name.lower(), (name + ' ' + tf_op).lower()
    for cat, keys in CATEGORIES:
        hay = nl if cat == 'copy/transpose/DMA' else s
        if any(k in hay for k in keys):
            return cat
    return 'fusion/elementwise'


def parse(steps: int, top: int) -> None:
    traces = sorted(Path(TRACE_DIR).rglob('*.trace.json.gz'))
    if not traces:
        print('no trace files found under', TRACE_DIR)
        return
    with gzip.open(traces[-1], 'rt') as f:
        data = json.load(f)

    # XLA-ops lane: pick the (pid, tid) whose events have tf_op args.
    events = [e for e in data.get('traceEvents', [])
              if e.get('ph') == 'X' and 'dur' in e]
    lanes = collections.Counter((e.get('pid'), e.get('tid')) for e in events
                                if (e.get('args') or {}).get('tf_op'))
    if not lanes:
        print('no tf_op-attributed lane; dumping top raw events instead')
        lane_events = events
    else:
        lane = lanes.most_common(1)[0][0]
        lane_events = [e for e in events
                       if (e.get('pid'), e.get('tid')) == lane]

    by_op = collections.Counter()
    by_cat = collections.Counter()
    by_cat_op = collections.defaultdict(collections.Counter)
    for e in lane_events:
        name = e.get('name', '?')
        tf_op = (e.get('args') or {}).get('tf_op', '')
        dur_ms = e['dur'] / 1000.0 / steps
        cat = classify(name, tf_op)
        by_op[f'{name} | {tf_op[:70]}'] += dur_ms
        by_cat[cat] += dur_ms
        by_cat_op[cat][f'{name} | {tf_op[:70]}'] += dur_ms

    total = sum(by_cat.values())
    print(f'\n=== per-step device time by category (total {total:.1f} ms) ===')
    for cat, ms in by_cat.most_common():
        print(f'{ms:8.2f} ms  {100 * ms / total:5.1f}%  {cat}')
    print(f'\n=== top {top} ops (per-step ms) ===')
    for op, ms in by_op.most_common(top):
        print(f'{ms:8.2f}  {op}')
    print(f'\n=== top 20 copy/transpose/DMA ops (per-step ms) ===')
    for op, ms in by_cat_op['copy/transpose/DMA'].most_common(20):
        print(f'{ms:8.2f}  {op}')

    # Module attribution: bucket tf_op paths by network/stage so encoder/
    # decoder/loss shares are readable at a glance.
    import re
    by_mod = collections.Counter()
    for e in lane_events:
        tf_op = (e.get('args') or {}).get('tf_op', '')
        dur_ms = e['dur'] / 1000.0 / steps
        net = ('DepthNet' if 'DepthNet' in tf_op else
               'PoseNet' if 'PoseNet' in tf_op else
               'warp' if 'warp_bilinear' in tf_op else
               'photo' if '_photo_' in tf_op else 'glue/loss/opt')
        m = re.search(r'(stem|stage\d|decoders_disp|heads)', tf_op)
        part = m.group(1) if m else ''
        bwd = 'bwd' if 'transpose(jvp' in tf_op else 'fwd'
        by_mod[f'{net:12s} {part:14s} {bwd}'] += dur_ms
    print('\n=== per-step device time by module ===')
    for mod, ms in by_mod.most_common():
        print(f'{ms:8.2f} ms  {mod}')


if __name__ == '__main__':
    ap = ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--parse-only', action='store_true')
    ap.add_argument('--warp-bf16', action='store_true')
    ap.add_argument('--pose-scale', type=int, default=2)
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.batch, args.steps, args.warp_bf16, args.pose_scale)
    parse(args.steps, args.top)
