"""Benchmark: steady-state training throughput of the flagship KBR step.

Measures imgs/sec of the full jitted train step — ConvNeXt-Base depth net +
ConvNeXt-Tiny pose net with learned intrinsics, min-reprojection/automask +
edge-aware smoothness losses, AdamW with backbone-LR split — at the KBR
training resolution (batch 4 @ 384x640, ref `cfg/kbr/default.yaml`, with the
shipped TPU recipe tweaks from `cfg/kbr/tpu.yaml`), on whatever accelerator
JAX exposes (the driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` compares against an A100 PyTorch estimate for the same step
(the reference publishes no throughput numbers — SURVEY.md §6; the estimate
below is ConvNeXt-B fwd+bwd + pose + warp losses at 384x640 on A100 with
PyTorch 2.0, ~30 imgs/s). Target per BASELINE.json: >2x.
"""
from __future__ import annotations

import json
import time

import jax

# Persistent compile cache: repeat bench runs skip the multi-minute XLA
# compile of the full train step. Host-keyed under /tmp — never a repo dir,
# which may move between machines and poison the cache (r02 post-mortem).
import sys as _sys  # noqa: E402
from pathlib import Path as _Path  # noqa: E402

_sys.path.insert(0, str(_Path(__file__).resolve().parent))
from slowtv_monodepth_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('bench')
import jax.numpy as jnp

A100_PYTORCH_IMGS_PER_SEC_ESTIMATE = 30.0

# Peak dense bf16 FLOP/s per chip by `device_kind` substring (public specs:
# v4 275, v5e 197, v5p 459, v6e 918 TFLOP/s). MFU = measured FLOP/s / peak.
PEAK_BF16_FLOPS = (
    ('v6 lite', 918e12), ('v6e', 918e12),
    ('v5 lite', 197e12), ('v5e', 197e12),
    ('v5p', 459e12), ('v5', 459e12),
    ('v4', 275e12),
)


def peak_flops(device_kind: str) -> float:
    kind = device_kind.lower()
    for sub, peak in PEAK_BF16_FLOPS:
        if sub in kind:
            return peak
    return 197e12  # Unknown chip: assume v5e-class (the bench target).

# Three precisely-labeled recipes (VERDICT r4 #3), selected by
# SLOWTV_BENCH_RECIPE:
# - 'tpu' (default): the shipped TPU training recipe (cfg/kbr/tpu.yaml) —
#   tanh GELU, zero-'SAME' decoder pad, bf16 fwd/bwd, real batch 8 (=
#   reference batch 4 x accumulate 2 as one SGD-identical step), half-res
#   pose input. Every delta is endpoint/trajectory-qualified
#   (tests/test_recipe_deviation.py).
# - 'fullres-pose': same TPU graph deltas but full-res pose input — i.e.
#   tanh GELU + zero pad + bf16 + batch-8 remain. This is the
#   SGD-trajectory-equivalent recipe (bounded <=0.8%/20 steps), NOT the
#   bit-exact reference graph.
# - 'exact': genuinely-exact reference parity — erf GELU, reflect pad, f32
#   fwd/bwd, batch 4 x accumulate 2 (optax MultiSteps), full-res pose.
# Best-of-ROUNDS timing: the axon tunnel's host overhead varies by session
# and minute (identical executables measured 151 vs 171-178 ms wall an hour
# apart with flat device-lane time), so one 10-iter window can misreport the
# steady state by ~15%. Each round's steps all fully complete (honest
# pipelined host-fetch sync); the minimum round is the steady-state rate.
H, W = 384, 640
WARMUP, ITERS, ROUNDS = 3, 10, 3

RECIPES = {
    # name: (batch, accumulate, gelu, dec_pad, precision, pose_scale)
    'tpu': (8, 1, 'tanh', 'zeros', 'bf16', 2),
    'fullres-pose': (8, 1, 'tanh', 'zeros', 'bf16', 1),
    'exact': (4, 2, 'exact', 'reflect', 'f32', 1),
}


def _probe_backend(timeout_s: float | None = None):
    """Fail fast if the accelerator runtime never comes up, with retries.

    The remote-tunnel TPU backend can wedge such that `jax.devices()` blocks
    forever in C (or raises a libtpu client/terminal version mismatch during
    rolling upgrades); probing from a daemon thread lets the bench detect
    that instead of hanging the harness. Because a wedged/failed backend init
    cannot be retried in-process, failed probes re-exec the bench in a fresh
    process (up to SLOWTV_BENCH_PROBE_RETRIES times, default 2, sleeping
    SLOWTV_BENCH_PROBE_SLEEP_S between attempts) so a transient tunnel blip
    doesn't zero the round's perf signal.
    """
    import os
    import sys
    import threading
    if timeout_s is None:
        timeout_s = float(os.environ.get('SLOWTV_BENCH_PROBE_TIMEOUT_S', '180'))
    out, err = [], []

    def _devs():
        try:
            if os.environ.get('SLOWTV_BENCH_SIMULATE_WEDGE'):
                # Test hook: stand in for jax.devices() blocking forever in C
                # (a dead tunnel cannot be simulated hermetically otherwise).
                threading.Event().wait()
            out.append(jax.devices())
        except Exception as e:  # noqa: BLE001 — report any backend-init failure
            err.append(e)

    t = threading.Thread(target=_devs, daemon=True)
    t.start()
    t.join(timeout_s)
    if out:
        return out[0]

    attempt = int(os.environ.get('SLOWTV_BENCH_ATTEMPT', '0'))
    retries = int(os.environ.get('SLOWTV_BENCH_PROBE_RETRIES', '2'))
    why = (f'backend init failed: {err[0]}' if err
           else f'jax backend init did not complete within {timeout_s}s')
    if attempt < retries:
        sleep_s = float(os.environ.get('SLOWTV_BENCH_PROBE_SLEEP_S', '120'))
        print(f'bench: {why}; retry {attempt + 1}/{retries} in {sleep_s:.0f}s '
              f'(fresh process)', file=sys.stderr)
        time.sleep(sleep_s)
        os.environ['SLOWTV_BENCH_ATTEMPT'] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
    print(f'bench: {why} (accelerator runtime unreachable after '
          f'{attempt + 1} attempts). This measures the tunnel, not the '
          f'framework: last on-chip steady state was 69.4 imgs/s/chip '
          f'(vs_baseline 2.31, MFU 0.202; fullres-pose 53.3 / exact 27.5 '
          f'same session) — see STATUS.md "Round 5".',
          file=sys.stderr)
    sys.exit(1)


def main():
    import os
    _probe_backend()
    from slowtv_monodepth_tpu import parsers
    from slowtv_monodepth_tpu.core import MonoDepthTrainer
    from slowtv_monodepth_tpu.parallel import make_mesh, make_train_step, shard_batch

    recipe = os.environ.get('SLOWTV_BENCH_RECIPE', 'tpu')
    if recipe not in RECIPES:
        raise KeyError(f'SLOWTV_BENCH_RECIPE={recipe} vs. {list(RECIPES)}')
    B, accumulate, gelu, dec_pad, precision, pose_scale = RECIPES[recipe]
    # Back-compat knob from the round-4 record: pose scale override on top
    # of the selected recipe (SLOWTV_BENCH_POSE_SCALE=1 on 'tpu' ==
    # 'fullres-pose').
    pose_scale = int(os.environ.get('SLOWTV_BENCH_POSE_SCALE', pose_scale))

    cfg = {
        'net': {
            # 'tpu'/'fullres-pose': `gelu: tanh` + zero-'SAME' decoder
            # padding, the shipped TPU training recipe (cfg/kbr/tpu.yaml):
            # training-equivalent tweaks measured at +15% and +14% on v5e.
            # 'exact': erf GELU + reflect pad, the reference graph.
            'depth': {'enc_name': 'convnext_base', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': (0, 1, 2, 3),
                      'gelu': gelu, 'dec_pad_mode': dec_pad},
            # `input_scale: 2` = half-res pose input, -15.8% step time
            # (same-process A/B, tools/bench/ab_batch.py --ab-pose-scale);
            # endpoint-qualified deviation, NOT enabled in parity cfgs.
            'pose': {'enc_name': 'convnext_tiny', 'pretrained': False, 'learn_K': True,
                     'gelu': gelu, 'input_scale': pose_scale},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        # Exactly the KBR recipe's optimizer + scheduler (cfg/kbr/default.yaml;
        # tpu.yaml changes nets/precision/batch only).
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'scheduler': {'steplr': {'step_size': 40, 'gamma': 0.1},
                      'linear': {'start_factor': 0.1, 'total_iters': 4}},
        # bf16 net fwd/bwd (f32 master params/losses) per cfg/kbr/tpu.yaml:
        # measured +17% on v5e with no fp16-style stability tradeoffs.
        # 'exact' keeps f32 throughout like the reference.
        'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False,
                    'precision': precision},
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
    tx = parsers.make_optimizer(cfg, steps_per_epoch=1000, accumulate=accumulate)
    state = trainer.init_state(jax.random.PRNGKey(1), x, supp_idxs, tx)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        x, y = shard_batch(mesh, (x, y))
    step = make_train_step(trainer, supp_idxs, tx, mesh=mesh, donate=True)

    # Analytic per-step FLOPs from XLA's cost model of the *compiled* step
    # (encoders + decoders + losses, fwd + bwd + optimizer — everything in the
    # jitted graph). This is the FLOP model behind the reported MFU; spot-check:
    # a (512,512)x(512,512) matmul reports exactly 2*512^3.
    compiled = step.lower(state, x, y, jax.random.PRNGKey(0)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    step_flops = float(ca.get('flops', 0.0)) if ca else 0.0

    # IMPORTANT: fetch the loss to host to synchronize. Over the axon TPU
    # tunnel `jax.block_until_ready` returns without waiting for device
    # execution (measured: "blocked" steps report ~7 ms while a host fetch
    # shows ~400 ms of real device work), so only a device->host transfer
    # gives an honest steady-state time. The fetch is pipelined one step
    # behind (as the training loop runs), so the host round-trip overlaps
    # device compute; every timed step still fully completes before `dt`.
    rngs = [jax.random.PRNGKey(100 + i) for i in range(WARMUP + ROUNDS * ITERS)]
    for i in range(WARMUP):
        state, scalars = compiled(state, x, y, rngs[i])
    float(scalars['loss'])

    dt = float('inf')
    for r in range(ROUNDS):
        t0 = time.perf_counter()
        prev = None
        for i in range(ITERS):
            state, scalars = compiled(state, x, y, rngs[WARMUP + r * ITERS + i])
            if prev is not None:
                float(prev)
            prev = scalars['loss']
        float(prev)
        dt = min(dt, time.perf_counter() - t0)

    imgs_per_sec = B * ITERS / dt
    per_chip = imgs_per_sec / max(n_dev, 1)
    peak = peak_flops(jax.devices()[0].device_kind)
    mfu = (step_flops * ITERS / dt) / (peak * max(n_dev, 1))
    print(json.dumps({
        'metric': 'kbr_train_imgs_per_sec_per_chip',
        'value': round(per_chip, 3),
        'unit': 'imgs/sec/chip',
        'vs_baseline': round(per_chip / A100_PYTORCH_IMGS_PER_SEC_ESTIMATE, 3),
        'mfu': round(mfu, 4),
        'step_flops': step_flops,
        'flops_per_img': round(step_flops / B),
        'peak_flops': peak,
        'recipe': recipe,
        'batch': B,
        'accumulate': accumulate,
        'precision': precision,
        'gelu': gelu,
        'dec_pad': dec_pad,
        'pose_input_scale': cfg['net']['pose']['input_scale'],
    }))


if __name__ == '__main__':
    main()
