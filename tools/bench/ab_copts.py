"""Same-process A/B of per-compile XLA compiler options on the real chip.

`tools/bench/ab_flags.py` swept XLA_FLAGS, but this tunnel's client XLA build
rejects every TPU-specific flag at env-parse time (`parse_flags_from_env:
Unknown flag`, STATUS.md r03). Compiler options passed to
`lowered.compile(compiler_options=...)` take a DIFFERENT path — they ride the
executable build options to the PJRT backend compiler, bypassing the client
env parser — and, being per-compile, variants interleave in ONE process (no
cross-session ~15% tunnel variance; same harness discipline as ab_batch.py).

Usage:
    python tools/bench/ab_copts.py                       # curated candidates
    python tools/bench/ab_copts.py --opts xla_tpu_rwb_fusion=false
    python tools/bench/ab_copts.py --batch 8 --iters 10 --rounds 3
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('bench')

sys.path.insert(0, str(Path(__file__).resolve().parent))
from ab_batch import lower, timed  # noqa: E402  (sibling harness)

# Curated candidates for the conv-bound KBR step on v5e (one option per
# variant; pass --opts, comma-joining k=v pairs, for combinations).
CANDIDATES = [
    'xla_tpu_enable_latency_hiding_scheduler=true',
    'xla_tpu_scoped_vmem_limit_kib=65536',
    'xla_tpu_scoped_vmem_limit_kib=98304',
    'xla_tpu_rwb_fusion=false',
]


def main():
    ap = ArgumentParser()
    ap.add_argument('--opts', nargs='*', default=None,
                    help='k=v[,k=v...] compiler options; each arg is one variant')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--pose-scale', type=int, default=2)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--rounds', type=int, default=3)
    args = ap.parse_args()

    def coerce(v: str):
        # XLA validates option types: booleans/ints must arrive typed, not
        # as strings ("'true' is not a valid bool value").
        if v.lower() in ('true', 'false'):
            return v.lower() == 'true'
        return int(v) if v.lstrip('-').isdigit() else v

    opt_sets = args.opts if args.opts is not None else CANDIDATES
    specs: dict = {'(baseline)': None}
    for s in opt_sets:
        specs[s] = {k: coerce(v) for k, v in
                    (kv.split('=', 1) for kv in s.split(','))}

    # ONE lowered step + ONE state/batch set shared by every variant:
    # per-variant state copies at batch 8 RESOURCE_EXHAUST the chip.
    lowered, state, x, y = lower(args.batch, pose_scale=args.pose_scale)
    variants = {}
    for name, opts in specs.items():
        try:
            variants[name] = lowered.compile(compiler_options=opts)
            print(f'{name}: compiled', flush=True)
        except Exception as e:  # noqa: BLE001 — record rejection per variant
            print(f'{name}: compile failed: {type(e).__name__}: {str(e)[:300]}',
                  flush=True)

    best = {k: float('inf') for k in variants}
    for _ in range(args.rounds):
        for key, compiled in variants.items():
            best[key] = min(best[key], timed(compiled, state, x, y, args.iters))

    base = best.get('(baseline)')
    for key, ms in best.items():
        rel = (f' ({(ms / base - 1) * 100:+.1f}%)'
               if base and key != '(baseline)' else '')
        print(f'{key}: {ms:.1f} ms/step{rel}')


if __name__ == '__main__':
    main()
