"""XLA-flags sweep for the flagship train step, judged by DEVICE-LANE time.

XLA_FLAGS apply at backend init, so flag variants cannot be interleaved in
one process the way `ab_batch.py`/`ab_warp.py` interleave code variants. The
valid cross-process comparison on the axon tunnel is device-lane trace time
(host wall-clock drifts ~15% between sessions; device lanes stay flat — see
STATUS.md "measurement lesson"). This harness runs each flag set in a fresh
subprocess that captures a `jax.profiler` trace of the bench step
(`profile_step.capture`), then ranks the variants by per-step device-lane ms.

Usage (on the real chip):
    python tools/bench/ab_flags.py                   # curated candidates
    python tools/bench/ab_flags.py --flags '' '--xla_tpu_scoped_vmem_limit_kib=65536'
    python tools/bench/ab_flags.py --steps 5 --batch 8

Unknown/rejected flags make the child fail; the harness records and skips
them. A variant only counts as a win if it beats baseline by >2% device time
(trace noise floor measured ~1%).
"""
from __future__ import annotations

import collections
import gzip
import json
import os
import subprocess
import sys
from argparse import ArgumentParser
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

# Curated single-chip candidates for the conv-bound KBR step on v5e.
# Each entry is appended to the baseline XLA_FLAGS (if any). Names not
# recognized by the local libtpu/XLA build simply fail that child.
CANDIDATES = [
    '',  # baseline
    '--xla_tpu_scoped_vmem_limit_kib=65536',
    '--xla_tpu_scoped_vmem_limit_kib=98304',
    '--xla_tpu_enable_latency_hiding_scheduler=true',
    '--xla_tpu_rwb_fusion=false',
]


def lane_total_ms(trace_dir: str, steps: int) -> float:
    """Total per-step device time of the XLA-ops lane (profile_step logic)."""
    traces = sorted(Path(trace_dir).rglob('*.trace.json.gz'))
    if not traces:
        raise FileNotFoundError(f'no trace under {trace_dir}')
    with gzip.open(traces[-1], 'rt') as f:
        data = json.load(f)
    events = [e for e in data.get('traceEvents', [])
              if e.get('ph') == 'X' and 'dur' in e]
    lanes = collections.Counter((e.get('pid'), e.get('tid')) for e in events
                                if (e.get('args') or {}).get('tf_op'))
    if not lanes:
        raise RuntimeError(f'no tf_op-attributed device lane in {trace_dir}')
    lane = lanes.most_common(1)[0][0]
    return sum(e['dur'] for e in events
               if (e.get('pid'), e.get('tid')) == lane) / 1000.0 / steps


def run_child(flags: str, trace_dir: str, batch: int, steps: int) -> None:
    env = dict(os.environ)
    base = env.get('XLA_FLAGS', '')
    env['XLA_FLAGS'] = f'{base} {flags}'.strip()
    code = (
        'import sys; sys.path.insert(0, {repo!r});'
        'from tools.bench import profile_step as ps;'
        'ps.TRACE_DIR = {td!r};'
        'ps.capture({batch}, {steps})'
    ).format(repo=str(REPO), td=trace_dir, batch=batch, steps=steps)
    r = subprocess.run([sys.executable, '-c', code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(f'child failed (rc={r.returncode}): '
                           f'{r.stderr[-800:]}')


def main():
    ap = ArgumentParser()
    ap.add_argument('--flags', nargs='*', default=None,
                    help='flag sets to sweep (default: curated CANDIDATES); '
                         "'' is the baseline")
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--steps', type=int, default=3)
    args = ap.parse_args()

    flag_sets = args.flags if args.flags is not None else CANDIDATES
    results: dict[str, float] = {}
    for i, flags in enumerate(flag_sets):
        name = flags or '(baseline)'
        trace_dir = f'/tmp/jtrace_flags_{i}'
        try:
            run_child(flags, trace_dir, args.batch, args.steps)
            ms = lane_total_ms(trace_dir, args.steps)
        except Exception as e:  # noqa: BLE001 — record and continue the sweep
            print(f'SKIP {name}: {type(e).__name__}: {str(e)[:400]}')
            continue
        results[name] = ms
        print(f'{ms:8.2f} ms/step device-lane  {name}')

    if '(baseline)' in results:
        base = results['(baseline)']
        print(f'\n=== vs baseline ({base:.2f} ms); win threshold 2% ===')
        for name, ms in sorted(results.items(), key=lambda kv: kv[1]):
            d = (ms - base) / base * 100
            tag = 'WIN' if d < -2 else ('LOSS' if d > 2 else 'wash')
            print(f'{ms:8.2f} ms  {d:+6.2f}%  {tag:4s}  {name}')


if __name__ == '__main__':
    main()
