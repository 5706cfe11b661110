"""Driver-contract tests for `bench.py`'s backend probe.

The driver runs `python bench.py` at round end against the axon TPU tunnel,
which can be mid-outage (jax.devices() wedges in C, or libtpu raises a
client/terminal version mismatch). The bench must fail FAST with rc=1 and a
clear message — after re-exec'ing itself a bounded number of times so a
transient blip doesn't zero the round's perf signal.

These tests simulate an unreachable backend with a nonexistent JAX platform.
The axon registration must be skipped (PALLAS_AXON_POOL_IPS unset): the
container's sitecustomize otherwise registers the real tunnel backend at
interpreter start, and when the tunnel is HEALTHY that overrides the
nonexistent platform name — the probe would succeed and the bench would run
a real multi-minute TPU benchmark inside this test (observed 2026-08-18).
With registration skipped, `jax.devices()` raises fast and deterministically,
exercising the probe's RAISE mode plus the full re-exec retry chain. The
WEDGE mode — devices() blocking forever in C — is simulated hermetically via
the env-gated SLOWTV_BENCH_SIMULATE_WEDGE hook in the probe itself.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_probe_retries_then_fails_fast():
    # Strip SLOWTV_BENCH_* too: a leaked SLOWTV_BENCH_ATTEMPT would start the
    # child mid-retry-chain and skew the 'retry 1/1' assertions (ADVICE r02).
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'PALLAS_AXON_POOL_IPS')
           and not k.startswith('SLOWTV_BENCH_')}
    env.update({
        'JAX_PLATFORMS': 'nonexistent_backend',
        'SLOWTV_BENCH_PROBE_RETRIES': '1',
        'SLOWTV_BENCH_PROBE_SLEEP_S': '0.1',
        'SLOWTV_BENCH_PROBE_TIMEOUT_S': '10',
    })
    r = subprocess.run([sys.executable, str(REPO / 'bench.py')],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 1, (r.returncode, r.stderr[-2000:])
    assert 'retry 1/1' in r.stderr
    assert 'unreachable after 2 attempts' in r.stderr
    # No JSON metric line may be emitted on failure (the driver parses stdout).
    assert '"metric"' not in r.stdout


@pytest.mark.slow
def test_probe_wedge_timeout_path():
    """WEDGE mode via the env-gated hook (ADVICE r02): the probe thread
    blocks forever, the t.join expiry message path fires, and the same
    retry/exit contract holds."""
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'PALLAS_AXON_POOL_IPS')
           and not k.startswith('SLOWTV_BENCH_')}
    env.update({
        'SLOWTV_BENCH_SIMULATE_WEDGE': '1',
        'SLOWTV_BENCH_PROBE_RETRIES': '1',
        'SLOWTV_BENCH_PROBE_SLEEP_S': '0.1',
        'SLOWTV_BENCH_PROBE_TIMEOUT_S': '2',
    })
    r = subprocess.run([sys.executable, str(REPO / 'bench.py')],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 1, (r.returncode, r.stderr[-2000:])
    assert 'did not complete within 2' in r.stderr
    assert 'unreachable after 2 attempts' in r.stderr
    assert '"metric"' not in r.stdout
