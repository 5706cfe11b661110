"""Driver-contract tests for `__graft_entry__`.

The driver validates multi-chip sharding by calling
`__graft_entry__.dryrun_multichip(8)` in a process whose *default* JAX
backend may be a real (possibly broken) TPU tunnel. The dry run must pin
itself to the virtual host-CPU pool before any backend initialization —
round 1 failed exactly here (MULTICHIP_r01.json: the example batch was
built on the default backend, which was a dead axon tunnel).

These tests run the entry in a fresh subprocess, mimicking the driver:
no JAX_PLATFORMS in the env, conftest's forced-CPU config not inherited.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _run_dryrun(extra_env):
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__; __graft_entry__.dryrun_multichip(8)'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=580)


@pytest.mark.slow
class TestDryrunMultichip:
    def test_driver_invocation_with_xla_flags(self):
        """Exactly the driver's setup: XLA_FLAGS device count, no JAX_PLATFORMS."""
        r = _run_dryrun({'XLA_FLAGS': '--xla_force_host_platform_device_count=8'})
        assert r.returncode == 0, r.stderr[-2000:]
        assert 'dryrun_multichip(8): OK' in r.stdout

    def test_no_env_at_all(self):
        """Falls back to jax_num_cpu_devices when the driver sets nothing."""
        r = _run_dryrun({})
        assert r.returncode == 0, r.stderr[-2000:]
        assert 'dryrun_multichip(8): OK' in r.stdout
