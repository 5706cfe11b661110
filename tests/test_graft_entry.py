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
        # The spatial step must partition cleanly: no SPMD full-remat
        # fallback (r03 weak #4; fixed by the spatial sharding hints in
        # `ops/dispatch.constrain_spatial`).
        assert 'Involuntary full rematerialization' not in r.stderr, (
            [ln for ln in r.stderr.splitlines() if 'rematerial' in ln][:1])

    def test_no_env_at_all(self):
        """Falls back to jax_num_cpu_devices when the driver sets nothing."""
        r = _run_dryrun({})
        assert r.returncode == 0, r.stderr[-2000:]
        assert 'dryrun_multichip(8): OK' in r.stdout

    def test_poisoned_persistent_cache_is_ignored(self):
        """Round-2 regression: a stale `.jax_cache_cpu` in the worktree must
        neither be read nor written.

        Round 2 configured `jax_compilation_cache_dir=<repo>/.jax_cache_cpu`;
        the shipped dir held AOT executables compiled on a host with different
        CPU features, and loading them wedged the 8-device program at its
        first collective (MULTICHIP_r02.json, rc 134). The dry run now always
        cold-compiles: even with the env var set AND a poisoned dir present,
        it must succeed and leave the dir untouched.
        """
        cache = REPO / '.jax_cache_cpu'
        existed = cache.exists()
        try:
            cache.mkdir(exist_ok=True)
            poison = cache / 'jit__train_step-poisoned'
            poison.write_bytes(b'\x00not-an-executable\x00')
            before = sorted(p.name for p in cache.iterdir())
            r = _run_dryrun({
                'XLA_FLAGS': '--xla_force_host_platform_device_count=8',
                'JAX_COMPILATION_CACHE_DIR': str(cache),
            })
            assert r.returncode == 0, r.stderr[-2000:]
            assert 'dryrun_multichip(8): OK' in r.stdout
            after = sorted(p.name for p in cache.iterdir())
            assert after == before, f'dryrun touched the cache dir: {after}'
        finally:
            poison.unlink(missing_ok=True)
            if not existed and cache.exists() and not any(cache.iterdir()):
                cache.rmdir()
