"""Host-keyed persistent XLA compile-cache location.

JAX's persistent compilation cache stores AOT executables that are specific
to the machine they were compiled on (CPU feature set, accelerator kind) and
to the XLA flag set in effect. Sharing one cache directory across hosts or
flag variants loads executables built for a *different* machine — XLA only
warns (`cpu_aot_loader ... could lead to execution errors such as SIGILL`)
and the program can then wedge or crash at runtime, which is exactly how the
round-2 multi-chip dry run died (rc 134 at the first collective after
loading a cache compiled on another host).

The fix is structural: caches live under the OS temp dir (host-local, never
inside the repo worktree, which may move between machines), in a directory
keyed by a fingerprint of everything that makes an executable non-portable:
machine architecture, CPU feature flags, JAX version, and the ambient
XLA_FLAGS. A cache can therefore only ever be re-read by a process it is
valid for; anything else gets a fresh empty dir and a clean cold compile.
"""
from __future__ import annotations

import hashlib
import os
import platform
import tempfile

__all__ = ['host_keyed_cache_dir', 'enable_persistent_cache']


def _cpu_feature_fingerprint() -> str:
    """Hash of the CPU feature flags (the avx512/amx set that poisoned r02)."""
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('flags', 'Features')):
                    return hashlib.sha256(
                        ' '.join(sorted(line.split(':', 1)[1].split())).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    return 'unknown'


def host_keyed_cache_dir(tag: str) -> str:
    """Cache dir under $TMPDIR keyed by host/toolchain/flag fingerprint.

    :param tag: Namespace for the cache (e.g. 'bench', 'tests') so runs with
        different jit graphs don't interleave eviction.
    """
    import jax  # Deferred: importers may need to set jax.config first.

    key = hashlib.sha256('|'.join((
        platform.machine(),
        _cpu_feature_fingerprint(),
        jax.__version__,
        os.environ.get('XLA_FLAGS', ''),
    )).encode()).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), 'slowtv_tpu_jax_cache',
                        f'{tag}-{key}')
    os.makedirs(path, exist_ok=True)
    return path


def enable_persistent_cache(tag: str) -> str:
    """Point JAX's persistent compile cache at the host-keyed dir; return it."""
    import jax

    path = host_keyed_cache_dir(tag)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    return path
