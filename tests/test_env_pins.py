"""Environment-pin guard (VERDICT r04 missing #2).

The differential-test baselines (torch-parity suites, trajectory
differentials, converter round-trips) are only meaningful for the library
versions they were validated against — the reference pins its numerics the
same way via `docker/environment.yml`. This test compares the live
environment to `tests/validated_versions.yaml`:

- exact match        -> pass (the validated configuration)
- patch-level drift  -> pass with a warning (numerics-stable by convention)
- minor/major drift  -> FAIL, naming the drifted package, so a silent
                        numerics shift cannot masquerade as a framework
                        regression. Re-validate, then regenerate the pins:
                        `python tests/test_env_pins.py --update`.
"""
import sys
import warnings
from importlib import metadata
from pathlib import Path

import yaml

PINS_FILE = Path(__file__).parent / 'validated_versions.yaml'
PACKAGES = ('jax', 'jaxlib', 'flax', 'optax', 'chex', 'orbax-checkpoint',
            'numpy', 'torch', 'einops')


def _live_versions() -> dict:
    vers = {'python': '.'.join(map(str, sys.version_info[:2]))}
    for pkg in PACKAGES:
        try:
            vers[pkg] = metadata.version(pkg)
        except metadata.PackageNotFoundError:
            vers[pkg] = None
    return vers


def _minor(v: str) -> tuple:
    parts = str(v).split('+')[0].split('.')
    return tuple(parts[:2])


def test_validated_versions():
    pins = yaml.safe_load(PINS_FILE.read_text())
    live = _live_versions()
    drifted = []
    for pkg, pinned in pins.items():
        cur = live.get(pkg)
        if cur is None:
            drifted.append(f'{pkg}: pinned {pinned}, not installed')
            continue
        if str(cur) == str(pinned):
            continue
        if _minor(cur) == _minor(pinned):
            warnings.warn(f'{pkg} patch drift: validated {pinned}, '
                          f'running {cur} (baselines assumed stable)')
            continue
        drifted.append(f'{pkg}: validated against {pinned}, running {cur}')
    assert not drifted, (
        'Differential-test baselines were validated against different '
        'library versions:\n  ' + '\n  '.join(drifted) +
        '\nRe-run the parity suites, then refresh the pins with '
        '`python tests/test_env_pins.py --update`.')


if __name__ == '__main__':
    if '--update' in sys.argv:
        live = _live_versions()
        header = PINS_FILE.read_text().split('\npython:')[0]
        body = yaml.safe_dump({k: v for k, v in live.items() if v},
                              sort_keys=False)
        PINS_FILE.write_text(header + '\n' + body)
        print(f'Updated {PINS_FILE}:\n{body}')
    else:
        test_validated_versions()
        print('Environment matches the validated pins.')
