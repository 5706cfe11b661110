"""Debug training variant (ref `api/train/train_dev.py`).

Trains into /tmp with tight limits (10 epochs x 10 batches), per-step loss
printing, and non-finite-loss checks every step — the quick inner-loop
harness for iterating on losses/networks without touching real run dirs.

Usage:
    python api/train/train_dev.py -c cfg/kbr/default.yaml [overrides...]
"""
from __future__ import annotations

import math
import sys
import tempfile
from argparse import ArgumentParser
from pathlib import Path

import jax
import numpy as np

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu import LOGGER  # noqa: E402
from slowtv_monodepth_tpu.config import load_merge_yaml  # noqa: E402
from slowtv_monodepth_tpu.core import MonoDepthLoop  # noqa: E402


class DevLoop(MonoDepthLoop):
    """Loop variant with a per-epoch batch limit + per-step anomaly checks."""

    def __init__(self, *args, limit_batches: int = 10, **kwargs):
        super().__init__(*args, **kwargs)
        self.limit_batches = limit_batches

    def train_epoch(self, epoch: int) -> None:
        self.train_dl.set_epoch(epoch)
        rng = np.random.default_rng(epoch)
        for i, (x, y, m) in enumerate(self.train_dl):
            if i >= self.limit_batches:
                break
            if self.state is None:
                self._init_state((x, y, m))
            supp_idxs = tuple(int(v) for v in x.get('supp_idxs', ()))
            xb, yb = self._place(x, y)
            xb, yb, m = self.ar_aug((xb, yb, m))
            step = self._step_fn(supp_idxs, train=True)
            self.state, scalars = step(
                self.state, xb, yb, jax.random.PRNGKey(int(rng.integers(2 ** 31))))
            loss = float(scalars['loss'])  # Sync every step: dev mode.
            self.global_step += 1
            LOGGER.info(f'epoch {epoch} step {i}: loss={loss:.5f}')
            if not math.isfinite(loss):
                raise ValueError(f'Detected NaN/Infinite loss: "{loss}"')


def main():
    parser = ArgumentParser(description='Debug monocular depth trainer.')
    parser.add_argument('--cfg-files', '-c', type=Path, nargs='*', required=True)
    parser.add_argument('--epochs', default=10, type=int)
    parser.add_argument('--batches', default=10, type=int)
    parser.add_argument('--seed', '-s', default=42, type=int)
    args = parser.parse_args()

    cfg = load_merge_yaml(*args.cfg_files)
    cfg['seed'] = args.seed
    cfg.setdefault('trainer', {})['max_epochs'] = args.epochs
    cfg['trainer']['resume_training'] = False

    ckpt_dir = Path(tempfile.mkdtemp(prefix='slowtv_dev_'))
    LOGGER.info(f'Dev checkpoints -> {ckpt_dir}')
    loop = DevLoop(cfg, ckpt_dir=ckpt_dir, use_markers=False,
                   limit_batches=args.batches)
    loop.fit()


if __name__ == '__main__':
    main()
