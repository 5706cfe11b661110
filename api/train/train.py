"""Full training entry point.

Equivalent of `api/train/train.py:13-134` (reference), on the TPU-native
stack: merged YAML cfg chain, tensorboard scalar logging, best/last orbax
checkpoints with monitor-based selection, run markers, resume/warm-start, and
data parallelism over all local devices via a 1-D mesh (LR auto-scaling by
devices x accumulation).

Usage:
    python api/train/train.py -c cfg/kbr/default.yaml cfg/kbr/base.yaml \
        -n kbr/base -v 42
"""
from __future__ import annotations

import random
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

try:
    import slowtv_monodepth_tpu  # noqa: F401
except ImportError:  # raw checkout without `pip install -e .`
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu import LOGGER  # noqa: E402
from slowtv_monodepth_tpu.config import load_merge_yaml  # noqa: E402
from slowtv_monodepth_tpu.core import HeavyLogger, MonoDepthLoop  # noqa: E402
from slowtv_monodepth_tpu.parallel import (  # noqa: E402
    initialize_distributed, make_mesh, process_info)
from slowtv_monodepth_tpu.paths import MODEL_ROOTS  # noqa: E402


class WandbWriter:
    """SummaryWriter-shaped adapter over `wandb.log` (ref `api/train/train.py:46-49`,
    WandbLogger). Exposes the three methods the loop/HeavyLogger drive:
    add_scalar / add_images (NCHW grid) / add_text."""

    def __init__(self, log_dir: Path, project: str = 'slowtv_monodepth_tpu',
                 name: str | None = None, wandb_module=None):
        if wandb_module is None:
            import wandb as wandb_module
        self._wandb = wandb_module
        self._run = wandb_module.init(project=project, name=name,
                                      dir=str(log_dir), resume=None)

    def add_scalar(self, tag, value, global_step=None):
        self._wandb.log({tag: float(value)}, step=global_step)

    def add_images(self, tag, imgs, global_step=None):
        import numpy as np
        imgs = np.asarray(imgs)  # (b, c, h, w) -> HWC wandb Images
        ims = [self._wandb.Image(np.transpose(im, (1, 2, 0))) for im in imgs]
        self._wandb.log({tag: ims}, step=global_step)

    def add_text(self, tag, text, global_step=None):
        self._wandb.log({tag: str(text)}, step=global_step)

    def close(self):
        self._wandb.finish()


def make_writer(kind: str, log_dir: Path, name: str | None = None):
    if kind == 'tensorboard':
        from tensorboardX import SummaryWriter
        return SummaryWriter(str(log_dir))
    if kind == 'wandb':
        try:
            import wandb  # noqa: F401
        except ImportError:
            LOGGER.warning('wandb unavailable; falling back to tensorboard.')
            from tensorboardX import SummaryWriter
            return SummaryWriter(str(log_dir))
        log_dir.mkdir(parents=True, exist_ok=True)
        return WandbWriter(log_dir, name=name)
    raise ValueError(f'Logger "{kind}" not supported. ({{tensorboard, wandb}})')


def main():
    parser = ArgumentParser(description='Monocular depth trainer (TPU).')
    parser.add_argument('--cfg-files', '-c', type=Path, nargs='*', required=True,
                        help='YAML config chain (default, override1, ...).')
    parser.add_argument('--ckpt-dir', '-o', default=MODEL_ROOTS[-1], type=Path)
    parser.add_argument('--name', '-n', required=True, type=str)
    parser.add_argument('--version', '-v', default=0, type=int)
    parser.add_argument('--seed', '-s', default=42, type=int)
    parser.add_argument('--devices', '-g', default=None, type=int,
                        help='Devices in the data mesh (default: all).')
    parser.add_argument('--spatial-shards', default=1, type=int,
                        help='Shard image HEIGHTS over this many of the '
                             'devices (activation sharding via conv halo '
                             'exchange, for resolutions whose train step '
                             'OOMs one chip; `parallel/spatial.py`). Must '
                             'divide the device count.')
    args = parser.parse_args()

    LOGGER.info(f'Creating config from {[f.name for f in args.cfg_files]}...')
    cfg = load_merge_yaml(*args.cfg_files)
    cfg['seed'] = args.seed
    cfg.setdefault('loader', {})['seed'] = args.seed
    random.seed(args.seed)
    np.random.seed(args.seed)

    version = f'{args.version:03}'
    save_dir = Path(args.ckpt_dir) / args.name / version
    save_dir.mkdir(parents=True, exist_ok=True)

    writer = make_writer(cfg.get('trainer', {}).get('logger', 'tensorboard'),
                         save_dir / 'logs', name=f'{args.name}_{version}')

    initialize_distributed()  # No-op single host; joins TPU pods otherwise.
    import jax
    n_dev = args.devices or len(jax.devices())
    sp = max(args.spatial_shards or 1, 1)
    if sp > 1:
        if n_dev % sp:
            raise SystemExit(f'--spatial-shards {sp} must divide the device '
                             f'count {n_dev}.')
        mesh = make_mesh((n_dev // sp, sp), ('data', 'spatial'))
        LOGGER.info(f'Mesh: {n_dev // sp} data x {sp} spatial shards.')
    else:
        mesh = make_mesh(args.devices) if (args.devices or len(jax.devices()) > 1) else None
        if mesh is not None:
            LOGGER.info(f'Data-parallel mesh over {mesh.devices.size} devices.')
    shard_id, num_shards = process_info()

    loop = MonoDepthLoop(cfg, ckpt_dir=save_dir / 'models', mesh=mesh, writer=writer,
                         shard_id=shard_id, num_shards=num_shards,
                         heavy_logger=HeavyLogger(n_imgs=6, n_cols=2))
    loop.fit()


if __name__ == '__main__':
    main()
