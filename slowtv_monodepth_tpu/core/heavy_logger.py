"""End-of-epoch image logging (ref `src/core/heavy_logger.py:14-210`).

Re-runs the forward/loss pass on the cached last batch and writes image grids
(inputs, disparities, warped supports, automasks, gradients, PCA'd features)
plus batch metadata text to the scalar writer (tensorboardX interface:
`add_images` NCHW + `add_text`).

Host-side numpy throughout; images come back from device once per epoch.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..data.base_mde import IMAGENET_MEAN, IMAGENET_STD
from ..tools import rgb_from_disp, rgb_from_feat

__all__ = ['HeavyLogger', 'make_grid']


def make_grid(imgs: np.ndarray, n: int = 6, n_cols: int = 2) -> np.ndarray:
    """(b, h, w, c) -> (1, c, H, W) NCHW grid (torchvision.make_grid role)."""
    imgs = np.asarray(imgs)[:n]
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    if imgs.shape[-1] == 1:
        imgs = np.repeat(imgs, 3, axis=-1)
    b, h, w, c = imgs.shape
    n_rows = (b + n_cols - 1) // n_cols
    grid = np.zeros((n_rows * h, n_cols * w, c), imgs.dtype)
    for i in range(b):
        r, col = divmod(i, n_cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = imgs[i]
    return np.clip(grid, 0, 1).transpose(2, 0, 1)[None]


def _unstandardize(x: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(x) * IMAGENET_STD + IMAGENET_MEAN, 0, 1)


class HeavyLogger:
    """:param n_imgs: Max images per grid. :param n_cols: Grid columns."""

    def __init__(self, n_imgs: int = 6, n_cols: int = 2):
        self.n = n_imgs
        self.n_cols = n_cols
        self.mode = 'train'
        self.step = 0
        self.writer = None

    def _grid(self, x) -> np.ndarray:
        return make_grid(np.asarray(x), self.n, self.n_cols)

    def write_images(self, d: dict) -> None:
        for k, v in d.items():
            self.writer.add_images(f'{self.mode}_{k}', v, global_step=self.step)

    def write_text(self, d: dict) -> None:
        for k, v in d.items():
            self.writer.add_text(f'{self.mode}_{k}', v, global_step=self.step)

    # ------------------------------------------------------------------ entry
    def log_step(self, trainer, state, batch, supp_idxs: tuple, writer,
                 epoch: int, mode: str = 'train',
                 rng: Optional[jax.Array] = None) -> None:
        """Re-run the step on `batch` and log all artifacts
        (ref `heavy_logger.py:75-88`)."""
        if writer is None or not hasattr(writer, 'add_images'):
            return
        self.mode, self.step, self.writer = mode, epoch, writer

        x, y, m = batch
        rng = rng if rng is not None else jax.random.PRNGKey(epoch)
        _, (loss_dict, fwd, _) = trainer.loss_fn(
            state.params, state.aux, x, y, tuple(supp_idxs), rng, train=False)
        fwd = jax.device_get(fwd)
        loss_dict = jax.device_get(loss_dict)

        self.log_batch(batch, supp_idxs)
        self.log_fwd(fwd, supp_idxs)
        self.log_loss(loss_dict, supp_idxs)

    # ------------------------------------------------------------------ parts
    def log_batch(self, batch, supp_idxs) -> None:
        """Input grids + metadata text (ref `heavy_logger.py:90-131`)."""
        x, y, m = batch
        if self.mode == 'train':
            self.write_images({
                'imgs_aug/target': self._grid(_unstandardize(x['imgs'])),
                **{f'imgs_aug/supp_{i}': self._grid(_unstandardize(im))
                   for i, im in zip(supp_idxs, np.asarray(x['supp_imgs']))},
            })
        self.write_images({
            'imgs/target': self._grid(y['imgs']),
            **{f'imgs/supp_{i}': self._grid(im)
               for i, im in zip(supp_idxs, np.asarray(y['supp_imgs']))},
        })
        if (depth := y.get('depth')) is not None:
            self.write_images({'depth/lidar': self._grid(
                rgb_from_disp(np.asarray(depth)[..., 0], invert=True))})
        if (depth := y.get('depth_hints')) is not None:
            self.write_images({'depth/hints': self._grid(
                rgb_from_disp(np.asarray(depth)[..., 0], invert=True))})

        txt = {}
        for key in ('items', 'items_original', 'supp', 'errors', 'augs'):
            vals = m.get(key)
            if vals is not None and any(str(v) for v in np.atleast_1d(vals)):
                txt[key] = ' - '.join(str(v) for v in np.atleast_1d(vals))
        if txt:
            self.write_text(txt)

    def log_fwd(self, fwd: dict, supp_idxs) -> None:
        """Network outputs: disparities, masks, features
        (ref `heavy_logger.py:133-159`)."""
        imgs = {}
        if 'disp' in fwd:
            imgs['pred/disp'] = self._grid(rgb_from_disp(fwd['disp'][0][..., 0]))
        if 'disp_stereo' in fwd:
            imgs['pred/disp_stereo'] = self._grid(rgb_from_disp(fwd['disp_stereo'][0][..., 0]))
        if 'mask' in fwd:
            for j, i in enumerate(supp_idxs):
                if fwd['mask'][0].shape[-1] > j:
                    imgs[f'pred/mask_{i}'] = self._grid(fwd['mask'][0][..., j:j + 1])
        if 'autoenc_imgs' in fwd:
            imgs['pred/autoenc'] = self._grid(fwd['autoenc_imgs'][0])
        if 'depth_feats' in fwd:
            imgs['pred/feats'] = self._grid(rgb_from_feat(fwd['depth_feats'][0]))
        self.write_images(imgs)

    def log_loss(self, ld: dict, supp_idxs) -> None:
        """Loss artifacts: warps, automasks, gradients
        (ref `heavy_logger.py:161-210`)."""
        imgs = {}
        if 'supp_imgs_warp' in ld:
            for i, w in zip(supp_idxs, ld['supp_imgs_warp']):
                imgs[f'loss/warp_{i}'] = self._grid(w)
        if 'automask' in ld:
            imgs['loss/automask'] = self._grid(np.asarray(ld['automask'], np.float32))
        if 'automask_hints' in ld:
            imgs['loss/automask_hints'] = self._grid(
                np.asarray(ld['automask_hints'], np.float32))
        if 'disp_grad' in ld:
            imgs['loss/disp_grad'] = self._grid(rgb_from_disp(ld['disp_grad'][..., 0]))
        if 'image_grad' in ld:
            imgs['loss/image_grad'] = self._grid(rgb_from_disp(ld['image_grad'][..., 0]))
        if 'supp_feats_warp' in ld:
            imgs['loss/feat_warp'] = self._grid(rgb_from_feat(ld['supp_feats_warp'][0]))
        self.write_images(imgs)
