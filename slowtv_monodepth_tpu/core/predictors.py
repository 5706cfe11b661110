"""Dataset-level depth predictors (ref `src/core/predictors.py:22-284`).

Strategy classes that run a pretrained model over a DataLoader:
preprocess -> jitted forward -> postprocess -> (optional flip-blend) ->
stacked host array, with the per-dataset input-shape table and the all-zero
prediction sanity check (ref `:143-144`).

The TPU path jits one forward per input shape (cached thereafter); prediction
batches stream host->device with the output fetched per batch.

External-baseline predictors (`midas`, `newcrfs`, ref `:212-284`) depend on
torch-hub downloads; in this zero-egress environment they raise with a clear
message unless local weights are provided (capability documented, wiring kept).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import register
from ..models import DepthNet
from ..ops import blend_stereo, to_scaled
from ..utils import get_logger
from .checkpoint import load_checkpoint

__all__ = ['MonoDepthPredictor', 'BenchmarkPredictor', 'MidasPredictor',
           'NewcrfsPredictor']


def arg_jitted_forward(net, variables) -> Callable:
    """Jit `net.apply(variables, imgs, train=False)` with the variables passed
    as a runtime ARGUMENT, returning an `imgs -> outputs` callable.

    Closing over the (possibly mesh-placed) variables would embed them as
    compile-time constants; under SPMD partitioning XLA folds and lays out
    constants per-partition and the forward reassociates — measured 2e-2-class
    drift on a random-init DepthNet over a spatial mesh, vs 2e-5 when the
    variables arrive as an argument (`tests/test_spatial.py`). Arguments also
    keep their committed shardings (replicated or tensor-sharded,
    `parallel/tp.py`) without re-placement per call.
    """
    jfwd = jax.jit(lambda v, imgs: net.apply(v, imgs, train=False))
    return lambda imgs: jfwd(variables, imgs)


class MonoDepthPredictor(ABC):
    """Base predictor: preprocess -> forward -> postprocess over a loader.

    :param mesh: Optional `jax.sharding.Mesh` — prediction batches shard over
        its `data` axis (single-axis meshes shard over that axis), scaling
        dataset export ~linearly with chip count. A mesh with a `model` axis
        additionally tensor-shards the network weights (`parallel/tp.py`) for
        encoders too big to replicate per chip at eval resolution; a mesh
        with a `spatial` axis shards the image HEIGHT over it
        (`parallel/spatial.py` — XLA partitions the convs with halo
        exchanges), for resolutions whose activations don't fit one chip.
        Partial final batches are edge-padded to a mesh multiple and sliced
        back. The reference evaluates single-GPU only; `None` keeps that
        exact single-device behavior.
    """

    def __init__(self, mesh=None):
        self.mesh = mesh

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        cls.logger = get_logger(cls.__qualname__)

    @property
    def _batch_axis(self) -> Optional[str]:
        """Mesh axis the batch dim shards over: `data`, or the sole axis of a
        1-D mesh when it isn't a special (`model`/`spatial`) axis."""
        names = self.mesh.axis_names
        if 'data' in names:
            return 'data'
        if len(names) == 1 and names[0] not in ('model', 'spatial'):
            return names[0]
        return None

    @property
    def _data_shards(self) -> int:
        """Batch-axis shard count (1 for model/spatial-only meshes)."""
        axis = self._batch_axis
        return int(self.mesh.shape[axis]) if axis else 1

    def _place_variables(self, variables):
        """Place model variables onto the mesh: replicated, or tensor-sharded
        over a `model` mesh axis when one is present (no-op single-device)."""
        if self.mesh is None:
            return variables
        if 'model' in self.mesh.axis_names and self.mesh.shape['model'] > 1:
            from ..parallel import shard_variables_tp
            return shard_variables_tp(self.mesh, variables)
        from ..parallel import replicated
        return jax.device_put(variables, replicated(self.mesh))

    def _run_forward(self, net: Callable, imgs) -> jnp.ndarray:
        """Host batch -> prediction, sharded over the mesh when present."""
        if self.mesh is None:
            return self.forward(net, jnp.asarray(imgs))
        from ..parallel import shard_batch_spatial
        imgs = np.asarray(imgs)
        pad = (-len(imgs)) % self._data_shards
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
        placed = shard_batch_spatial(self.mesh, imgs,
                                     data_axis=self._batch_axis or 'data')
        pred = self.forward(net, placed)
        return pred[:len(pred) - pad] if pad else pred

    @abstractmethod
    def load_model(self, *args, **kwargs):
        """Load a pretrained model; returns a callable imgs -> raw prediction."""

    @staticmethod
    def get_img_shape(data_type: str) -> Optional[tuple]:
        """Per-dataset input shape (None = native)."""
        return None

    def preprocess(self, imgs: np.ndarray) -> np.ndarray:
        return imgs

    def forward(self, net: Callable, imgs: jnp.ndarray) -> jnp.ndarray:
        return net(imgs)

    def postprocess(self, pred: jnp.ndarray, imgs: np.ndarray) -> jnp.ndarray:
        return pred

    def forward_batch(self, x: dict, net: Callable,
                      use_stereo_blend: bool = False) -> jnp.ndarray:
        imgs = self.preprocess(x['imgs'])
        pred = self._run_forward(net, imgs)
        if use_stereo_blend:
            pred_flip = self._run_forward(net, np.asarray(imgs)[:, :, ::-1])
            pred = blend_stereo(pred, pred_flip[:, :, ::-1])
        return self.postprocess(pred, x['imgs'])

    def apply(self, net: Callable, dl, func: Callable,
              use_stereo_blend: bool = False, *args, **kwargs) -> None:
        """Run over the loader, applying `func(batch, pred, ...)` per batch
        (ref `predictors.py:88-114`; used by the mapfree pipeline)."""
        for batch in dl:
            pred = self.forward_batch(batch[0], net, use_stereo_blend)
            if pred.ndim != 4:
                raise ValueError(f'Prediction must be 4-D, got {pred.shape}!')
            func(batch, np.asarray(pred), *args, **kwargs)

    def __call__(self, net: Callable, dl, use_stereo_blend: bool = False) -> np.ndarray:
        """Predict the whole dataset -> (n, h, w) array (ref `:116-147`)."""
        ds = dl.dataset
        preds = np.zeros((len(ds), ds.h, ds.w, 1), np.float32)
        i = 0
        for x, *_ in dl:
            pred = self.forward_batch(x, net, use_stereo_blend)
            if pred.ndim != 4:
                raise ValueError(f'Prediction must be 4-D, got {pred.shape}!')
            b = pred.shape[0]
            preds[i:i + b] = np.asarray(pred)
            i += b

        sanity = preds.reshape(len(preds), -1).sum(1)
        if len(idxs := np.nonzero(sanity == 0)[0]):
            raise ValueError(f"Found empty predictions at indices '{idxs}'!")
        return preds.squeeze(-1)


@register('ours')
class BenchmarkPredictor(MonoDepthPredictor):
    """Predictor for this framework's checkpoints (ref `:152-207`)."""

    @staticmethod
    def get_img_shape(data_type: str) -> tuple:
        """Fixed width 640 (mapfree portrait 384), height per dataset."""
        return {
            'ddad': (416, 640),
            'diode': (480, 640),
            'kitti': (192, 640),
            'kitti_lmdb': (192, 640),
            'mannequin': (384, 640),
            'mannequin_lmdb': (384, 640),
            'mapfree': (512, 384),
            'nyud': (480, 640),
            'sintel': (288, 640),
            'syns_patches': (192, 640),
            'tum': (480, 640),
        }[data_type]

    def load_model(self, ckpt_file, cfg_files=None) -> Callable:
        """Rebuild the depth net from a checkpoint's embedded cfg and return a
        jitted `imgs -> {disp, ...}` callable."""
        self.logger.info(f"Loading pretrained weights from '{ckpt_file}'...")
        state, meta = load_checkpoint(ckpt_file)
        cfg = meta['cfg']
        if cfg_files:
            from ..config import load_merge_yaml
            cfg = load_merge_yaml(*cfg_files)

        tcfg = cfg.get('trainer', {})
        self.min_depth = tcfg.get('min_depth')
        self.max_depth = tcfg.get('max_depth')

        kw = {k: tuple(v) if isinstance(v, list) else v
              for k, v in cfg['net']['depth'].items()}
        net = DepthNet(**kw)
        variables = {'params': state.params['depth'], **state.aux.get('depth', {})}
        variables = self._place_variables(variables)
        return arg_jitted_forward(net, variables)

    def forward(self, net: Callable, imgs: jnp.ndarray) -> jnp.ndarray:
        return net(imgs)['disp'][0]

    def postprocess(self, pred: jnp.ndarray, imgs: np.ndarray) -> jnp.ndarray:
        if self.min_depth or self.max_depth:
            pred = to_scaled(pred, min=0.1, max=100)[0]
        return pred


@register('midas')
class MidasPredictor(MonoDepthPredictor):
    """MiDaS/DPT baseline (ref `:254-284`).

    The architecture is native (`models.MidasDPT`); weights come from the
    released intel-isl `DPT_Large` checkpoint placed under a model root as
    `midas/<name>.pt` (or an `.npz` export), since this environment has no
    torch-hub egress. Predicts scaleless disparity, bicubic-resized back to
    the dataset resolution (ref `:277-284`).
    """

    WEIGHT_FILES = {'DPT_Large': 'midas/dpt_large-midas-2f21e586'}

    def load_model(self, name: str) -> Callable:
        from ..models.import_midas import convert_midas_dpt, load_midas_state_dict
        from ..models.midas import MidasDPT
        from ..paths import MODEL_ROOTS

        if name not in self.WEIGHT_FILES:
            raise ValueError(f'Unsupported MiDaS variant "{name}". '
                             f'({sorted(self.WEIGHT_FILES)})')
        stem = self.WEIGHT_FILES[name]
        files = [root / f'{stem}{ext}' for root in MODEL_ROOTS
                 for ext in ('.npz', '.pt', '.pth')]
        path = next((f for f in files if f.is_file()), None)
        if path is None:
            raise FileNotFoundError(
                f'MiDaS "{name}" weights not found. Download the released '
                f'checkpoint (torch-hub intel-isl/MiDaS) and place it at '
                f'"<model_root>/{stem}.pt". Searched: {[str(f) for f in files]}')

        self.logger.info(f"Loading MiDaS weights from '{path}'...")
        variables = self._place_variables(
            convert_midas_dpt(load_midas_state_dict(path)))
        return arg_jitted_forward(MidasDPT(), variables)

    def preprocess(self, imgs: np.ndarray) -> np.ndarray:
        """MiDaS normalization: undo ImageNet standardization, renorm with
        mean=std=0.5, and resize so the smaller scale change hits a
        multiple-of-32 shape near 384 (dpt_transform, 'minimal' mode)."""
        from ..ops import unstandardize
        x = np.asarray(unstandardize(jnp.asarray(imgs)))
        x = (x - 0.5) / 0.5
        h, w = x.shape[1:3]
        scale = min((384 / h, 384 / w), key=lambda s: abs(1 - s))
        nh = max(32, int(round(h * scale / 32)) * 32)
        nw = max(32, int(round(w * scale / 32)) * 32)
        from ..ops import resize as _resize
        return np.asarray(_resize(jnp.asarray(x), (nh, nw), method='bicubic'))

    def postprocess(self, pred: jnp.ndarray, imgs: np.ndarray) -> jnp.ndarray:
        from ..ops import resize as _resize
        return _resize(pred, imgs.shape[1:3], method='bicubic')


@register('newcrfs')
class NewcrfsPredictor(MonoDepthPredictor):
    """NeWCRFs baseline (ref `:212-249`). Requires released checkpoints."""

    @staticmethod
    def get_img_shape(data_type: str) -> tuple:
        return {
            'ddad': (352, 576),
            'diode': (480, 640),
            'kitti': (352, 1216),
            'kitti_lmdb': (352, 1216),
            'mannequin': (384, 640),
            'mannequin_lmdb': (384, 640),
            'mapfree': (512, 384),
            'nyud': (480, 640),
            'sintel': (352, 800),
            'syns_patches': (352, 1216),
            'tum': (480, 640),
        }[data_type]

    def load_model(self, scene_type: str) -> Callable:
        """Build the native `NewCRFDepth` and graft the released checkpoint
        (`model_nyu.ckpt` / `model_kittieigen.ckpt`, ref
        `src/external_libs/newcrfs/tools.py:14-48`)."""
        from ..models.import_newcrfs import convert_newcrfs, load_newcrfs_state_dict
        from ..models.newcrfs import NewCRFDepth
        from ..paths import MODEL_PATHS

        if scene_type not in ('indoor', 'outdoor'):
            raise ValueError(f'Invalid NeWCRFs model "{scene_type}". '
                             "({'indoor', 'outdoor'})")
        max_depth = 10.0 if scene_type == 'indoor' else 80.0

        from ..paths import MODEL_ROOTS
        name = 'model_nyu' if scene_type == 'indoor' else 'model_kittieigen'
        path = next((root / 'newcrfs' / f'{name}.npz' for root in MODEL_ROOTS
                     if (root / 'newcrfs' / f'{name}.npz').is_file()), None)
        if path is None:
            path = MODEL_PATHS[f'newcrfs_{scene_type}']
        self.logger.info(f"Loading NeWCRFs weights from '{path}'...")
        variables = self._place_variables(
            convert_newcrfs(load_newcrfs_state_dict(path)))
        return arg_jitted_forward(
            NewCRFDepth(version='large07', max_depth=max_depth), variables)

    def postprocess(self, pred: jnp.ndarray, imgs: np.ndarray) -> jnp.ndarray:
        """NeWCRFs predicts metric depth; convert to disparity (ref `:242-249`)."""
        from ..ops import to_inv
        return to_inv(pred)
