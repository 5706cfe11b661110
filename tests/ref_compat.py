"""Import helpers for differential tests against the PyTorch reference.

The reference at /root/reference is importable with torch(cpu) once its
optional heavy deps (skimage/kornia/timm/lmdb/wandb/lightning pieces) are
stubbed. Differential tests compare OUR JAX numerics against the reference's
actual torch implementation on identical inputs — far stronger than
hand-derived goldens.

Only used in tests; never imported by the framework.
"""
from __future__ import annotations

import sys
import types


def _stub(name: str, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__path__ = []  # Mark as package so submodule stubs resolve.
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    # Register as attribute of the parent package stub.
    if '.' in name:
        parent, child = name.rsplit('.', 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod


def import_reference():
    """Make `/root/reference` importable; returns the `src` package or None."""
    _stub('skimage')
    _stub('skimage.feature', canny=lambda *a, **k: None)
    _stub('skimage.transform', resize=lambda *a, **k: None)
    _stub('kornia')
    _stub('kornia.augmentation', ColorJiggle=object)
    _stub('kornia.geometry')
    _stub('kornia.geometry.transform', center_crop=lambda *a, **k: None)
    _stub('kornia.filters', gaussian_blur2d=lambda *a, **k: None)
    _stub('wandb')
    _stub('lmdb')
    class _Metric:  # torchmetrics.Metric stand-in (subclassed by ref metrics).
        full_state_update = False

        def __init__(self, **kw):
            pass

        def add_state(self, name, default=None, dist_reduce_fx=None):
            setattr(self, name, default)

    _stub('torchmetrics', Metric=_Metric)

    class _Callback:  # pl.Callback stand-in.
        pass

    _stub('pytorch_lightning', LightningModule=object, Callback=_Callback,
          seed_everything=lambda *a, **k: None)
    _stub('pytorch_lightning.callbacks', Callback=_Callback,
          TQDMProgressBar=object, RichProgressBar=object,
          ModelCheckpoint=object, LearningRateMonitor=object,
          RichModelSummary=object, StochasticWeightAveraging=object,
          EarlyStopping=object)
    _stub('pytorch_lightning.loggers', WandbLogger=object, TensorBoardLogger=object)
    _stub('torchvision')
    _stub('torchvision.utils', make_grid=lambda *a, **k: None)
    _stub('timm', create_model=lambda *a, **k: None)
    _stub('timm.optim')
    _stub('timm.optim.optim_factory', create_optimizer_v2=lambda *a, **k: None)
    _stub('timm.scheduler')

    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    try:
        import src  # noqa: F401
        return src
    except Exception:
        return None


def import_reference_newcrfs():
    """Make the reference's vendored NeWCRFs torch model importable.

    Adds eval-mode-faithful shims for its two extra deps: `timm.models.layers`
    (DropPath/to_2tuple/trunc_normal_) and `mmcv.cnn.ConvModule` (conv -> BN/GN
    -> ReLU with mmcv's auto-bias and 'bn'/'gn' attribute naming). Returns the
    `NewCRFDepth` class or None.
    """
    if import_reference() is None:
        return None
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):  # Identity in eval (we only compare eval mode).
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    _stub('timm.models')
    _stub('timm.models.layers', DropPath=DropPath, to_2tuple=to_2tuple,
          trunc_normal_=torch.nn.init.trunc_normal_)

    class ConvModule(nn.Module):
        def __init__(self, in_ch, out_ch, k, padding=0, conv_cfg=None,
                     norm_cfg=None, act_cfg=dict(type='ReLU'), **kw):
            super().__init__()
            self.conv = nn.Conv2d(in_ch, out_ch, k, padding=padding,
                                  bias=norm_cfg is None)
            self._norm = None
            if norm_cfg and norm_cfg['type'] == 'BN':
                self.bn = nn.BatchNorm2d(out_ch)
                self._norm = 'bn'
            elif norm_cfg and norm_cfg['type'] == 'GN':
                self.gn = nn.GroupNorm(min(norm_cfg['num_groups'], out_ch), out_ch)
                self._norm = 'gn'
            self._act = act_cfg is not None

        def forward(self, x):
            x = self.conv(x)
            if self._norm:
                x = getattr(self, self._norm)(x)
            return nn.functional.relu(x) if self._act else x

    _stub('mmcv')
    _stub('mmcv.cnn', ConvModule=ConvModule)
    _stub('torchvision.transforms', Compose=object)

    try:
        from src.external_libs.newcrfs.newcrfs.networks.NewCRFDepth import \
            NewCRFDepth
        return NewCRFDepth
    except Exception:
        return None
