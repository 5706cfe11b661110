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
    import torch.nn as _nn

    class _Metric(_nn.Module):  # torchmetrics.Metric stand-in (subclassed by ref metrics).
        full_state_update = False

        def __init__(self, **kw):
            super().__init__()

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


def install_timm_resnet18():
    """Back the `timm` stub with a REAL torch resnet18 `features_only` model.

    The environment has no timm, so `import_reference()` stubs
    `timm.create_model` to return None — enough for code that never builds an
    encoder. Full-trainer differentials need the reference networks to
    actually run, so this installs a faithful torch implementation of timm's
    `resnet18` feature backbone: same architecture (torchvision/timm ResNet-18
    stem + 4 BasicBlock stages), same `features_only=True` contract (5 maps at
    strides [2, 4, 8, 16, 32]: act1, layer1..layer4 — timm feature_info), and
    the same state-dict key layout (`conv1.weight`, `layer1.0.conv1.weight`,
    `layer1.0.downsample.0.weight`, ...) so `import_torch.convert_resnet`
    applies unchanged. Returns the create_model function.
    """
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + identity)

    class _FeatureInfo:
        def channels(self):
            return [64, 64, 128, 256, 512]

        def reduction(self):
            return [2, 4, 8, 16, 32]

    class ResNet18Features(nn.Module):
        def __init__(self, in_chans=3):
            super().__init__()
            self.conv1 = nn.Conv2d(in_chans, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.act1 = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)

            def stage(cin, cout, stride):
                return nn.Sequential(BasicBlock(cin, cout, stride),
                                     BasicBlock(cout, cout))

            self.layer1 = stage(64, 64, 1)
            self.layer2 = stage(64, 128, 2)
            self.layer3 = stage(128, 256, 2)
            self.layer4 = stage(256, 512, 2)
            self.feature_info = _FeatureInfo()

        def forward(self, x):
            x = self.act1(self.bn1(self.conv1(x)))
            feats = [x]
            x = self.maxpool(x)
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
                feats.append(x)
            return feats

    def create_model(name, features_only=True, pretrained=False, in_chans=3, **kw):
        if name != 'resnet18' or not features_only or pretrained:
            raise NotImplementedError(
                f'shim only supports resnet18 features_only random-init (got {name})')
        return ResNet18Features(in_chans=in_chans)

    _stub('timm', create_model=create_model)
    return create_model


def make_create_optimizer_v2():
    """Faithful `timm.optim.create_optimizer_v2` for opt in {'adamw', 'adam'}.

    Replicates timm 0.6.x semantics the reference relies on
    (`src/tools/parsers.py:243`): given an `nn.Module` with non-zero weight
    decay and the default `filter_bias_and_bn=True`, biases and ndim<=1
    params (norm scales/biases) go into a weight_decay=0 param group
    (`param_groups_weight_decay`); an explicit param-group list passes
    through unfiltered. The underlying optimizers match timm's: 'adamw' ->
    `torch.optim.AdamW`, 'adam' -> `torch.optim.Adam`.
    """
    import torch
    import torch.nn as nn

    opts = {'adamw': torch.optim.AdamW, 'adam': torch.optim.Adam}

    def create_optimizer_v2(model_or_params, opt='sgd', lr=None,
                            weight_decay=0.0, filter_bias_and_bn=True, **kw):
        if opt not in opts:
            raise NotImplementedError(f'shim only supports {set(opts)} (got {opt})')
        params = model_or_params
        if isinstance(model_or_params, nn.Module):
            if weight_decay and filter_bias_and_bn:
                decay, no_decay = [], []
                for name, p in model_or_params.named_parameters():
                    if not p.requires_grad:
                        continue
                    dst = no_decay if (p.ndim <= 1 or name.endswith('.bias')) else decay
                    dst.append(p)
                params = [{'params': no_decay, 'weight_decay': 0.0},
                          {'params': decay, 'weight_decay': weight_decay}]
                weight_decay = 0.0
            else:
                params = model_or_params.parameters()
        return opts[opt](params, lr=lr, weight_decay=weight_decay, **kw)

    return create_optimizer_v2
