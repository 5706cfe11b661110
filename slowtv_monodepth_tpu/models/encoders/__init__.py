"""Feature-pyramid encoders (the timm `features_only=True` equivalent).

The reference builds encoders with `timm.create_model(name,
features_only=True)` (`src/networks/depth.py:95-98`). Here each encoder is a
native Flax module returning the multi-scale feature list plus static
`channels`/`reductions` metadata; `create_encoder` is the factory the networks
use. Pretrained timm/torch weights are imported via
`import_torch.convert_state_dict` when a checkpoint file is supplied.
"""
from .resnet import ResNetEncoder, RESNET_SPECS
from .convnext import ConvNeXtEncoder, CONVNEXT_SPECS
from .vit import ViTEncoder, VIT_SPECS
from .swin import SwinEncoder, SWIN_SPECS
from .beit import BeitEncoder, BEIT_SPECS
from .mbnet import MBNetEncoder, MBNET_SPECS
from .hrnet import HRNetEncoder, HRNET_SPECS
from .toy import ToyEncoder, TOY_SPECS

__all__ = ['create_encoder', 'ENCODER_SPECS', 'ResNetEncoder', 'ConvNeXtEncoder',
           'ViTEncoder', 'SwinEncoder', 'BeitEncoder', 'MBNetEncoder',
           'HRNetEncoder', 'ToyEncoder', 'RESNET_SPECS', 'CONVNEXT_SPECS',
           'VIT_SPECS', 'SWIN_SPECS', 'BEIT_SPECS', 'MBNET_SPECS', 'HRNET_SPECS',
           'TOY_SPECS']

ENCODER_SPECS = {**RESNET_SPECS, **CONVNEXT_SPECS, **VIT_SPECS, **SWIN_SPECS,
                 **BEIT_SPECS, **MBNET_SPECS, **HRNET_SPECS, **TOY_SPECS}


def create_encoder(name: str, in_chans: int = 3, gelu: str = 'exact',
                   remat: str = ''):
    """Build an encoder module by timm-style name (e.g. 'resnet18', 'convnext_base').

    :param gelu: {'exact', 'tanh'} — GELU flavor for GELU-based encoders
        (ConvNeXt). 'tanh' is the TPU-fast training option (see
        `ConvNeXtEncoder` docstring); encoders without GELU ignore it.
    :param remat: {'', 'dots', 'full'} — per-block `jax.checkpoint` policy
        (ConvNeXt only; math-identical, trades HBM for recompute FLOPs).
    :return: (module, channels per stage, reduction per stage)
    """
    if gelu not in ('exact', 'tanh'):
        raise KeyError(f'Invalid gelu flavor. ({gelu} vs. ("exact", "tanh"))')
    if remat and name not in CONVNEXT_SPECS:
        raise KeyError(f'enc remat is only supported for ConvNeXt encoders '
                       f'(got "{name}").')
    if name in TOY_SPECS:
        spec = TOY_SPECS[name]
        enc = ToyEncoder(channels=spec['channels'], in_chans=in_chans)
    elif name in RESNET_SPECS:
        spec = RESNET_SPECS[name]
        enc = ResNetEncoder(block=spec['block'], layers=spec['layers'],
                            groups=spec.get('groups', 1),
                            width_per_group=spec.get('width_per_group', 64),
                            in_chans=in_chans)
    elif name in CONVNEXT_SPECS:
        spec = CONVNEXT_SPECS[name]
        enc = ConvNeXtEncoder(depths=spec['depths'], dims=spec['dims'], in_chans=in_chans,
                              gelu_approx=(gelu == 'tanh'), remat=remat)
    elif name in MBNET_SPECS:
        spec = MBNET_SPECS[name]
        enc = MBNetEncoder(stem=spec['stem'], stages=spec['stages'],
                           stem_act=spec['stem_act'], in_chans=in_chans)
    elif name in HRNET_SPECS:
        spec = HRNET_SPECS[name]
        enc = HRNetEncoder(width=spec['width'], in_chans=in_chans)
    elif name.removeprefix('dpt_') in SWIN_SPECS:
        spec = SWIN_SPECS[name.removeprefix('dpt_')]
        enc = SwinEncoder(embed_dim=spec['embed_dim'], depths=spec['depths'],
                          heads=spec['heads'], window=spec['window'],
                          v2=spec.get('v2', False), in_chans=in_chans)
    elif name.removeprefix('dpt_') in BEIT_SPECS:
        spec = BEIT_SPECS[name.removeprefix('dpt_')]
        enc = BeitEncoder(dim=spec['dim'], depth=spec['depth'], heads=spec['heads'],
                          hooks=spec['hooks'], channels=spec['channels'],
                          grid=spec['grid'], in_chans=in_chans)
    elif name.removeprefix('dpt_') in VIT_SPECS:
        # DPT-style ViT backbones ('dpt_' prefix kept for reference-cfg parity,
        # ref `api/quickstart/networks/depth.py:95-100`).
        spec = VIT_SPECS[name.removeprefix('dpt_')]
        enc = ViTEncoder(dim=spec['dim'], depth=spec['depth'], heads=spec['heads'],
                         hooks=spec['hooks'], channels=spec['channels'],
                         hybrid=spec.get('hybrid', False), in_chans=in_chans)
    else:
        raise KeyError(f'Unknown encoder "{name}". Available: {sorted(ENCODER_SPECS)}')
    return enc, list(spec['channels']), list(spec['reductions'])
