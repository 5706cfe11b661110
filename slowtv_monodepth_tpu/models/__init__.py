from . import decoders  # noqa: F401  (populates DEC_REG)
from .depth import DepthNet
from .pose import PoseNet
from .autoencoder import AutoencoderNet
from .encoders import create_encoder, ENCODER_SPECS
from .newcrfs import NewCRFDepth
from .midas import MidasDPT

__all__ = ['DepthNet', 'PoseNet', 'AutoencoderNet', 'create_encoder',
           'ENCODER_SPECS', 'NewCRFDepth', 'MidasDPT']
