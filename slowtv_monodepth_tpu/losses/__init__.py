from .photometric import DenseL1Error, DenseL2Error, SSIMError, PhotoError
from .reconstruction import ReconstructionLoss
from .regression import RegressionLoss, l1_loss, log_l1_loss, berhu_loss
from .regularizers import SmoothReg, FeatPeakReg, FeatSmoothReg, OccReg, MaskReg

__all__ = [
    'DenseL1Error', 'DenseL2Error', 'SSIMError', 'PhotoError',
    'ReconstructionLoss', 'RegressionLoss', 'l1_loss', 'log_l1_loss', 'berhu_loss',
    'SmoothReg', 'FeatPeakReg', 'FeatSmoothReg', 'OccReg', 'MaskReg',
]
