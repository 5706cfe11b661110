from . import handlers
from .aspect_ratio import aspect_ratio_aug, crop_resize, sample_crop, sample_resize
from .checkpoint import CheckpointManager, load_checkpoint, save_checkpoint
from .heavy_logger import HeavyLogger, make_grid
from .loop import MonoDepthLoop, TrainingManager
from .train_metrics import compute_train_metrics
from .trainer import MonoDepthTrainer, TrainState

__all__ = [
    'handlers',
    'aspect_ratio_aug', 'crop_resize', 'sample_crop', 'sample_resize',
    'CheckpointManager', 'load_checkpoint', 'save_checkpoint',
    'HeavyLogger', 'make_grid',
    'MonoDepthLoop', 'TrainingManager',
    'compute_train_metrics',
    'MonoDepthTrainer', 'TrainState',
]
