from . import handlers
from .aspect_ratio import aspect_ratio_aug, crop_resize, sample_crop, sample_resize
from .train_metrics import compute_train_metrics
from .trainer import MonoDepthTrainer, TrainState

__all__ = [
    'handlers',
    'aspect_ratio_aug', 'crop_resize', 'sample_crop', 'sample_resize',
    'compute_train_metrics',
    'MonoDepthTrainer', 'TrainState',
]
