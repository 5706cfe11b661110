from .augment import ColorJiggle
from .base import BaseDataset, collate_items
from .base_mde import IMAGENET_MEAN, IMAGENET_STD, MdeBaseDataset, SuppImageNotFoundError
from .loader import ConcatDataLoader, DataLoader, ShardedSampler

# Concrete datasets (populate DATA_REG via @register).
from .eval_datasets import (DdadDataset, DiodeDataset, NyudDataset,
                            SintelDataset, TumDataset)
from .kitti_raw import KittiRawDataset
from .kitti_raw_pack import KittiRawPackDataset
from .mannequin import MannequinDataset
from .mannequin_pack import MannequinPackDataset
from .mapfreereloc import MapFreeRelocDataset
from .slow_tv import SlowTvDataset
from .slow_tv_pack import SlowTvPackDataset
from .syns_patches import SynsPatchesDataset

__all__ = [
    'ColorJiggle', 'BaseDataset', 'collate_items',
    'IMAGENET_MEAN', 'IMAGENET_STD', 'MdeBaseDataset', 'SuppImageNotFoundError',
    'ConcatDataLoader', 'DataLoader', 'ShardedSampler',
    'KittiRawDataset', 'MannequinDataset', 'MapFreeRelocDataset', 'SlowTvDataset',
    'SynsPatchesDataset', 'DdadDataset', 'DiodeDataset', 'NyudDataset',
    'SintelDataset', 'TumDataset',
]
