from .monodepth import MonodepthDecoder
from .hrdepth import HRDepthDecoder
from .ddvnet import DDVNetDecoder
from .diffnet import DiffNetDecoder
from .cadepth import CaDepthDecoder
from .superdepth import SuperdepthDecoder
from .dpt import DptDecoder

__all__ = ['MonodepthDecoder', 'HRDepthDecoder', 'DDVNetDecoder', 'DiffNetDecoder',
           'CaDepthDecoder', 'SuperdepthDecoder', 'DptDecoder']
