from .misc import flatten_dict, sort_dict, get_logger
from .timers import Timer, MultiLevelTimer

__all__ = ['flatten_dict', 'sort_dict', 'get_logger', 'Timer', 'MultiLevelTimer']
