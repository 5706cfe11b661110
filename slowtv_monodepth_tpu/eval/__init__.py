from .edges import canny, extract_edges

__all__ = ['canny', 'extract_edges']
