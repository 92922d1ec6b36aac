from .percolate_stream import percolate_stream

__all__ = ["percolate_stream"]
