from .percolate_stream import percolate_stream, windowed_match_counts

__all__ = ["percolate_stream", "windowed_match_counts"]
