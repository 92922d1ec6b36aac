from .percolate_stream import percolate_stream, windowed_match_counts
from .trending import trending_terms

__all__ = ["percolate_stream", "trending_terms", "windowed_match_counts"]
