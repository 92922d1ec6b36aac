from .session import get_spark
from .percolate import percolate

__all__ = ["get_spark", "percolate"]
