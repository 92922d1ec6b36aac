"""Error types for the koncorde_spark DSL parser.

Mirrors the error surface of the reference percolator
(/root/reference/lib/types/KoncordeParseError.ts): parse errors carry the
offending keyword and the filter path where validation failed.
"""

from __future__ import annotations


class KoncordeError(Exception):
    """Base error for koncorde_spark."""


class KoncordeParseError(KoncordeError):
    """Raised when a filter fails DSL validation.

    Parameters mirror the reference constructor: message, keyword, path.
    """

    def __init__(self, message: str, keyword: str | None = None, path: str | None = None):
        self.keyword = keyword
        self.path = path
        prefix = f'"{path}": ' if path else ""
        super().__init__(f"{prefix}{message}")
