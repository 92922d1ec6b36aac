"""Code-aware tokenization — one canonical rule shared by every path.

The token rule must be IDENTICAL in four places for correctness gates to
hold: (1) the pandas/Arrow UDF used by the indexer, (2) the pure-Spark SQL
brute-force BM25, (3) the DuckDB oracle SQL, (4) the pandas oracle. The
rule: lowercase, then maximal runs of ``[a-z0-9_]`` are tokens. This splits
code punctuation (``foo.bar(baz)`` → ``foo bar baz``) while keeping
identifiers with underscores whole.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# the one canonical rule
TOKEN_PATTERN = r"[a-z0-9_]+"
SPLIT_PATTERN = r"[^a-z0-9_]+"  # for split-style engines (Spark split / DuckDB)

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_text(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenization of a string Series → Series of token lists.

    Uses pandas' vectorized ``str`` ops (C-level loop over the Arrow
    buffer) rather than a per-row Python lambda.
    """
    return texts.str.lower().str.findall(TOKEN_PATTERN)


def term_frequencies(tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(unique_terms, counts) for one document's token list."""
    arr = np.asarray(tokens, dtype=object)
    terms, counts = np.unique(arr, return_counts=True)
    return terms, counts
