from .corpus import (
    corpus_from_documents,
    load_corpus,
    synthetic_corpus_df,
    synthetic_corpus_pandas,
)

__all__ = [
    "corpus_from_documents",
    "load_corpus",
    "synthetic_corpus_df",
    "synthetic_corpus_pandas",
]
