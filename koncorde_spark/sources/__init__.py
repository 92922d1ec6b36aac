from .corpus import synthetic_corpus_pandas, synthetic_corpus_df, corpus_from_documents

__all__ = ["corpus_from_documents", "synthetic_corpus_df", "synthetic_corpus_pandas"]
