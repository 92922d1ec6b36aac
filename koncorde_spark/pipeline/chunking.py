"""Document chunking and per-document keyword extraction.

The embedding-pipeline front door: long documents become overlapping
token-window chunks with stable (doc_id, chunk_idx) identities — the
unit a RAG/embedding stage actually encodes — and each document gets a
top-k tf·idf keyword set for tagging, routing, and cheap relevance
filters.

Scale shape: chunking is one Catalyst projection + one explode (no
shuffle, no UDF — sequence/slice/array_join stay in whole-stage
codegen); keyword extraction is one explode + two hash-aggs + a window
partitioned by doc_id (cardinality = corpus size, so no single-partition
WindowExec). Both carry DuckDB twins sharing the canonical tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..rounding import round_away
from .text import tokens_col, tokens_sql


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding token windows: chunk i covers tokens [i*stride, i*stride +
    chunk_tokens) with stride = chunk_tokens - overlap; the last chunk is
    partial rather than padded and no chunk is a suffix of its
    predecessor (every chunk introduces >= 1 new token; full chunks
    introduce exactly ``stride``). Token-free documents produce no
    chunks. Returns (id, chunk_idx,
    start_tok, n_toks, chunk_text) with chunk_text the space-joined
    token window (canonical tokens, not raw offsets — the form an
    embedding encoder consumes)."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col), tokens_col(text_col).alias("__t")
    ).withColumn("__n", F.size("__t"))
    n_chunks = F.when(F.col("__n") <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((F.col("__n") - F.lit(chunk_tokens)) / F.lit(stride)).cast("int")
        + F.lit(1)
    )
    out = (
        toks.where(F.col("__n") > 0)
        .select(
            F.col(id_col),
            F.col("__t"),
            F.col("__n"),
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("long").alias("start_tok"),
            F.least(
                F.lit(chunk_tokens),
                F.col("__n") - F.col("chunk_idx") * stride,
            ).cast("long").alias("n_toks"),
            F.array_join(
                F.slice(
                    F.col("__t"),
                    (F.col("chunk_idx") * stride + 1).cast("int"),
                    chunk_tokens,
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
    return out


def chunk_documents_sql(
    table: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same tokenizer, same
    stride/partial-last-chunk rule; list_slice is 1-based inclusive)."""
    stride = chunk_tokens - overlap
    return f"""
    WITH t AS (
      SELECT {id_col}, {tokens_sql(text_col)} AS toks
      FROM {table}
    ), sized AS (
      SELECT {id_col}, toks, len(toks) AS n,
             CASE WHEN len(toks) <= {chunk_tokens} THEN 1
                  ELSE CAST(ceil((len(toks) - {chunk_tokens}) / {stride}.0) AS INT) + 1
             END AS n_chunks
      FROM t WHERE len(toks) > 0
    )
    SELECT {id_col},
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(i * {stride} AS BIGINT) AS start_tok,
           CAST(least({chunk_tokens}, n - i * {stride}) AS BIGINT) AS n_toks,
           array_to_string(
             list_slice(toks, i * {stride} + 1, i * {stride} + {chunk_tokens}),
             ' ') AS chunk_text
    FROM sized, unnest(range(n_chunks)) AS u(i)
    """


def doc_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k tf·idf keywords per document: score = tf * ln(N / df) with
    N the corpus size and df the term's document frequency; ties break
    by ascending term. Terms occurring in EVERY document score 0 and are
    dropped (ln 1 = 0 — the classic stopword self-suppression). Returns
    (id, term, tf, score, rank) ordered by (id, rank)."""
    n_docs = df.count()
    # per-(doc, term) PARTIAL tf from ONE narrow Arrow tokenize — no
    # java-regex split, no token explode; the (id, term) aggregation
    # stays (summing the per-batch partials), because two ROWS may carry
    # the same id (the old explode+groupBy summed across them and the
    # DuckDB twin groups over the whole table) — but it now shuffles one
    # compact row per (row, distinct term) instead of one per TOKEN
    from pyspark.sql import types as T

    tf_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("term", T.StringType()),
            T.StructField("tf", T.LongType()),
        ]
    )

    def tf_fn(batches):
        import numpy as np
        import pandas as pd

        from ..fulltext.tokenizer import tokenize_arrow

        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes, rows, vocab, _dls = tokenize_arrow(pdf[text_col])
            if len(codes) == 0:
                continue
            V = len(vocab)
            uniq, cnt = np.unique(rows * V + codes, return_counts=True)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[(uniq // V).astype(np.int64)],
                    "term": vocab[(uniq % V).astype(np.int64)],
                    "tf": cnt.astype(np.int64),
                }
            )

    tf = (
        df.select(id_col, text_col)
        .mapInPandas(tf_fn, schema=tf_schema)
        .groupBy(id_col, "term")
        .agg(F.sum("tf").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("__df"))
    scored = (
        tf.join(dfreq, "term")
        .withColumn(
            "score", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("__df"))
        )
        .where(F.col("score") > 0)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            round_away(F.col("score"), 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy(id_col, "rank")
    )


def doc_keywords_sql(
    table: str,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`doc_keywords`."""
    return f"""
    WITH t AS (
      SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table}
    ), n AS (SELECT count(*) AS n_docs FROM t),
    tf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM t)
      GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.{id_col}, tf.term, tf.tf,
             tf.tf * ln(n.n_docs / dfreq.df) AS score
      FROM tf JOIN dfreq USING(term) CROSS JOIN n
      WHERE tf.tf * ln(n.n_docs / dfreq.df) > 0
    )
    SELECT {id_col}, term, tf::BIGINT AS tf,
           round(score, 6)::DOUBLE AS score,
           rank::BIGINT AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {id_col} ORDER BY score DESC, term ASC
      ) AS rank
      FROM scored
    )
    WHERE rank <= {k}
    ORDER BY {id_col}, rank
    """
