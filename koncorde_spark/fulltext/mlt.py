"""More-like-this: find documents similar to a seed document.

Lucene's MoreLikeThis recipe (the Elasticsearch `more_like_this` query):
rank the seed document's terms by tf·idf, keep the top
``max_query_terms`` interesting ones (guarded by ``min_term_freq`` /
``min_doc_freq`` so boilerplate and hapax noise drop out), then run a
normal BM25 search with those terms, excluding the seed itself.

Scale shape (100 TB): term selection touches the seed doc's rows plus
ONE broadcast-semi-joined hash-agg over the corpus (df counts for the
seed's terms only — the broadcast side is one document's vocabulary).
The selected terms are a driver-side collect bounded by
``max_query_terms`` (≤ a few dozen rows), after which the search itself
is the ordinary distributed BM25 path. Corpus statistics include the
seed doc, exactly as a Lucene index containing it would.

Cross-engine determinism: term scores are tf·idf rounded away-from-zero
at 6 dp (same contract as BM25 scores), ties broken by term ascending —
so the selected term SET is identical on Spark and DuckDB and the twin
SQL reproduces the full pipeline end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from koncorde_spark.pipeline.text import tokens_sql
from koncorde_spark.rounding import round_away

from .brute import bm25_brute_topk


def _seed_df_counts(
    df: DataFrame, seed_terms: list[str], text_col: str
) -> DataFrame:
    """(term, df) for ``seed_terms`` over ``df``: the number of documents
    containing each term, via one narrow Arrow-tokenize mapInPandas with
    per-batch partial counts (map-side combine) + one tiny hash-agg."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("term", T.StringType()), T.StructField("cnt", T.LongType())]
    )
    seed = list(seed_terms)

    def run(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        from .tokenizer import flat_tokens_arrow

        qset = pa.array(seed, type=pa.string())
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, parents = flat_tokens_arrow(pdf[text_col])
            kept = pc.is_in(flat, value_set=qset).to_numpy(zero_copy_only=False)
            if not kept.any():
                continue
            idx = np.nonzero(kept)[0]
            code = pc.index_in(
                flat.take(pa.array(idx)), value_set=qset
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            # one count per DISTINCT (doc, term) pair
            uniq = np.unique(parents[idx] * len(seed) + code)
            cnt = np.bincount(uniq % len(seed), minlength=len(seed))
            nz = np.nonzero(cnt)[0]
            yield pd.DataFrame(
                {"term": [seed[i] for i in nz], "cnt": cnt[nz].astype(np.int64)}
            )

    if not seed:
        spark = df.sparkSession
        return spark.createDataFrame(
            [],
            T.StructType(
                [T.StructField("term", T.StringType()), T.StructField("df", T.LongType())]
            ),
        )
    return (
        df.select(text_col)
        .mapInPandas(run, schema=schema)
        .groupBy("term")
        .agg(F.sum("cnt").alias("df"))
    )


def mlt_terms(
    df: DataFrame,
    doc_id,
    max_query_terms: int = 20,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The seed doc's top terms: (term, tf, df, mlt_score), cut to
    ``max_query_terms`` by (score desc, term asc)."""
    n_docs = df.count()
    # seed tf: ONE filtered 1-row collect of the seed doc's text, token
    # counts in the driver (tokenize_text IS the canonical rule — 4-place
    # invariant — so the counts equal the old explode + groupBy exactly,
    # and summing across rows covers a duplicated id like the agg did).
    # This replaces a Spark job whose only real work was tokenizing one
    # document; the literal (term, tf) frame feeds the same downstream
    # plan unchanged.
    from collections import Counter

    from .tokenizer import tokenize_text

    seed_tf: Counter = Counter()
    for r in df.where(F.col(id_col) == F.lit(doc_id)).select(text_col).collect():
        seed_tf.update(tokenize_text(r[text_col] or ""))
    items = sorted(
        (t, int(c)) for t, c in seed_tf.items() if c >= min_term_freq
    )
    spark = df.sparkSession
    src_tf = spark.createDataFrame(
        [(t, c) for t, c in items], "term string, tf long"
    ) if items else spark.createDataFrame([], "term string, tf long")
    # df per seed term: one Arrow-tokenize pass emitting per-batch partial
    # (term, cnt) for the seed's terms only (each doc counted once per
    # distinct term it contains), summed in one tiny hash-agg — replaces a
    # java-regex split + full-vocabulary explode + semi-join of the whole
    # corpus (same values by construction: distinct-per-doc ∩ seed terms).
    seed_terms = [t for t, _ in items]
    dfreq = _seed_df_counts(df, seed_terms, text_col)
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return (
        src_tf.join(F.broadcast(dfreq), "term")
        .where(F.col("df") >= min_doc_freq)
        .select(
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            round_away(F.col("tf") * idf, 6).alias("mlt_score"),
        )
        .orderBy(F.desc("mlt_score"), F.asc("term"))
        .limit(max_query_terms)
    )


def more_like_this(
    df: DataFrame,
    doc_id,
    k: int = 10,
    max_query_terms: int = 20,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs most similar to ``doc_id``: BM25 over the seed's
    selected terms, seed excluded from candidates (stats keep it)."""
    terms = [
        r["term"]
        for r in mlt_terms(
            df, doc_id, max_query_terms, min_term_freq, min_doc_freq,
            text_col, id_col,
        ).collect()
    ]
    if not terms:
        return df.select(
            F.col(id_col), F.lit(0.0).alias("score")
        ).where(F.lit(False))
    return bm25_brute_topk(
        df, terms, k, text_col=text_col, id_col=id_col,
        exclude_ids=[doc_id],
    )


def more_like_this_sql(
    table: str,
    doc_id,
    k: int = 10,
    max_query_terms: int = 20,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`more_like_this`: identical term selection
    (tf·idf rounded 6, term-asc ties, same guards) feeding the identical
    BM25 formula, seed excluded from candidates only."""
    toks = tokens_sql(text_col)
    return f"""
    WITH d2 AS (
      SELECT {id_col}, {toks} AS toks FROM {table}
    ),
    d3 AS (SELECT {id_col}, toks, len(toks) AS dl FROM d2),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3),
    src_tf AS (
      SELECT term, count(*) AS tf
      FROM (SELECT unnest(toks) AS term FROM d3 WHERE {id_col} = {doc_id})
      GROUP BY term HAVING count(*) >= {min_term_freq}
    ),
    seed_df AS (
      SELECT term, count(*) AS df
      FROM (SELECT DISTINCT {id_col}, unnest(toks) AS term FROM d3)
      WHERE term IN (SELECT term FROM src_tf)
      GROUP BY term
    ),
    qterms AS (
      SELECT src_tf.term,
             round(src_tf.tf * ln(1 + (stats.n - seed_df.df + 0.5)
                                      / (seed_df.df + 0.5)), 6) AS mlt_score
      FROM src_tf JOIN seed_df USING(term) CROSS JOIN stats
      WHERE seed_df.df >= {min_doc_freq}
      ORDER BY mlt_score DESC, src_tf.term ASC
      LIMIT {max_query_terms}
    ),
    tf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3)
      WHERE term IN (SELECT term FROM qterms)
      GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.{id_col},
             sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * d3.dl / stats.avgdl))) AS score
      FROM tf JOIN dfreq USING(term) JOIN d3 USING({id_col}) CROSS JOIN stats
      GROUP BY tf.{id_col}
    )
    SELECT {id_col}, round(score, 6)::DOUBLE AS score
    FROM scored
    WHERE {id_col} <> {doc_id}
    ORDER BY score DESC, {id_col} ASC
    LIMIT {k}
    """
