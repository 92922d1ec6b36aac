"""Faceted search: term-aggregation counts over the full matching set.

The reference's percolation answers "which filters match this doc"; a
search UI additionally needs "of ALL docs matching this query, how do
they distribute over metadata fields" (Elasticsearch `terms`
aggregations / Solr facets). This computes, for a keyword query, the
top-N values of each requested facet column with exact match counts.

Scale shape (100 TB): the match predicate is a vectorized Arrow-re2
pandas_udf filter (column pruning still reaches the parquet scan; the
predicate itself runs batch-at-a-time in the Python worker — java-regex
tokenization per query was the scan-bound cost it replaced),
facets are MELTED into (facet, value) pairs in the same projection —
so every requested facet rides ONE scan and ONE hash-agg shuffle keyed
by (facet, value), map-side combined. The per-facet top-N window runs
over the already-aggregated value counts (rows = distinct values, not
docs). Missing (NULL) facet values are excluded, matching the
Elasticsearch default.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from koncorde_spark.pipeline.text import tokens_sql


def _distinct_query_hits_batch(texts, qset):
    """Per-row count of DISTINCT query terms present, Arrow-vectorized
    (the shared flat_tokens_arrow core + is_in + unique (row, code)
    pairs) — the shared kernel of the facet match predicate and the
    sigterms projection. NULL text counts 0 hits."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from koncorde_spark.fulltext.tokenizer import flat_tokens_arrow

    n = len(texts)
    flat, parents = flat_tokens_arrow(texts)
    kept = pc.is_in(flat, value_set=qset).to_numpy(zero_copy_only=False)
    hits = np.zeros(n, dtype=np.int64)
    if kept.any():
        idx = np.nonzero(kept)[0]
        code = pc.index_in(flat.take(pa.array(idx)), value_set=qset).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        uniq = np.unique(parents[idx] * len(qset) + code)
        hits = np.bincount(uniq // len(qset), minlength=n).astype(np.int64)
    return hits


def _match_pred(query_terms: list[str], mode: str, text_col: str):
    """The match predicate as a vectorized Arrow pandas_udf: tokenizing
    with java.util.regex ``split`` per query made the facet family scan-
    bound on the regex (~100x Arrow re2 on code text — CLAUDE.md); the
    boolean is identical by construction (distinct-token intersection
    count against the same canonical tokenizer, threshold |terms| for
    "all", 1 for "any" — exactly _match_where_sql's rule). NULL text
    never matches — the Catalyst/DuckDB predicates propagate NULL→false
    even at threshold 0 (mode='all' with no query terms), so the
    explicit notna guard keeps that degenerate case cross-engine
    identical too."""
    import pyarrow as pa

    qlist = sorted(set(query_terms))
    need = len(qlist) if mode == "all" else 1

    @F.pandas_udf("boolean")
    def m(texts: pd.Series) -> pd.Series:
        qset = pa.array(qlist, type=pa.string())
        return pd.Series(
            (_distinct_query_hits_batch(texts, qset) >= need)
            & texts.notna().to_numpy()
        )

    return m(F.col(text_col))



def _match_where_sql(query_terms: list[str], mode: str, text_col: str) -> str:
    """The match predicate every DuckDB facet twin shares — ONE copy of
    the quoted-terms / tokenizer / threshold SQL, so the cross-engine
    match rule cannot silently diverge between aggregations."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(query_terms)))
    toks = f"list_distinct({tokens_sql(text_col)})"
    need = len(set(query_terms)) if mode == "all" else 1
    return f"len(list_filter({toks}, t -> t IN ({terms}))) >= {need}"


def search_facets(
    df: DataFrame,
    query_terms: list[str],
    facet_cols: list[str],
    top_n: int = 10,
    mode: str = "any",
    text_col: str = "text",
) -> DataFrame:
    """Facet counts over the docs matching ``query_terms`` (canonical
    tokenizer, ``mode`` any/all): (facet, value, n_docs), top ``top_n``
    values per facet by (count desc, value asc)."""
    if mode not in ("any", "all"):
        raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
    if not facet_cols:
        raise ValueError("facet_cols must be non-empty")
    melted = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("facet"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in facet_cols
            ]
        )
    )
    matched = (
        df.where(_match_pred(query_terms, mode, text_col))
        .select(melted.alias("fv"))
        .select("fv.facet", "fv.value")
        .where(F.col("value").isNotNull())
    )
    counts = matched.groupBy("facet", "value").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    w = Window.partitionBy("facet").orderBy(
        F.col("n_docs").desc(), F.col("value").asc()
    )
    return (
        counts.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= top_n)
        .select("facet", "value", "n_docs")
        .orderBy("facet", F.desc("n_docs"), "value")
    )


def _sigterms_tokenize_fn(text_col: str, qset: list[str], need: int):
    """mapInPandas kernel for significant_terms: per-row DISTINCT token
    arrays + the is-match flag from one Arrow tokenize (unique (row, code)
    pairs; flag = distinct query-term hits >= need). NULL text ≡ no
    tokens, no match (enforced even at need=0, matching the NULL
    propagation of the Catalyst/DuckDB predicates) — identical to the
    Catalyst projection it replaces (array_distinct order differs, but
    every consumer is a hash-agg)."""

    def run(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from koncorde_spark.fulltext.tokenizer import tokenize_arrow

        qarr = np.asarray(qset, dtype=object)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            notna = pdf[text_col].notna().to_numpy()
            codes, rows, vocab, _dls = tokenize_arrow(pdf[text_col])
            V = max(len(vocab), 1)
            uniq = np.unique(rows * V + codes) if len(codes) else np.empty(0, np.int64)
            u_rows = (uniq // V).astype(np.int64)
            u_codes = (uniq % V).astype(np.int64)
            counts = np.bincount(u_rows, minlength=n)
            offs = np.concatenate(([0], np.cumsum(counts)))
            terms = vocab[u_codes] if len(u_codes) else np.empty(0, dtype=object)
            tl = terms.tolist()
            is_q = np.isin(vocab, qarr) if len(vocab) else np.empty(0, dtype=bool)
            hits = (
                np.bincount(u_rows, weights=is_q[u_codes], minlength=n)
                if len(u_codes)
                else np.zeros(n)
            )
            yield pd.DataFrame(
                {
                    "__t": [tl[offs[i]: offs[i + 1]] for i in range(n)],
                    "__m": (hits >= need) & notna,
                }
            )

    return run


def significant_terms(
    df: DataFrame,
    query_terms: list[str],
    top_n: int = 10,
    min_doc_count: int = 3,
    mode: str = "any",
    text_col: str = "text",
) -> DataFrame:
    """Terms UNUSUALLY frequent in the matching set vs the whole corpus
    (Elasticsearch `significant_terms`): for each term, fg = matching
    docs containing it, bg = corpus docs containing it; score is the
    JLH heuristic (fg_rate - bg_rate) * (fg_rate / bg_rate), rates being
    per-doc-frequency fractions of their sets. Query terms themselves
    are excluded (they'd trivially dominate), as are terms under
    ``min_doc_count`` foreground docs. Returns (term, fg_count,
    bg_count, score), top_n by (score desc, term asc).

    Scale shape: ONE tokenize projection feeds both sides — per-doc
    distinct terms explode once, carrying an is-match flag, so fg and bg
    are two conditional counts in the SAME hash-agg (one shuffle keyed
    by term); the top-n sort runs over distinct terms only."""
    if mode not in ("any", "all"):
        raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
    qset = sorted(set(query_terms))
    need = len(qset) if mode == "all" else 1
    # ONE Arrow tokenize per batch produces the distinct-token array AND
    # the is-match flag together (java-regex split + array_distinct made
    # this projection the dominant cost); the projection is checkpointed
    # so the totals job and the counts agg share its materialization
    # instead of re-tokenizing the corpus twice. Token order within __t
    # is vocabulary-code order — downstream (explode + hash-agg) is
    # order-independent.
    toks = (
        df.select(text_col)
        .mapInPandas(
            _sigterms_tokenize_fn(text_col, qset, need),
            schema="__t array<string>, __m boolean",
        )
        .localCheckpoint()
    )
    totals = toks.agg(
        F.count("*").alias("n_bg"),
        F.sum(F.col("__m").cast("long")).alias("n_fg"),
    ).collect()[0]
    n_bg, n_fg = int(totals["n_bg"]), int(totals["n_fg"] or 0)
    if n_fg == 0:
        return _empty_sigterms(df.sparkSession)
    counts = (
        toks.select(F.explode("__t").alias("term"), "__m")
        .where(~F.col("term").isin(qset))
        .groupBy("term")
        .agg(
            F.sum(F.col("__m").cast("long")).alias("fg_count"),
            F.count("*").alias("bg_count"),
        )
        .where(F.col("fg_count") >= min_doc_count)
    )
    fg_rate = F.col("fg_count") / F.lit(float(n_fg))
    bg_rate = F.col("bg_count") / F.lit(float(n_bg))
    from koncorde_spark.rounding import round_away

    scored = counts.select(
        "term",
        F.col("fg_count").cast("long").alias("fg_count"),
        F.col("bg_count").cast("long").alias("bg_count"),
        round_away((fg_rate - bg_rate) * (fg_rate / bg_rate), 6).alias("score"),
    ).where(F.col("score") > 0)
    return scored.orderBy(F.desc("score"), F.asc("term")).limit(top_n)


def _empty_sigterms(spark):
    """Empty (term, fg_count, bg_count, score) frame — the zero-match
    result of :func:`significant_terms`."""
    from pyspark.sql import types as T

    return spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("term", T.StringType()),
                T.StructField("fg_count", T.LongType()),
                T.StructField("bg_count", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]
        ),
    )


def significant_terms_sql(
    table: str,
    query_terms: list[str],
    top_n: int = 10,
    min_doc_count: int = 3,
    mode: str = "any",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`significant_terms` (same tokenizer, same
    JLH score, same exclusions)."""
    qset = sorted(set(query_terms))
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in qset)
    toks = f"list_distinct({tokens_sql(text_col)})"
    pred = _match_where_sql(query_terms, mode, text_col)
    return f"""
    WITH d AS (
      SELECT {toks} AS t, ({pred}) AS m FROM {table}
    ),
    tot AS (SELECT count(*) AS n_bg, sum(CASE WHEN m THEN 1 ELSE 0 END) AS n_fg FROM d),
    c AS (
      SELECT term,
             sum(CASE WHEN m THEN 1 ELSE 0 END)::BIGINT AS fg_count,
             count(*)::BIGINT AS bg_count
      FROM (SELECT unnest(t) AS term, m FROM d)
      WHERE term NOT IN ({terms})
      GROUP BY term
      HAVING sum(CASE WHEN m THEN 1 ELSE 0 END) >= {min_doc_count}
    ),
    scored AS (
      SELECT term, fg_count, bg_count,
             round(((fg_count / (tot.n_fg * 1.0)) - (bg_count / (tot.n_bg * 1.0)))
                   * ((fg_count / (tot.n_fg * 1.0)) / (bg_count / (tot.n_bg * 1.0))),
                   6)::DOUBLE AS score
      FROM c CROSS JOIN tot
    )
    SELECT term, fg_count, bg_count, score
    FROM scored WHERE score > 0
    ORDER BY score DESC, term ASC
    LIMIT {top_n}
    """


def histogram_facet(
    df: DataFrame,
    query_terms: list[str],
    value_col: str,
    interval: float,
    mode: str = "any",
    text_col: str = "text",
) -> DataFrame:
    """Histogram aggregation over the matching set (Elasticsearch
    `histogram`): fixed-width buckets of ``value_col`` with exact doc
    counts. Bucket key = floor(value / interval) * interval, NULL values
    excluded (the ES default). One scan, one hash-agg keyed by bucket
    (map-side combined); rows after the agg = number of buckets, so the
    final sort is tiny. Returns (bucket, n_docs) ordered by bucket."""
    if interval <= 0:
        raise ValueError(f"interval must be positive, got {interval}")
    if mode not in ("any", "all"):
        raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
    bucket = (
        F.floor(F.col(value_col).cast("double") / F.lit(float(interval)))
        * F.lit(float(interval))
    ).cast("double")
    return (
        df.where(_match_pred(query_terms, mode, text_col))
        .where(F.col(value_col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("bucket")
    )


def histogram_facet_sql(
    table: str,
    query_terms: list[str],
    value_col: str,
    interval: float,
    mode: str = "any",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`histogram_facet` (same tokenizer, same
    floor-bucket key, NULLs excluded)."""
    pred = _match_where_sql(query_terms, mode, text_col)
    iv = float(interval)
    return f"""
    SELECT (floor(CAST({value_col} AS DOUBLE) / {iv}) * {iv})::DOUBLE AS bucket,
           count(*)::BIGINT AS n_docs
    FROM {table}
    WHERE {pred} AND {value_col} IS NOT NULL
    GROUP BY 1
    ORDER BY bucket
    """


def stats_facet(
    df: DataFrame,
    query_terms: list[str],
    value_col: str,
    mode: str = "any",
    text_col: str = "text",
) -> DataFrame:
    """Numeric stats aggregation over the matching set (Elasticsearch
    `stats`): one row (n_docs, min, max, sum, avg) of ``value_col``
    across the docs matching the query, NULL values excluded from the
    numeric stats but counted in n_docs. One scan, one global agg."""
    if mode not in ("any", "all"):
        raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
    from koncorde_spark.rounding import round_away

    v = F.col(value_col).cast("double")
    return df.where(_match_pred(query_terms, mode, text_col)).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        round_away(F.sum(v), 6).alias("sum"),
        round_away(F.avg(v), 6).alias("avg"),
    )


def stats_facet_sql(
    table: str,
    query_terms: list[str],
    value_col: str,
    mode: str = "any",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`stats_facet`."""
    pred = _match_where_sql(query_terms, mode, text_col)
    return f"""
    SELECT count(*)::BIGINT AS n_docs,
           min(CAST({value_col} AS DOUBLE)) AS min,
           max(CAST({value_col} AS DOUBLE)) AS max,
           round(sum(CAST({value_col} AS DOUBLE)), 6)::DOUBLE AS sum,
           round(avg(CAST({value_col} AS DOUBLE)), 6)::DOUBLE AS avg
    FROM {table}
    WHERE {pred}
    """


def search_facets_sql(
    table: str,
    query_terms: list[str],
    facet_cols: list[str],
    top_n: int = 10,
    mode: str = "any",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`search_facets` (same tokenizer, same melt,
    same (count desc, value asc) top-N cut)."""
    pred = _match_where_sql(query_terms, mode, text_col)
    melt = ", ".join(
        f"('{c}', CAST({c} AS VARCHAR))" for c in facet_cols
    )
    return f"""
    WITH matched AS (
      SELECT unnest([{melt}]) AS fv
      FROM {table} WHERE {pred}
    ),
    counts AS (
      SELECT fv[1] AS facet, fv[2] AS value, count(*)::BIGINT AS n_docs
      FROM matched WHERE fv[2] IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT facet, value, n_docs FROM (
      SELECT facet, value, n_docs,
             row_number() OVER (
               PARTITION BY facet ORDER BY n_docs DESC, value ASC
             ) AS r
      FROM counts
    ) WHERE r <= {top_n}
    ORDER BY facet, n_docs DESC, value
    """
