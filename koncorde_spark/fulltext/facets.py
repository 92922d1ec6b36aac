"""Faceted search: term-aggregation counts over the full matching set.

The reference's percolation answers "which filters match this doc"; a
search UI additionally needs "of ALL docs matching this query, how do
they distribute over metadata fields" (Elasticsearch `terms`
aggregations / Solr facets). This computes, for a keyword query, the
top-N values of each requested facet column with exact match counts.

Scale shape (100 TB): the match predicate is a pure Catalyst filter over
the tokenized text (predicate + column pruning reach the parquet scan),
facets are MELTED into (facet, value) pairs in the same projection —
so every requested facet rides ONE scan and ONE hash-agg shuffle keyed
by (facet, value), map-side combined. The per-facet top-N window runs
over the already-aggregated value counts (rows = distinct values, not
docs). Missing (NULL) facet values are excluded, matching the
Elasticsearch default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from koncorde_spark.pipeline.text import tokens_col, tokens_sql


def _match_pred(query_terms: list[str], mode: str, text_col: str):
    qarr = F.array(*[F.lit(t) for t in sorted(set(query_terms))])
    toks = F.array_distinct(tokens_col(text_col))
    if mode == "all":
        return F.size(F.array_intersect(toks, qarr)) >= len(set(query_terms))
    return F.arrays_overlap(toks, qarr)


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
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in set(query_terms))
    toks = f"list_distinct({tokens_sql(text_col)})"
    need = len(set(query_terms)) if mode == "all" else 1
    hits = f"len(list_filter({toks}, t -> t IN ({terms})))"
    iv = float(interval)
    return f"""
    SELECT (floor(CAST({value_col} AS DOUBLE) / {iv}) * {iv})::DOUBLE AS bucket,
           count(*)::BIGINT AS n_docs
    FROM {table}
    WHERE {hits} >= {need} AND {value_col} IS NOT NULL
    GROUP BY 1
    ORDER BY bucket
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
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in set(query_terms))
    toks = f"list_distinct({tokens_sql(text_col)})"
    need = len(set(query_terms)) if mode == "all" else 1
    hits = f"len(list_filter({toks}, t -> t IN ({terms})))"
    melt = ", ".join(
        f"('{c}', CAST({c} AS VARCHAR))" for c in facet_cols
    )
    return f"""
    WITH matched AS (
      SELECT unnest([{melt}]) AS fv
      FROM {table} WHERE {hits} >= {need}
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
