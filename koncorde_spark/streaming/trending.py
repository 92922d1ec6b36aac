"""Streaming trending-terms: windowed term frequencies over a text stream.

The live-dashboard counterpart of the batch vocab stats: documents arrive
on a stream, and each event-time window accumulates per-term document
frequencies (distinct per doc — a term spamming one doc counts once, the
same contract as the index's df). Late data is bounded by the watermark;
windows emit once closed (append mode), so downstream sinks see each
window exactly once.

The top-k cut deliberately stays OUT of the streaming graph: a global
rank inside a window requires complete-mode output or a foreachBatch
sort, both of which couple the pipeline to the sink. Emitting the full
(window, term, n_docs) stream keeps append-mode semantics, and the
consumer ranks its own windows (rows per window = distinct terms, tiny).
``min_count`` prunes the long tail before the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.text import tokens_col


def trending_terms(
    stream_df: DataFrame,
    time_col: str,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "10 minutes",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """(window, term, n_docs) per event-time window: the number of
    stream documents in the window containing each term (distinct per
    doc). Sliding windows when ``slide`` is given, tumbling otherwise.
    Append-mode ready (aggregation after an event-time watermark)."""
    if not stream_df.isStreaming:
        raise ValueError("trending_terms expects a streaming DataFrame")
    win = (
        F.window(F.col(time_col), window, slide)
        if slide
        else F.window(F.col(time_col), window)
    )
    exploded = (
        stream_df.withWatermark(time_col, watermark)
        .select(
            F.col(time_col),
            F.explode(F.array_distinct(tokens_col(text_col))).alias("term"),
        )
    )
    return (
        exploded.groupBy(win.alias("window"), "term")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_count)
    )
