"""Structured Streaming percolation.

The percolation operator is stateless per micro-batch (the filter index is
a broadcast constant), so the SAME mapInPandas matcher used for batch runs
unchanged on a streaming DataFrame: readStream → percolate → writeStream.
This is the streaming analogue of Koncorde's test() loop — documents flow
through the registered filter set continuously, matched (doc, filter) pairs
stream out.

Late data / watermarks are not needed for pure percolation (no windows, no
state); when aggregating matches per window downstream, attach a watermark
on the event-time column before grouping, e.g.::

    pairs = percolate_stream(stream_df, index, id_col="event_id")
    counts = (pairs
        .join(stream_df.select("event_id", "ts"), "event_id")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute"), "filter_id")
        .count())
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..engine.compiled import CompiledIndex
from ..spark.percolate import percolate


def percolate_stream(
    stream_df: DataFrame,
    index: CompiledIndex,
    id_col: str = "doc_id",
    result_col: str = "filter_id",
) -> DataFrame:
    """Percolate a streaming DataFrame; returns a streaming (id, filter_id)
    DataFrame ready for writeStream. Stateless — any output mode works."""
    if not stream_df.isStreaming:
        raise ValueError("percolate_stream expects a streaming DataFrame")
    return percolate(stream_df, index, id_col=id_col, result_col=result_col)


def windowed_match_counts(
    stream_df: DataFrame,
    index: CompiledIndex,
    time_col: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    id_col: str = "doc_id",
    result_col: str = "filter_id",
) -> DataFrame:
    """Streaming per-window, per-filter match counts with late-data handling.

    percolate (stateless) → event-time watermark → windowed count. The
    watermark bounds state: windows older than ``watermark`` are finalized
    and dropped from the state store, so the aggregation runs indefinitely
    at 100-TB/day rates without unbounded memory. Output is append-mode
    compatible (finalized windows only).
    """
    from pyspark.sql import functions as F

    if not stream_df.isStreaming:
        raise ValueError("windowed_match_counts expects a streaming DataFrame")
    pairs = percolate(
        stream_df,
        index,
        id_col=id_col,
        result_col=result_col,
        keep_cols=[time_col],
    )
    # The watermark must be applied AFTER percolate: mapInPandas creates
    # fresh output attributes, so a watermark set on the input stream is
    # dropped and the aggregation would reject append mode / never evict
    # state. keep_cols carries the event-time column through the matcher.
    return (
        pairs.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window), F.col(result_col))
        .count()
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            result_col,
            "count",
        )
    )
