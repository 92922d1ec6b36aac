"""Physical-plan shape assertions — the scale properties the design
promises must be visible in the executed plan, not just claimed:

- percolation: column-pruned scan → project → MapInPandas, NO Exchange
- postings query scan: `term IN (...)` reaches parquet as PushedFilters
"""

import re

import pytest
from pyspark.sql import functions as F

from koncorde_spark import Koncorde
from koncorde_spark.spark.percolate import percolate

SF = "/root/testdata/sf0.001"


def executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.spark
def test_percolation_plan_no_shuffle_and_pruned(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    k = Koncorde()
    k.register({"equals": {"event_type": "click"}})
    k.register({"range": {"value": {"gte": 50, "lt": 100}}})
    plan = executed_plan(percolate(ev, k.compiled(), id_col="event_id"))
    assert "Exchange" not in plan  # zero-shuffle: broadcast index, narrow map
    assert "MapInPandas" in plan
    # column pruning reached the parquet scan: only the 3 needed columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"event_id", "event_type", "value"}, cols


@pytest.mark.spark
def test_postings_scan_term_pushdown(spark, bm25_index_dir):
    import os

    postings = spark.read.parquet(os.path.join(bm25_index_dir, "postings"))
    plan = executed_plan(postings.where(F.col("term").isin(["import", "def"])))
    assert re.search(r"PushedFilters: \[In\(term", plan), plan


@pytest.mark.spark
def test_brute_bm25_prunes_before_explode(spark):
    """The explode must operate on the query-term-filtered array, not the
    full token stream (generate over a filter(...) expression)."""
    from koncorde_spark.fulltext.brute import bm25_brute_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # materialize=False keeps the logical plan inspectable (the default
    # localCheckpoint would collapse it to an ExistingRDD scan)
    df = bm25_brute_topk(docs, ["spark", "join"], 5, materialize=False)
    plan = executed_plan(df)
    assert "Generate explode" in plan and "__qt" in plan
