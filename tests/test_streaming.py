"""Structured Streaming percolation: file source → percolate → memory sink,
result equals the batch percolation of the same rows."""

import pandas as pd
import pytest

from koncorde_spark import Koncorde
from koncorde_spark.spark.percolate import percolate
from koncorde_spark.streaming import percolate_stream


@pytest.mark.spark
def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    pdf = pd.DataFrame(
        {
            "doc_id": range(50),
            "kind": ["a" if i % 3 == 0 else "b" for i in range(50)],
            "score": [float(i) for i in range(50)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)

    k = Koncorde()
    k.register({"equals": {"kind": "a"}})
    k.register({"range": {"score": {"gte": 10, "lt": 20}}})
    k.register({"and": [{"equals": {"kind": "b"}}, {"range": {"score": {"gt": 40}}}]})
    ci = k.compiled()

    batch_df = spark.read.parquet(src)
    expected = {
        (int(r.doc_id), r.filter_id)
        for r in percolate(batch_df, ci, id_col="doc_id").collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    out = percolate_stream(stream, ci, id_col="doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("perc_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (int(r.doc_id), r.filter_id)
        for r in spark.sql("select * from perc_stream_test").collect()
    }
    assert got == expected and len(got) > 0


@pytest.mark.spark
def test_stream_rejects_batch_df(spark):
    k = Koncorde()
    k.register({"equals": {"x": 1}})
    df = spark.range(3)
    with pytest.raises(ValueError):
        percolate_stream(df, k.compiled(), id_col="id")


@pytest.mark.spark
def test_windowed_match_counts(spark, tmp_path):
    """Watermarked per-window per-filter counts equal the batch groupBy."""
    import datetime

    from koncorde_spark.streaming import windowed_match_counts
    from pyspark.sql import functions as F

    src = str(tmp_path / "wsrc")
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    pdf = pd.DataFrame(
        {
            "doc_id": range(120),
            "kind": ["a" if i % 2 == 0 else "b" for i in range(120)],
            "ts": [base + datetime.timedelta(seconds=30 * i) for i in range(120)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)

    k = Koncorde()
    k.register({"equals": {"kind": "a"}})
    k.register({"equals": {"kind": "b"}})
    ci = k.compiled()

    batch_df = spark.read.parquet(src)
    expected = {
        (r.window_start, r.filter_id, int(r["count"]))
        for r in percolate(batch_df, ci, id_col="doc_id", keep_cols=["ts"])
        .groupBy(F.window("ts", "5 minutes").alias("w"), "filter_id")
        .count()
        .select(F.col("w.start").alias("window_start"), "filter_id", "count")
        .collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    out = windowed_match_counts(stream, ci, time_col="ts", window="5 minutes", id_col="doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("perc_win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.filter_id, int(r["count"]))
        for r in spark.sql("select * from perc_win_test").collect()
    }
    assert got == expected and len(got) >= 2


@pytest.mark.spark
def test_streaming_text_features(spark, tmp_path):
    """The fused featurizer (narrow mapInPandas) runs unchanged on a
    stream — per-row features are stateless, so streaming output equals
    the batch run row-for-row."""
    from koncorde_spark.pipeline import text

    src = str(tmp_path / "fsrc")
    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [f"def fn_{i}(x): return x + {i}  # doc {i}" for i in range(40)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)

    batch_df = spark.read.parquet(src)
    expected = {
        tuple(r) for r in text.text_features(batch_df).toPandas().itertuples(index=False)
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    out = text.text_features(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("feat_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql("select * from feat_stream_test").toPandas().itertuples(index=False)
    }
    assert got == expected and len(got) == 40


@pytest.mark.spark
def test_windowed_match_counts_append_mode(spark, tmp_path):
    """Append mode requires the watermark to SURVIVE percolate's
    mapInPandas (fresh output attributes drop input watermarks) — the
    query must at least start and finalize old windows."""
    import datetime

    from koncorde_spark.streaming import windowed_match_counts

    src = str(tmp_path / "awsrc")
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    pdf = pd.DataFrame(
        {
            "doc_id": range(60),
            "kind": ["a"] * 60,
            # 1 event/minute for an hour: with a 10-minute watermark the
            # early windows are final and must be emitted in append mode
            "ts": [base + datetime.timedelta(minutes=i) for i in range(60)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)

    k = Koncorde()
    k.register({"equals": {"kind": "a"}})
    ci = k.compiled()

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = windowed_match_counts(
        stream, ci, time_col="ts", window="5 minutes", watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("perc_win_append")
        .outputMode("append")  # throws at start() without a watermark
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from perc_win_append").collect()
    # windows fully below max(ts) - 10min are finalized: 60min of events,
    # 5-min windows -> at least the first ~9 windows emitted
    assert len(got) >= 5
    assert all(int(r["count"]) == 5 for r in got)


@pytest.mark.spark
class TestStreamAppend:
    def test_micro_batches_fold_into_index(self, spark, tmp_path):
        """File-source stream → foreachBatch append_index: after two
        micro-batches the index answers identically to a from-scratch
        build over everything seen."""
        import numpy as np
        import pandas as pd

        from koncorde_spark.fulltext.indexer import IndexConfig, build_index
        from koncorde_spark.fulltext.query import Bm25Index
        from koncorde_spark.streaming.index_stream import stream_append

        rng = np.random.default_rng(21)
        words = np.array("alpha beta gamma delta import spark".split())

        def corpus_pdf(tag, n, length):
            return pd.DataFrame(
                {
                    "repo": [f"r{i % 2}" for i in range(n)],
                    "path": [f"{tag}/{i}.py" for i in range(n)],
                    "commit": ["c1"] * n,
                    "lang": ["py"] * n,
                    "content": [
                        " ".join(rng.choice(words, size=length)) for _ in range(n)
                    ],
                }
            )

        incoming = tmp_path / "incoming"
        incoming.mkdir()
        batch1, batch2 = corpus_pdf("a", 25, 8), corpus_pdf("b", 15, 30)

        idx_dir = str(tmp_path / "idx")
        # seed index from batch1 (streams append to an EXISTING index)
        build_index(
            spark, spark.createDataFrame(batch1), idx_dir,
            IndexConfig(n_shards=4), resume=False,
        )

        spark.createDataFrame(batch2).coalesce(1).write.parquet(
            str(incoming / "b2"), mode="overwrite"
        )
        schema = spark.createDataFrame(batch1).schema
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(incoming))
        q = stream_append(stream, idx_dir, checkpoint=str(tmp_path / "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        full_dir = str(tmp_path / "full")
        build_index(
            spark,
            spark.createDataFrame(pd.concat([batch1, batch2], ignore_index=True)),
            full_dir,
            IndexConfig(n_shards=4),
            resume=False,
        )
        inc, full = Bm25Index(spark, idx_dir), Bm25Index(spark, full_dir)
        assert inc.meta["n_docs"] == full.meta["n_docs"] == 40
        for qtext in ["alpha import", "beta gamma spark"]:
            got = inc.topk(qtext, 10).toPandas()
            want = full.topk(qtext, 10).toPandas()
            assert list(got["doc_id"]) == list(want["doc_id"]), qtext
            assert np.allclose(got["score"], want["score"], atol=1e-12)

    def test_merge_policy_compacts_in_stream(self, spark, tmp_path):
        """compact_every_appends=1: after the micro-batch folds, the
        policy fires and the index ends tombstone-free with one segment
        per (term, shard) — still answering identically to a rebuild."""
        import os

        import numpy as np
        import pandas as pd

        from koncorde_spark.fulltext.indexer import (
            IndexConfig,
            build_index,
            read_meta,
        )
        from koncorde_spark.fulltext.query import Bm25Index
        from koncorde_spark.streaming.index_stream import stream_append

        rng = np.random.default_rng(33)
        words = np.array("alpha beta gamma delta import spark".split())

        def corpus_pdf(tag, n, length):
            return pd.DataFrame(
                {
                    "repo": [f"r{i % 2}" for i in range(n)],
                    "path": [f"{tag}/{i}.py" for i in range(n)],
                    "commit": ["c1"] * n,
                    "lang": ["py"] * n,
                    "content": [
                        " ".join(rng.choice(words, size=length)) for _ in range(n)
                    ],
                }
            )

        incoming = tmp_path / "incoming"
        incoming.mkdir()
        batch1, batch2 = corpus_pdf("a", 20, 10), corpus_pdf("b", 12, 25)
        idx_dir = str(tmp_path / "idx")
        build_index(spark, spark.createDataFrame(batch1), idx_dir,
                    IndexConfig(n_shards=4), resume=False)
        spark.createDataFrame(batch2).coalesce(1).write.parquet(
            str(incoming / "b2"), mode="overwrite"
        )
        schema = spark.createDataFrame(batch1).schema
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(incoming))
        q = stream_append(stream, idx_dir, checkpoint=str(tmp_path / "ckpt"),
                          compact_every_appends=1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        assert read_meta(idx_dir).get("compactions"), "policy never fired"
        posts = spark.read.parquet(os.path.join(idx_dir, "postings"))
        assert posts.groupBy("term", "shard").count().where("count > 1").count() == 0

        full_dir = str(tmp_path / "full")
        build_index(
            spark,
            spark.createDataFrame(pd.concat([batch1, batch2], ignore_index=True)),
            full_dir, IndexConfig(n_shards=4), resume=False,
        )
        inc, full = Bm25Index(spark, idx_dir), Bm25Index(spark, full_dir)
        for qtext in ["alpha import", "beta gamma spark"]:
            got = inc.topk(qtext, 10).toPandas()
            want = full.topk(qtext, 10).toPandas()
            assert list(got["doc_id"]) == list(want["doc_id"]), qtext
            assert np.allclose(got["score"], want["score"], atol=1e-12)

    def test_requires_streaming_df_and_schema(self, spark):
        import pandas as pd

        from koncorde_spark.streaming.index_stream import stream_append

        static = spark.createDataFrame(pd.DataFrame({"repo": ["r"]}))
        with pytest.raises(ValueError, match="streaming"):
            stream_append(static, "/tmp/x", checkpoint="/tmp/c")


@pytest.mark.spark
class TestStreamingJsonPercolation:
    def test_json_stream_percolates(self, spark, tmp_path):
        """percolate_json on a streaming DataFrame: raw JSON files stream
        in, matched (id, filter_id) pairs stream out — the Kafka-shaped
        schemaless ingestion path."""
        import pandas as pd

        from koncorde_spark import Koncorde
        from koncorde_spark.spark.percolate import percolate_json

        k = Koncorde()
        f_click = k.register({"equals": {"event_type": "click"}})
        f_deep = k.register({"exists": "user.name"})

        src = tmp_path / "in"
        src.mkdir()
        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "json": [
                    '{"event_type": "click"}',
                    '{"user": {"name": "ada"}, "event_type": "view"}',
                    "not valid json",
                ],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src / "b1"))
        schema = spark.createDataFrame(pdf).schema
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        out = percolate_json(stream, k.compiled(), json_col="json", id_col="doc_id")
        q = (
            out.writeStream.format("memory")
            .queryName("json_perc")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("select * from json_perc").toPandas()
        assert {(a, b) for a, b in got.itertuples(index=False)} == {
            (1, f_click),
            (2, f_deep),
        }


@pytest.mark.spark
def test_trending_terms_matches_batch(spark, tmp_path):
    """Streamed windowed term df equals the batch equivalent, and the
    distinct-per-doc rule holds (a term repeated in one doc counts once)."""
    import datetime

    from koncorde_spark.streaming.trending import trending_terms
    from koncorde_spark.pipeline.text import tokens_col
    from pyspark.sql import functions as F

    src = str(tmp_path / "trend_src")
    base = datetime.datetime(2026, 1, 1, 9, 0, 0)
    pdf = pd.DataFrame(
        {
            "doc_id": range(60),
            # 'hot hot hot' stresses the distinct rule; 'w<i>' is noise
            "text": [
                ("hot hot hot " if i % 3 == 0 else "cold ") + f"w{i}"
                for i in range(60)
            ],
            "ts": [base + datetime.timedelta(seconds=40 * i) for i in range(60)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)
    batch_df = spark.read.parquet(src)

    expected = {
        (r.ws, r.term, int(r.n_docs))
        for r in batch_df.select(
            "ts", F.explode(F.array_distinct(tokens_col("text"))).alias("term")
        )
        .groupBy(F.window("ts", "10 minutes").alias("w"), "term")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select(F.col("w.start").alias("ws"), "term", "n_docs")
        .collect()
    }
    assert any(t == "hot" for _, t, _ in expected)
    # distinct rule: per 10-min window (15 docs), every 3rd doc has 'hot'
    hot_counts = {n for _, t, n in expected if t == "hot"}
    assert hot_counts == {5}

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    out = trending_terms(stream, "ts", window="10 minutes", min_count=2)
    q = (
        out.writeStream.format("memory")
        .queryName("trending_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"], r["term"], int(r["n_docs"]))
        for r in spark.sql("select * from trending_test").collect()
    }
    assert got == expected

    with pytest.raises(ValueError):
        trending_terms(batch_df, "ts")
