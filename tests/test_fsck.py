"""Index fsck: clean indexes pass; seeded corruptions are detected."""

import json
import os
import shutil

import pytest

from koncorde_spark.fulltext.fsck import IndexCorruption, fsck_index


@pytest.mark.spark
def test_clean_index_passes(spark, bm25_index_dir):
    report = fsck_index(spark, bm25_index_dir)
    assert report["ok"], report
    assert all(c["ok"] for c in report["checks"].values())


@pytest.mark.spark
def test_tombstoned_index_passes(spark, bm25_index_dir, tmp_path):
    """Deletions freeze stats until rebuild — a tombstoned index is
    healthy by design."""
    from koncorde_spark.fulltext.indexer import delete_docs
    from pyspark.sql import functions as F

    d = str(tmp_path / "tombidx")
    shutil.copytree(bm25_index_dir, d)
    ids = [
        int(r["doc_id"])
        for r in spark.read.parquet(os.path.join(d, "docs"))
        .orderBy(F.asc("doc_id")).limit(7).collect()
    ]
    delete_docs(spark, d, ids)
    report = fsck_index(spark, d)
    assert report["ok"], report
    assert "7 tombstone rows" in report["checks"]["tombstones"]["detail"]

    # an unknown (never-indexed) tombstoned id is corruption
    delete_docs(spark, d, [999999999999])
    r2 = fsck_index(spark, d)
    assert not r2["ok"] and not r2["checks"]["tombstones"]["ok"]
    assert "1 unresolvable" in r2["checks"]["tombstones"]["detail"]


@pytest.mark.spark
def test_detects_corruptions(spark, bm25_index_dir, tmp_path):
    import duckdb

    # 1) missing postings manifest
    d1 = str(tmp_path / "c1")
    shutil.copytree(bm25_index_dir, d1)
    man_dir = os.path.join(d1, "_manifests", "postings")
    victim = sorted(f for f in os.listdir(man_dir) if f.endswith(".json"))[0]
    os.remove(os.path.join(man_dir, victim))
    r1 = fsck_index(spark, d1)
    assert not r1["ok"]
    assert not r1["checks"]["manifest_postings"]["ok"]

    # 2) tampered meta avgdl (stats drift)
    d2 = str(tmp_path / "c2")
    shutil.copytree(bm25_index_dir, d2)
    meta_p = os.path.join(d2, "meta.json")
    meta = json.load(open(meta_p))
    meta["avgdl"] = meta["avgdl"] * 1.5
    json.dump(meta, open(meta_p, "w"))
    r2 = fsck_index(spark, d2)
    assert not r2["ok"] and not r2["checks"]["avgdl"]["ok"]
    with pytest.raises(IndexCorruption):
        fsck_index(spark, d2, raise_on_error=True)

    # 3) terms df out of sync with postings segments
    d3 = str(tmp_path / "c3")
    shutil.copytree(bm25_index_dir, d3)
    terms_dir = os.path.join(d3, "terms")
    con = duckdb.connect()
    pdf = con.sql(
        f"SELECT * FROM parquet_scan('{terms_dir}/*.parquet')"
    ).df()
    pdf.loc[0, "df"] = int(pdf.loc[0, "df"]) + 1
    for f in os.listdir(terms_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(terms_dir, f))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(terms_dir, "part-0.parquet"),
    )
    r3 = fsck_index(spark, d3)
    assert not r3["ok"] and not r3["checks"]["df_consistency"]["ok"]
    assert pdf.loc[0, "term"] in r3["checks"]["df_consistency"]["detail"]


@pytest.mark.spark
def test_detects_duplicate_dlpack_rows(spark, bm25_index_dir, tmp_path):
    """A crashed swap leaving two dlpack rows for one shard must fail
    fsck (queries on that shard raise at decode)."""
    d = str(tmp_path / "dupdl")
    shutil.copytree(bm25_index_dir, d)
    dl = os.path.join(d, "dlpack")
    one_row = spark.read.parquet(dl).limit(1)
    one_row.write.mode("append").parquet(dl)
    r = fsck_index(spark, d)
    assert not r["ok"] and not r["checks"]["manifest_dlpack"]["ok"]
    assert "duplicate pack rows" in r["checks"]["manifest_dlpack"]["detail"]


@pytest.mark.spark
def test_index_stats_summary(spark, bm25_index_dir, small_corpus_pdf, tmp_path):
    from koncorde_spark.fulltext.fsck import index_stats
    from koncorde_spark.fulltext.indexer import delete_docs
    from koncorde_spark.fulltext.tokenizer import tokenize_text

    st = index_stats(spark, bm25_index_dir, top_terms=3)
    assert st["n_docs"] == len(small_corpus_pdf)
    assert st["sizes"]["postings"]["bytes"] > 0
    assert st["sizes"]["docs"]["files"] > 0
    # fresh build: most (term, shard) pairs own one segment row; HOT
    # terms may be salted into several even before any append (legal per
    # the multi-segment invariant), so pin the shape, not exactly-{1}
    dist = st["segments_per_term_shard"]
    assert 1 in dist and all(k >= 1 for k in dist)
    assert dist[1] == max(dist.values())  # singletons dominate
    assert sum(dist.values()) >= st["n_terms"]
    # hottest term df matches a brute recompute
    vocab = {}
    for text in small_corpus_pdf["content"]:
        for t in set(tokenize_text(text)):
            vocab[t] = vocab.get(t, 0) + 1
    want = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(h["term"], h["df"]) for h in st["hottest_terms"]] == want
    assert st["tombstones"] == 0 and st["tombstone_fraction"] == 0.0

    # tombstone fraction reflects deletes
    cp = str(tmp_path / "idx")
    shutil.copytree(bm25_index_dir, cp)
    ids = [
        int(r["doc_id"])
        for r in spark.read.parquet(cp + "/docs").limit(6).collect()
    ]
    delete_docs(spark, cp, ids)
    st2 = index_stats(spark, cp)
    assert st2["tombstones"] == 6
    assert abs(st2["tombstone_fraction"] - 6 / st2["n_docs"]) < 1e-9
