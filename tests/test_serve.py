"""LocalSearcher (Spark-free serving) is rank-identical to both the
distributed query path and the pandas oracle."""

import numpy as np
import pytest

from koncorde_spark.fulltext.oracle import bm25_oracle_topk
from koncorde_spark.fulltext.serve import LocalSearcher

QUERIES = [
    ("import ident_00001", 10),
    ("ident_00042 ident_00100 return", 25),
    ("def function import return", 10),
    ("missingterm_zzz", 5),
    ("", 5),
]


@pytest.mark.spark
def test_serve_rank_identical(small_corpus_pdf, bm25_index_dir):
    s = LocalSearcher(bm25_index_dir)
    for q, k in QUERIES:
        got = s.topk(q, k)
        exp = bm25_oracle_topk(small_corpus_pdf, q, k)
        assert [d for d, _ in got] == list(exp["doc_id"]), q
        assert np.allclose([x for _, x in got], exp["score"], atol=1e-9), q


@pytest.mark.spark
def test_serve_equals_spark_path(spark, bm25_index_dir):
    from koncorde_spark.fulltext.query import Bm25Index

    s = LocalSearcher(bm25_index_dir)
    idx = Bm25Index(spark, bm25_index_dir)
    q = "import ident_00007 ident_00123"
    local = s.topk(q, 15)
    dist = [(int(r["doc_id"]), float(r["score"])) for r in idx.topk(q, 15).collect()]
    assert [d for d, _ in local] == [d for d, _ in dist]
    assert np.allclose([x for _, x in local], [x for _, x in dist], atol=0)


@pytest.mark.spark
def test_serve_multifield_equals_spark_path(
    spark, small_corpus_pdf, bm25_index_dir, tmp_path_factory
):
    """LocalMultiFieldSearcher is rank- and score-identical to the
    distributed MultiFieldSearch (shared multiterm kernel, same per-field
    statistics and weights)."""
    from koncorde_spark.fulltext.indexer import IndexConfig, build_index
    from koncorde_spark.fulltext.multifield import MultiFieldSearch
    from koncorde_spark.fulltext.query import Bm25Index
    from koncorde_spark.fulltext.serve import LocalMultiFieldSearcher

    path_dir = str(tmp_path_factory.mktemp("mfservepath"))
    pdf = small_corpus_pdf.copy()
    pdf["content"] = pdf["path"]
    build_index(spark, spark.createDataFrame(pdf).repartition(3), path_dir,
                IndexConfig(n_shards=4), resume=False)

    weights = {"content": 1.0, "path": 3.0}
    mf = MultiFieldSearch(
        spark,
        {"content": Bm25Index(spark, bm25_index_dir),
         "path": Bm25Index(spark, path_dir)},
        weights=weights,
    )
    local = LocalMultiFieldSearcher(
        {"content": bm25_index_dir, "path": path_dir}, weights=weights
    )
    for q, k in [
        ("import src_00007 py", 15),
        ("import return def", 12),
        ("missingterm_zzz", 5),
        ("", 5),
    ]:
        dist = [
            (int(r["doc_id"]), float(r["score"]))
            for r in mf.topk(q, k).collect()
        ]
        got = local.topk(q, k)
        assert [d for d, _ in got] == [d for d, _ in dist], q
        assert np.allclose(
            [x for _, x in got], [x for _, x in dist], atol=1e-12
        ), q


def test_serve_multifield_single_field_equals_topk(bm25_index_dir):
    """One field at weight 1.0 degenerates to plain topk."""
    from koncorde_spark.fulltext.serve import LocalMultiFieldSearcher

    s = LocalSearcher(bm25_index_dir)
    mf = LocalMultiFieldSearcher({"content": bm25_index_dir})
    for q, k in QUERIES:
        got, want = mf.topk(q, k), s.topk(q, k)
        # scores allclose, not ==: summation ORDER differs (bincount vs
        # WAND accumulation) — same tolerance as the distributed twin test
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert np.allclose(
            [x for _, x in got], [x for _, x in want], atol=1e-12
        ), q


def test_serve_multifield_validation(bm25_index_dir):
    from koncorde_spark.fulltext.serve import LocalMultiFieldSearcher

    with pytest.raises(ValueError, match="at least one"):
        LocalMultiFieldSearcher({})


def test_serve_segment_cache_repeats_identical(bm25_index_dir):
    """The per-handle decoded-segment cache must be invisible: a repeated
    query returns tuple-identical hits (scores bit-equal — the cache
    stores the idf-independent tf-part, so per-query arithmetic is the
    same fl ops), the cache actually populates, and mixed warm/cold term
    sets (one cached term + one new term) still match a fresh handle."""
    s = LocalSearcher(bm25_index_dir)
    first = s.topk("import return", 10)
    assert s._seg_cache  # populated by the first query
    assert s.topk("import return", 10) == first
    # 'import' is warm, 'def' cold — must equal a fresh handle's answer
    mixed = s.topk("import def", 10)
    assert mixed == LocalSearcher(bm25_index_dir).topk("import def", 10)
    # conjunctive path rides the same cache
    assert s.topk("import return", 10, mode="all") == LocalSearcher(
        bm25_index_dir
    ).topk("import return", 10, mode="all")


def test_serve_segment_cache_eviction_never_breaks_current_query(bm25_index_dir):
    """Under a tiny cache budget every query still scores ALL its terms:
    eviction must never drop a term of the query being executed."""
    s = LocalSearcher(bm25_index_dir)
    s._SEG_CACHE_MAX_TERMS = 1  # force eviction pressure on every query
    fresh = LocalSearcher(bm25_index_dir)
    for q in ("import return", "def function import", "import ident_00001 return"):
        assert s.topk(q, 10) == fresh.topk(q, 10), q
    assert len(s._seg_cache) >= 1
