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
