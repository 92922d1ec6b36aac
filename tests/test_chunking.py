"""Document chunking + tf-idf keywords: window arithmetic and ranking."""

import pandas as pd
import pytest

from koncorde_spark.pipeline.chunking import chunk_documents, doc_keywords


@pytest.mark.spark
class TestChunking:
    def test_window_arithmetic(self, spark):
        text = " ".join(f"t{i}" for i in range(10))
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "text": [text, "a b", ""]})
        )
        rows = chunk_documents(df, chunk_tokens=4, overlap=1).orderBy(
            "doc_id", "chunk_idx"
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(int(r["doc_id"]), []).append(r)
        # doc 1: 10 tokens, stride 3 -> starts 0,3,6 cover to 10? start 6
        # covers 6..9 (4 toks) -> n_chunks = ceil((10-4)/3)+1 = 3
        c1 = by_doc[1]
        assert [int(r["start_tok"]) for r in c1] == [0, 3, 6]
        assert [int(r["n_toks"]) for r in c1] == [4, 4, 4]
        assert c1[1]["chunk_text"] == "t3 t4 t5 t6"
        # every token is covered
        covered = set()
        for r in c1:
            covered |= set(range(int(r["start_tok"]), int(r["start_tok"]) + int(r["n_toks"])))
        assert covered == set(range(10))
        # doc 2: shorter than window -> one partial chunk
        assert len(by_doc[2]) == 1 and int(by_doc[2][0]["n_toks"]) == 2
        # doc 3: token-free -> no chunks
        assert 3 not in by_doc

    def test_partial_last_chunk_not_suffix(self, spark):
        # 9 tokens, window 4, overlap 1 (stride 3): last chunk starts at 6
        # with 3 tokens — partial, but introduces tokens 7,8
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": [" ".join("abcdefghi")]})
        )
        rows = chunk_documents(df, 4, 1).collect()
        last = max(rows, key=lambda r: int(r["chunk_idx"]))
        assert int(last["start_tok"]) == 6 and int(last["n_toks"]) == 3

    def test_param_validation(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
        with pytest.raises(ValueError):
            chunk_documents(df, 0, 0)
        with pytest.raises(ValueError):
            chunk_documents(df, 4, 4)


@pytest.mark.spark
class TestKeywords:
    def test_tfidf_ranking_and_stopword_suppression(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "common rare1 rare1 rare1 shared",
                        "common shared other",
                        "common unique",
                    ],
                }
            )
        )
        rows = doc_keywords(df, 3).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(int(r["doc_id"]), []).append(r)
        # 'common' is in every doc -> idf 0 -> never a keyword
        assert all(r["term"] != "common" for rs in by_doc.values() for r in rs)
        # doc 1's top keyword: rare1 (tf=3, df=1) beats shared (df=2)
        assert by_doc[1][0]["term"] == "rare1" and int(by_doc[1][0]["rank"]) == 1
        assert by_doc[3][0]["term"] == "unique"
        # scores strictly ordered within a doc (ties broken by term asc)
        for rs in by_doc.values():
            scores = [float(r["score"]) for r in rs]
            assert scores == sorted(scores, reverse=True)
