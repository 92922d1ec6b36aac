"""More-like-this tests: term selection guards, seed exclusion,
hand-checkable neighbor ranking, DuckDB twin parity."""

import duckdb
import pandas as pd
import pytest

from koncorde_spark.fulltext.mlt import mlt_terms, more_like_this, more_like_this_sql


def _corpus() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                # seed: zebra repeated, quux is a hapax (df=1 -> dropped
                # by min_doc_freq=2), common appears everywhere
                "zebra zebra quux common topic alpha",
                "zebra topic common words here",     # best neighbor
                "topic common and other words",      # weaker neighbor
                "common filler text nothing else",   # shares only 'common'
                "completely unrelated content block",
                "zebra common",                      # short zebra doc
            ],
        }
    )


class TestMltTerms:
    def test_selection_guards_and_order(self, spark):
        got = (
            mlt_terms(spark.createDataFrame(_corpus()), 0, min_doc_freq=2)
            .toPandas()
        )
        terms = list(got["term"])
        # hapax 'quux' (df=1) dropped; 'zebra' (tf=2, low df) ranks first
        assert "quux" not in terms
        assert terms[0] == "zebra"
        # ubiquitous 'common' (df=6) scores lowest of the survivors
        assert terms[-1] == "common"
        assert (got["mlt_score"].diff().dropna() <= 0).all()

    def test_min_term_freq(self, spark):
        got = (
            mlt_terms(
                spark.createDataFrame(_corpus()), 0,
                min_term_freq=2, min_doc_freq=1,
            ).toPandas()
        )
        # only 'zebra' appears twice in the seed
        assert list(got["term"]) == ["zebra"]

    def test_missing_seed_empty(self, spark):
        sdf = spark.createDataFrame(_corpus())
        assert mlt_terms(sdf, 999).count() == 0
        got = more_like_this(sdf, 999)
        assert got.count() == 0
        assert got.columns == ["doc_id", "score"]


class TestMoreLikeThis:
    def test_neighbors_and_seed_excluded(self, spark):
        got = more_like_this(
            spark.createDataFrame(_corpus()), 0, k=10, min_doc_freq=2
        ).toPandas()
        assert 0 not in set(got["doc_id"])          # seed excluded
        assert got.loc[0, "doc_id"] in (1, 5)       # a zebra doc wins
        assert 4 not in set(got["doc_id"])          # no shared terms
        assert (got["score"].diff().dropna() <= 0).all()

    def test_duckdb_parity(self, spark):
        pdf = _corpus()
        got = (
            more_like_this(spark.createDataFrame(pdf), 0, k=10)
            .toPandas().reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", pdf)
        want = con.execute(more_like_this_sql("documents", 0, k=10)).df()
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert (got["score"].to_numpy() == want["score"].to_numpy()).all()

    def test_exclude_ids_keeps_stats(self, spark):
        """Scores of surviving docs are identical whether or not the seed
        is excluded — exclusion gates candidates, not statistics."""
        from koncorde_spark.fulltext.brute import bm25_brute_topk

        sdf = spark.createDataFrame(_corpus())
        full = bm25_brute_topk(sdf, ["zebra", "topic"], 10).toPandas()
        excl = bm25_brute_topk(
            sdf, ["zebra", "topic"], 10, exclude_ids=[0]
        ).toPandas()
        merged = full[full["doc_id"] != 0].reset_index(drop=True)
        assert merged.equals(excl.reset_index(drop=True))
