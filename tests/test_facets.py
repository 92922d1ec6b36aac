"""Faceted search (terms aggregations) tests: crafted counts, any/all
match modes, NULL exclusion, top-N tie-break, DuckDB twin parity."""

import duckdb
import pandas as pd
import pytest

from koncorde_spark.fulltext.facets import search_facets, search_facets_sql


def _fixture() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "spark join merge",          # matches any & all
                "spark only here",           # any
                "join the queue",            # any
                "nothing relevant",          # no match
                "SPARK Join MERGE mix",      # any & all (case folded)
                "spark again",               # any
                None,                        # no match (null text)
                "merge sort",                # any
            ],
            "lang": ["en", "en", "fr", "en", "de", "en", "en", None],
            "source": ["a", "b", "a", "a", "b", "a", "a", "b"],
        }
    )


class TestSearchFacets:
    def test_any_mode_counts(self, spark):
        got = (
            search_facets(
                spark.createDataFrame(_fixture()),
                ["spark", "join", "merge"],
                ["lang", "source"],
            )
            .toPandas()
        )
        lang = got[got["facet"] == "lang"].set_index("value")["n_docs"]
        # matching docs: 0,1,2,4,5,7 → langs en,en,fr,de,en,NULL
        assert lang.to_dict() == {"en": 3, "de": 1, "fr": 1}
        src = got[got["facet"] == "source"].set_index("value")["n_docs"]
        assert src.to_dict() == {"a": 3, "b": 3}

    def test_all_mode(self, spark):
        got = (
            search_facets(
                spark.createDataFrame(_fixture()),
                ["spark", "join", "merge"],
                ["lang"],
                mode="all",
            )
            .toPandas()
        )
        # only docs 0 (en) and 4 (de) contain all three terms
        assert got.set_index("value")["n_docs"].to_dict() == {"en": 1, "de": 1}

    def test_top_n_cut_ties_by_value(self, spark):
        pdf = pd.DataFrame(
            {
                "doc_id": range(6),
                "text": ["spark"] * 6,
                "lang": ["zz", "aa", "bb", "zz", "aa", "bb"],
            }
        )
        got = (
            search_facets(spark.createDataFrame(pdf), ["spark"], ["lang"], top_n=2)
            .toPandas()
        )
        # all three values count 2 → cut keeps lexicographically first two
        assert list(got["value"]) == ["aa", "bb"]

    def test_duckdb_parity(self, spark):
        pdf = _fixture()
        got = (
            search_facets(
                spark.createDataFrame(pdf),
                ["spark", "join", "merge"],
                ["lang", "source"],
                top_n=2,
            )
            .toPandas().reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", pdf)
        want = con.execute(
            search_facets_sql(
                "documents", ["spark", "join", "merge"], ["lang", "source"],
                top_n=2,
            )
        ).df()
        assert got.equals(want)

    def test_validation(self, spark):
        sdf = spark.createDataFrame(_fixture())
        with pytest.raises(ValueError):
            search_facets(sdf, ["x"], [])
        with pytest.raises(ValueError):
            search_facets(sdf, ["x"], ["lang"], mode="most")
