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


@pytest.mark.spark
class TestSignificantTerms:
    def test_planted_overrepresented_term(self, spark):
        from koncorde_spark.fulltext.facets import significant_terms

        rows = []
        # 10 matching docs all carry 'signal'; 40 background docs don't
        for i in range(10):
            rows.append((i, f"query signal pad_{i}"))
        for i in range(10, 50):
            rows.append((i, f"noise filler pad_{i}"))
        # 'pad_*' are unique per doc (df=1 each -> under min_doc_count);
        # 'noise'/'filler' never co-occur with the query
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        got = significant_terms(df, ["query"], top_n=5, min_doc_count=3).collect()
        assert got, "planted term must surface"
        assert got[0]["term"] == "signal"
        assert int(got[0]["fg_count"]) == 10 and int(got[0]["bg_count"]) == 10
        terms = {r["term"] for r in got}
        assert "query" not in terms        # query terms excluded
        assert "noise" not in terms        # zero foreground -> filtered
        assert not any(t.startswith("pad_") for t in terms)  # min_doc_count

    def test_duckdb_parity(self, spark):
        from koncorde_spark.fulltext.facets import (
            significant_terms,
            significant_terms_sql,
        )

        pdf = _fixture()
        got = (
            significant_terms(
                spark.createDataFrame(pdf), ["spark"], top_n=5, min_doc_count=1
            ).toPandas().reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", pdf)
        want = con.execute(
            significant_terms_sql("documents", ["spark"], 5, 1)
        ).df()
        assert got.equals(want)


@pytest.mark.spark
class TestStatsFacet:
    def test_matches_pandas_and_duckdb(self, spark):
        from koncorde_spark.fulltext.facets import stats_facet, stats_facet_sql
        from koncorde_spark.fulltext.tokenizer import tokenize_text

        pdf = _fixture()
        got = stats_facet(
            spark.createDataFrame(pdf), ["spark"], "doc_id"
        ).toPandas().reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", pdf)
        want = con.execute(
            stats_facet_sql("documents", ["spark"], "doc_id")
        ).df()
        assert got.equals(want)
        m = pdf[pdf["text"].map(
            lambda t: isinstance(t, str) and "spark" in tokenize_text(t)
        )]
        assert int(got.loc[0, "n_docs"]) == len(m)
        assert float(got.loc[0, "min"]) == float(m["doc_id"].min())
