"""Query-string parser + execution tests: grammar coverage, error cases,
and rank-parity of the dispatched paths on the serving tier (shared
kernels make job-tier parity transitive via test_serve)."""

import pytest

from koncorde_spark.errors import KoncordeParseError
from koncorde_spark.fulltext.querystring import (
    Clause,
    execute_query_string,
    parse_query_string,
)


class TestParse:
    def test_bare_terms_default_should(self):
        cs = parse_query_string("spark join merge")
        assert [c.kind for c in cs] == ["term"] * 3
        assert all(c.modifier == "" and c.boost == 1.0 for c in cs)
        assert [c.terms for c in cs] == [["spark"], ["join"], ["merge"]]

    def test_modifiers_and_boost(self):
        cs = parse_query_string("+spark -hive join^2.5")
        assert (cs[0].modifier, cs[1].modifier, cs[2].modifier) == ("+", "-", "")
        assert cs[2].boost == 2.5

    def test_phrase_with_slop(self):
        (c,) = parse_query_string('"Spark Batch jobs"~2')
        assert c.kind == "phrase" and c.slop == 2
        assert c.terms == ["spark", "batch", "jobs"]

    def test_prefix_and_fuzzy(self):
        cs = parse_query_string("merg* fuzzz~ dist~2")
        assert cs[0].kind == "prefix" and cs[0].text == "merg"
        assert cs[1].kind == "fuzzy" and cs[1].max_distance == 1
        assert cs[2].kind == "fuzzy" and cs[2].max_distance == 2

    def test_case_folding_matches_tokenizer(self):
        (c,) = parse_query_string("SPARK")
        assert c.terms == ["spark"]

    def test_multi_token_word_flattens(self):
        (c,) = parse_query_string("foo.bar")
        assert c.kind == "term" and c.terms == ["foo", "bar"]

    def test_errors(self):
        for bad in ["", "   ", '"unbalanced', '""', "+", "!!!"]:
            with pytest.raises(KoncordeParseError):
                parse_query_string(bad)

    def test_lone_star_not_prefix(self):
        # '*' alone has no stem -> no indexable token
        with pytest.raises(KoncordeParseError):
            parse_query_string("*")


class _SpySearcher:
    """Records which engine path execute_query_string dispatches to."""

    def __init__(self):
        self.calls = []

    def topk(self, query, k):
        self.calls.append(("topk", query, k))
        return "TOPK"

    def topk_phrase(self, phrase, k, slop=0):
        self.calls.append(("phrase", phrase, k, slop))
        return "PHRASE"

    def topk_boolean(self, must=None, should=None, must_not=None, boosts=None, k=10):
        self.calls.append(("boolean", must, should, must_not, boosts, k))
        return "BOOL"

    def expand_prefix(self, prefix, max_expansions=50):
        return [prefix + "e", prefix + "ed"]

    def expand_fuzzy(self, term, max_distance=1, max_expansions=50):
        return [term, term + "x"]


class TestDispatch:
    def test_pure_or_uses_wand_fast_path(self):
        s = _SpySearcher()
        assert execute_query_string(s, "spark join", k=7) == "TOPK"
        assert s.calls == [("topk", "spark join", 7)]

    def test_lone_phrase_uses_positional_path(self):
        s = _SpySearcher()
        assert execute_query_string(s, '"spark batch"~1', k=5) == "PHRASE"
        assert s.calls == [("phrase", "spark batch", 5, 1)]

    def test_boolean_with_expansion(self):
        s = _SpySearcher()
        out = execute_query_string(s, "+spark -hive merg* join^2", k=9)
        assert out == "BOOL"
        (_, must, should, must_not, boosts, k) = s.calls[-1]
        assert must == ["spark"]
        assert should == ["merge", "merged", "join"]
        assert must_not == ["hive"]
        assert boosts == {"join": 2.0}
        assert k == 9

    def test_negated_phrase_degrades_to_not_terms(self):
        s = _SpySearcher()
        execute_query_string(s, 'spark -"bad apple"')
        (_, must, should, must_not, boosts, _) = s.calls[-1]
        assert must_not == ["bad", "apple"]
        assert should == ["spark"]

    def test_combined_phrase_degrades_to_must(self):
        s = _SpySearcher()
        execute_query_string(s, '"a b" c')
        (_, must, should, must_not, boosts, _) = s.calls[-1]
        assert must == ["a", "b"] and should == ["c"]

    def test_must_expansion_rejected(self):
        s = _SpySearcher()
        with pytest.raises(KoncordeParseError):
            execute_query_string(s, "+merg*")
        with pytest.raises(KoncordeParseError):
            execute_query_string(s, "+fuzz~")

    def test_negated_expansion_ok(self):
        s = _SpySearcher()
        execute_query_string(s, "spark -merg*")
        (_, must, should, must_not, boosts, _) = s.calls[-1]
        assert must_not == ["merge", "merged"]

    def test_repeated_boost_keeps_max(self):
        s = _SpySearcher()
        execute_query_string(s, "+a join^2 join^3")
        (_, _, _, _, boosts, _) = s.calls[-1]
        assert boosts == {"join": 3.0}

    def test_synonyms_expand_should_with_inherited_boost(self):
        s = _SpySearcher()
        execute_query_string(
            s, "+spark sort^2", synonyms={"sort": ["merge", "shuffle"]}
        )
        (_, must, should, must_not, boosts, _) = s.calls[-1]
        assert must == ["spark"]
        assert should == ["sort", "merge", "shuffle"]
        assert boosts == {"sort": 2.0, "merge": 2.0, "shuffle": 2.0}

    def test_synonyms_expand_must_not(self):
        s = _SpySearcher()
        execute_query_string(s, "spark -sort", synonyms={"sort": ["merge"]})
        (_, _, should, must_not, _, _) = s.calls[-1]
        assert should == ["spark"]
        assert must_not == ["sort", "merge"]

    def test_synonyms_on_must_rejected(self):
        s = _SpySearcher()
        with pytest.raises(KoncordeParseError):
            execute_query_string(s, "+sort", synonyms={"sort": ["merge"]})

    def test_synonyms_skip_phrase_prefix_fuzzy(self):
        s = _SpySearcher()
        execute_query_string(
            s, '"sort order" merg* fuzz~ spark',
            synonyms={"sort": ["x"], "merg": ["y"], "fuzz": ["z"]},
        )
        (_, must, should, must_not, boosts, _) = s.calls[-1]
        # phrase degrades to must of its literal terms; expansions literal
        assert must == ["sort", "order"]
        assert "x" not in should and "y" not in should and "z" not in should

    def test_synonyms_unboosted_still_wand_fast_path(self):
        s = _SpySearcher()
        out = execute_query_string(s, "spark sort", synonyms={"sort": ["merge"]})
        assert out == "TOPK"
        assert s.calls == [("topk", "spark sort merge", 10)]


class TestServingTierExecution:
    def test_query_string_matches_direct_calls(self, bm25_pos_index_dir):
        from koncorde_spark.fulltext.serve import LocalSearcher

        ls = LocalSearcher(bm25_pos_index_dir)
        # OR fast path == direct topk
        assert execute_query_string(ls, "def function", k=8) == ls.topk(
            "def function", 8
        )
        # lone phrase == direct phrase
        assert execute_query_string(ls, '"def function"', k=8) == ls.phrase(
            "def function", 8
        )
        # boolean path == direct boolean with the same expansion
        exp = ls.expand_prefix("funct", 50)
        got = execute_query_string(ls, "+def funct* -xyzzynotaterm", k=8)
        want = ls.topk_boolean(
            must=["def"], should=exp, must_not=["xyzzynotaterm"], k=8
        )
        assert got == want


class TestFuzz:
    """Property fuzz: the parser either parses or raises KoncordeParseError
    — never any other exception — and every successfully parsed query
    dispatches through execute_query_string without error."""

    def test_random_strings_never_crash(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        printable = st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40,
        )

        @settings(max_examples=300, deadline=None)
        @given(printable)
        def run(qs):
            s = _SpySearcher()
            try:
                clauses = parse_query_string(qs)
            except KoncordeParseError:
                return
            assert clauses  # a successful parse yields >= 1 clause
            for c in clauses:
                assert c.kind in ("term", "prefix", "fuzzy", "phrase")
                assert c.terms, c
            try:
                execute_query_string(s, qs, k=5)
            except KoncordeParseError:
                pass  # semantic rejections (e.g. +prefix*) are legal

        run()

    def test_grammar_generator_round_trips(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        word = st.text(alphabet="abcdefg0_", min_size=1, max_size=8)
        clause = st.one_of(
            word,
            word.map(lambda w: f"+{w}"),
            word.map(lambda w: f"-{w}"),
            word.map(lambda w: f"{w}*"),
            word.map(lambda w: f"{w}~1"),
            word.map(lambda w: f"{w}^2"),
            st.tuples(word, word).map(lambda t: f'"{t[0]} {t[1]}"'),
        )
        query = st.lists(clause, min_size=1, max_size=5).map(" ".join)

        @settings(max_examples=200, deadline=None)
        @given(query)
        def run(qs):
            s = _SpySearcher()
            try:
                out = execute_query_string(s, qs, k=3)
            except KoncordeParseError:
                return  # only semantic rejections allowed on valid grammar
            assert out in ("TOPK", "PHRASE", "BOOL")

        run()


class TestNonPositionalPhrase:
    def test_lone_phrase_degrades_without_positions(self, bm25_index_dir):
        """The default (positions=False) index must not crash on a lone
        phrase: it degrades to the conjunctive MUST of the phrase terms,
        exactly like a combined phrase."""
        from koncorde_spark.fulltext.serve import LocalSearcher

        ls = LocalSearcher(bm25_index_dir)
        assert not ls.meta.get("positions")
        got = execute_query_string(ls, '"import ident_00001"', k=6)
        want = ls.topk_boolean(must=["import", "ident_00001"], k=6)
        assert got == want

    def test_lone_phrase_positional_with_boost_scales(self, bm25_pos_index_dir):
        from koncorde_spark.fulltext.serve import LocalSearcher

        ls = LocalSearcher(bm25_pos_index_dir)
        plain = execute_query_string(ls, '"def function"', k=5)
        boosted = execute_query_string(ls, '"def function"^2', k=5)
        assert [d for d, _ in boosted] == [d for d, _ in plain]
        for (d1, s1), (d2, s2) in zip(plain, boosted):
            assert abs(s2 - 2.0 * s1) < 1e-12
