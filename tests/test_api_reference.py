"""API behaviors ported from the reference (test/api.test.js):
equivalent-filter ID convergence (De Morgan / bool forms), complex
mixed-keyword filters, named-index lifecycle, and the error surface."""

import pytest

from koncorde_spark import Koncorde
from koncorde_spark.errors import KoncordeError


@pytest.fixture
def k():
    return Koncorde()


class TestEquivalentFilterIds:
    def test_demorgan_and_bool_forms_converge(self, k):
        # api.test.js:100-128
        id1 = k.register(
            {"not": {"and": [{"exists": "bar"}, {"equals": {"foo": "bar"}}]}}
        )
        id2 = k.register(
            {"or": [{"not": {"exists": "bar"}}, {"not": {"equals": {"foo": "bar"}}}]}
        )
        id3 = k.register(
            {"bool": {"should_not": [{"exists": {"field": "bar"}}, {"equals": {"foo": "bar"}}]}}
        )
        assert id1 == id2 == id3

    def test_in_and_or_equals_converge(self, k):
        a = k.register({"in": {"lang": ["en", "de"]}})
        b = k.register(
            {"or": [{"equals": {"lang": "en"}}, {"equals": {"lang": "de"}}]}
        )
        assert a == b


class TestComplexFilter:
    def test_mixed_keyword_filter(self, k):
        # api.test.js:257-277
        fid = k.register(
            {
                "and": [
                    {"in": {"foo": ["bar", "baz"]}},
                    {
                        "or": [
                            {"range": {"num": {"lt": 10, "gte": 0}}},
                            {"range": {"num": {"lt": 100, "gte": 90}}},
                            {"not": {"range": {"num": {"lt": 50, "gt": 40}}}},
                        ]
                    },
                ]
            }
        )
        assert k.test({"foo": "qux", "num": 1}) == []
        assert k.test({"num": 41}) == []
        assert k.test({"foo": "bar", "num": 41}) == []
        assert k.test({"foo": "baz", "num": 91}) == [fid]


class TestIndexLifecycle:
    def test_empty_default_index(self, k):
        assert k.get_filter_ids() == []

    def test_missing_named_index(self, k):
        assert k.get_filter_ids("nope") == []
        assert k.test({"a": 1}, "nope") == []

    def test_has_filter_id(self, k):
        fid = k.register({"equals": {"a": 1}})
        assert k.has_filter_id(fid)
        assert not k.has_filter_id("deadbeef")
        assert not k.has_filter_id(fid, "other")

    def test_default_index_never_removed(self, k):
        fid = k.register({"equals": {"a": 1}})
        k.remove(fid)
        assert "(default)" in k.get_indexes()

    def test_named_index_removed_with_last_filter(self, k):
        fid = k.register({"equals": {"a": 1}}, "idx")
        assert "idx" in k.get_indexes()
        k.remove(fid, "idx")
        assert "idx" not in k.get_indexes()

    def test_same_filter_distinct_ids_across_indexes(self, k):
        a = k.register({"equals": {"a": 1}})
        b = k.register({"equals": {"a": 1}}, "idx")
        assert a != b  # index participates in the ID hash (lib/index.ts:187)


class TestErrorSurface:
    def test_invalid_max_conditions(self):
        with pytest.raises(KoncordeError):
            Koncorde(max_conditions=-1)

    def test_invalid_regexp_engine(self):
        with pytest.raises(KoncordeError):
            Koncorde(regexp_engine="pcre")

    def test_invalid_seed(self):
        with pytest.raises(Exception):
            Koncorde(seed=b"short")

    def test_filter_too_complex(self):
        k = Koncorde(max_conditions=3)
        with pytest.raises(Exception, match="[Tt]oo complex"):
            k.register(
                {"and": [{"equals": {f"f{i}": i}} for i in range(5)]}
            )
