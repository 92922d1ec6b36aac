"""match / notmatch / ids fixtures ported verbatim from the reference
suite (test/keywords/match.test.js:80-151, notmatch.test.js matching
section, ids.test.js:73-80) — subset semantics, multiset arrays, nested
object elements, falsy-value equality, and the ids → or-of-equals
rewrite."""

import pytest

from koncorde_spark import Koncorde


@pytest.fixture
def k():
    return Koncorde()


class TestMatchReference:
    def test_partial_equal(self, k):
        fid = k.register({"match": {"foo": "bar"}})
        assert k.test({"foo": "bar", "bar": "baz"}) == [fid]

    def test_array_contains_all_filter_elements(self, k):
        fid = k.register({"match": {"foo": [4, 2]}})
        assert k.test({"foo": [1, 4, 9, 2]}) == [fid]

    def test_array_of_objects_subset(self, k):
        fid = k.register({"match": {"foo": [{"a": 1}]}})
        assert k.test({"foo": [{"b": 1}, {"a": 1, "b": 2}]}) == [fid]

    def test_other_value_no_match(self, k):
        k.register({"match": {"foo": "bar"}})
        assert k.test({"foo": "qux"}) == []

    def test_other_field_no_match(self, k):
        k.register({"match": {"foo": "bar"}})
        assert k.test({"qux": "bar"}) == []

    def test_type_mismatch_skips(self, k):
        # issue kuzzleio/koncorde#13
        k.register({"match": {"foo": "bar"}})
        assert k.test({"foo": ["bar"]}) == []
        assert k.test({"foo": {"bar": True}}) == []

    def test_nested_path_match(self, k):
        fid = k.register({"match": {"foo.bar.baz": "qux"}})
        assert k.test({"foo": {"bar": {"baz": "qux"}}}) == [fid]

    def test_zero_equality(self, k):
        fid = k.register({"match": {"a": 0}})
        assert k.test({"a": 0}) == [fid]

    def test_false_equality(self, k):
        fid = k.register({"match": {"a": False}})
        assert k.test({"a": False}) == [fid]

    def test_null_equality(self, k):
        fid = k.register({"match": {"a": None}})
        assert k.test({"a": None}) == [fid]

    def test_multiset_duplicates_consume(self, k):
        # multiset semantics: each pattern element consumes one doc element
        fid = k.register({"match": {"foo": ["x", "x"]}})
        assert k.test({"foo": ["x", "x", "y"]}) == [fid]
        assert k.test({"foo": ["x", "y"]}) == []


class TestNotMatchReference:
    def test_no_match_when_pattern_matches(self, k):
        k.register({"not": {"match": {"foo": "bar"}}})
        assert k.test({"foo": "bar"}) == []

    def test_match_other_value(self, k):
        fid = k.register({"not": {"match": {"foo": "bar"}}})
        assert k.test({"foo": "qux"}) == [fid]

    def test_match_missing_field(self, k):
        fid = k.register({"not": {"match": {"foo": "bar"}}})
        assert k.test({"qux": "bar"}) == [fid]

    def test_match_incomplete_array(self, k):
        fid = k.register({"not": {"match": {"foo": ["bar", "baz"]}}})
        assert k.test({"foo": ["bar"]}) == [fid]

    def test_match_incomplete_object_array(self, k):
        fid = k.register({"not": {"match": {"foo": [{"a": "bar"}, {"a": "baz"}]}}})
        assert k.test({"foo": [{"a": "bar"}, {"a": "qux"}]}) == [fid]

    def test_nested_path(self, k):
        fid = k.register({"not": {"match": {"foo.bar.baz": "qux"}}})
        assert k.test({"foo": {"bar": {"baz": "other"}}}) == [fid]
        assert k.test({"foo": {"bar": {"baz": "qux"}}}) == []

    def test_falsy_values(self, k):
        f0 = k.register({"not": {"match": {"a": 0}}})
        assert k.test({"a": 1}) == [f0]
        assert k.test({"a": 0}) == []


class TestIdsRewrite:
    def test_ids_rewrites_to_or_of_equals(self, k):
        out = k.transformer.standardizer.standardize(
            {"ids": {"values": ["foo", "bar", "baz"]}}
        )
        assert out == {
            "or": [
                {"equals": {"_id": "foo"}},
                {"equals": {"_id": "bar"}},
                {"equals": {"_id": "baz"}},
            ]
        }

    def test_ids_match(self, k):
        fid = k.register({"ids": {"values": ["a1", "a2"]}})
        assert k.test({"_id": "a1"}) == [fid]
        assert k.test({"_id": "zz"}) == []
