"""Normalizer tests: standardization errors, canonical DNF goldens
(ported from /root/reference/test/transform/canonical.test.js and
api.test.js behaviors), filter-ID stability."""

import pytest

from koncorde_spark import Koncorde, KoncordeParseError
from koncorde_spark.normalize import Transformer
from koncorde_spark.normalize.canonical import FilterTooComplexError


@pytest.fixture
def t():
    return Transformer()


class TestStandardizeErrors:
    def test_multiple_keywords(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"equals": {"a": 1}, "exists": "b"})

    def test_unknown_keyword(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"foo": {"a": 1}})

    def test_equals_non_scalar(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"equals": {"a": {"b": 1}}})

    def test_range_two_lower_bounds(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"range": {"x": {"gt": 1, "gte": 2, "lt": 10}}})

    def test_range_inverted(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"range": {"x": {"gte": 10, "lte": 5}}})

    def test_range_non_number(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"range": {"x": {"gt": "a"}}})

    def test_ids_non_string(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"ids": {"values": [1, 2]}})

    def test_in_non_string(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"in": {"f": ["a", 1]}})

    def test_empty_and(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"and": []})

    def test_and_non_object(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"and": [{"equals": {"a": 1}}, 42]})

    def test_bool_bad_attr(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"bool": {"nope": []}})

    def test_regexp_invalid(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"regexp": {"f": "["}})

    def test_exists_empty_field(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"exists": ""})

    def test_geopolygon_two_points(self, t):
        with pytest.raises(KoncordeParseError):
            t.normalize({"geoPolygon": {"p": {"points": [[0, 0], [1, 1]]}}})

    def test_max_conditions(self):
        tr = Transformer(max_conditions=3)
        with pytest.raises(FilterTooComplexError):
            tr.normalize({"and": [{"equals": {f"f{i}": i}} for i in range(5)]})


class TestCanonical:
    def test_empty_is_everything(self, t):
        assert t.normalize({}).dnf == [[{"everything": True}]]

    def test_single_condition(self, t):
        assert t.normalize({"equals": {"a": 1}}).dnf == [[{"equals": {"a": 1}, "not": False}]]

    def test_nothing(self, t):
        assert t.normalize({"nothing": True}).dnf == [[{"nothing": True, "not": False}]]

    def test_contradiction_equals(self, t):
        dnf = t.normalize({"and": [{"equals": {"a": 1}}, {"equals": {"a": 2}}]}).dnf
        assert dnf == [[{"nothing": True}]]

    def test_contradiction_exists(self, t):
        dnf = t.normalize({"and": [{"exists": "a"}, {"missing": "a"}]}).dnf
        assert dnf == [[{"nothing": True}]]

    def test_contradiction_equals_notequals(self, t):
        dnf = t.normalize(
            {"and": [{"equals": {"a": 1}}, {"not": {"equals": {"a": 1}}}]}
        ).dnf
        assert dnf == [[{"nothing": True}]]

    def test_contradiction_range_equals(self, t):
        dnf = t.normalize(
            {"and": [{"equals": {"a": 100}}, {"range": {"a": {"lt": 50}}}]}
        ).dnf
        assert dnf == [[{"nothing": True}]]

    def test_or_expansion(self, t):
        dnf = t.normalize({"or": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]}).dnf
        assert len(dnf) == 2

    def test_and_single_clause(self, t):
        dnf = t.normalize({"and": [{"equals": {"a": 1}}, {"exists": "b"}]}).dnf
        assert len(dnf) == 1 and len(dnf[0]) == 2

    def test_clause_keyword_sorted(self, t):
        dnf = t.normalize({"and": [{"range": {"z": {"gt": 0}}}, {"equals": {"a": 1}}]}).dnf
        kws = [next(k for k in c if k != "not") for c in dnf[0]]
        assert kws == sorted(kws)

    def test_demorgan_not_and(self, t):
        a = t.normalize({"not": {"and": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]}})
        b = t.normalize({"or": [{"not": {"equals": {"a": 1}}}, {"not": {"equals": {"b": 2}}}]})
        assert a.filter_id == b.filter_id

    def test_double_negation(self, t):
        a = t.normalize({"not": {"not": {"equals": {"a": 1}}}})
        b = t.normalize({"equals": {"a": 1}})
        assert a.filter_id == b.filter_id


class TestFilterIds:
    def test_equivalent_filters_same_id(self, t):
        a = t.normalize({"in": {"f": ["x", "y"]}})
        b = t.normalize({"or": [{"equals": {"f": "x"}}, {"equals": {"f": "y"}}]})
        assert a.filter_id == b.filter_id

    def test_index_changes_id(self, t):
        a = t.normalize({"equals": {"a": 1}}, None)
        b = t.normalize({"equals": {"a": 1}}, "other")
        assert a.filter_id != b.filter_id

    def test_id_is_deterministic(self):
        t1, t2 = Transformer(), Transformer()
        f = {"and": [{"range": {"x": {"gte": 2, "lt": 9}}}, {"regexp": {"s": "^a"}}]}
        assert t1.normalize(f).filter_id == t2.normalize(f).filter_id

    def test_seed_changes_id(self):
        a = Transformer(seed=bytes(32)).normalize({"equals": {"a": 1}})
        b = Transformer(seed=bytes(range(32))).normalize({"equals": {"a": 1}})
        assert a.filter_id != b.filter_id


class TestApiSurface:
    def test_register_normalize_store_equivalence(self):
        k = Koncorde()
        n = k.normalize({"equals": {"a": 1}})
        fid1 = k.store(n)
        fid2 = k.register({"equals": {"a": 1}})
        assert fid1 == fid2
        assert k.get_filter_ids() == [fid1]

    def test_named_indexes(self):
        k = Koncorde()
        f1 = k.register({"equals": {"a": 1}}, index="i1")
        assert k.has_filter_id(f1, "i1")
        assert not k.has_filter_id(f1)
        assert k.test({"a": 1}) == []
        assert k.test({"a": 1}, index="i1") == [f1]
        k.remove(f1, index="i1")
        assert k.get_indexes() == []  # empty named index removed

    def test_validate(self):
        k = Koncorde()
        k.validate({"equals": {"a": 1}})
        with pytest.raises(KoncordeParseError):
            k.validate({"equals": {"a": {}}})
