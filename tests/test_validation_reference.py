"""Validation-rejection matrix ported from the reference keyword suites'
#validation sections (test/keywords/*.test.js) — every malformed filter
shape the reference rejects must also fail registration here."""

import pytest

from koncorde_spark import Koncorde
from koncorde_spark.errors import KoncordeParseError


@pytest.fixture
def k():
    return Koncorde()


REJECTED = [
    # equals (equals.test.js #validation)
    {"equals": ["foo", "bar"]},
    {"equals": {}},
    {"equals": {"a": 1, "b": 2}},
    {"equals": {"a": ["array"]}},
    {"equals": {"a": {"obj": 1}}},
    # exists (exists.test.js:17-106)
    {"exists": {}},
    {"exists": {"field": "foo", "extra": 1}},
    {"exists": ["foo"]},
    {"exists": 42},
    {"exists": None},
    {"exists": True},
    {"exists": ""},
    # ids (ids.test.js:12-64)
    {"ids": {}},
    {"ids": {"values": ["a"], "extra": 1}},
    {"ids": {"values": []}},
    {"ids": {"values": "notanarray"}},
    {"ids": {"values": ["ok", 42]}},
    # in (in.test.js:12-56)
    {"in": {}},
    {"in": {"a": ["x"], "b": ["y"]}},
    {"in": {"a": []}},
    {"in": {"a": "notanarray"}},
    {"in": {"a": ["ok", 42]}},
    # range (range.test.js:17-94)
    {"range": {}},
    {"range": {"a": {"gt": 1}, "b": {"lt": 2}}},
    {"range": {"a": {}}},
    {"range": {"a": {"gt": 1, "weird": 2}}},
    {"range": {"a": {"gt": "NaN-ish"}}},
    {"range": {"a": {"gt": 1, "gte": 2}}},
    {"range": {"a": {"lt": 1, "lte": 2}}},
    {"range": {"a": {"gt": 10, "lt": 5}}},
    # regexp (regexp.test.js #validation)
    {"regexp": {}},
    {"regexp": {"a": {"flags": "i"}}},  # missing value
    {"regexp": {"a": {"value": "x", "extra": 1}}},
    {"regexp": {"a": 42}},
    {"regexp": {"a": "["}},  # unparseable pattern
    # select (select.test.js:20-126)
    {"select": ["foo", "bar"]},
    {"select": {}},
    {"select": {"index": 0, "query": {"equals": {"value": 1}}}},
    {"select": {"field": "foo", "query": {"equals": {"value": 1}}}},
    {"select": {"field": "foo", "index": 0}},
    {"select": {"field": 42, "index": 0, "query": {"equals": {"value": 1}}}},
    {"select": {"field": "foo", "index": "x", "query": {"equals": {"value": 1}}}},
    {"select": {"field": "foo", "index": 0, "query": {"bogus": 1}}},
    # match / nothing shapes
    {"match": ["foo"]},
    {"match": {}},
    # geo
    {"geoBoundingBox": {}},
    {"geoBoundingBox": {"pos": {"top": 1}}},
    {"geoDistance": {"pos": {"lat": 0, "lon": 0}}},  # missing distance
    {"geoPolygon": {"pos": {"points": [[0, 0], [1, 1]]}}},  # 2 points
    # operands
    {"and": []},
    {"and": {"not": "a list"}},
    {"or": []},
    {"not": {}},
    {"bool": {"weird_attr": []}},
    {"unknown_keyword": {"a": 1}},
    {"equals": {"a": 1}, "exists": "b"},  # multiple keywords
]


@pytest.mark.parametrize("filt", REJECTED, ids=[repr(f)[:60] for f in REJECTED])
def test_rejected(k, filt):
    with pytest.raises(KoncordeParseError):
        k.register(filt)


ACCEPTED = [
    {"equals": {"a": "str"}},
    {"equals": {"a": 1.5}},
    {"equals": {"a": True}},
    {"equals": {"a": None}},
    {"exists": "foo"},
    {"exists": {"field": "foo"}},  # object form (exists.test.js:98)
    {"ids": {"values": ["a", "b"]}},
    {"in": {"a": ["x", "y"]}},
    {"range": {"a": {"gt": 1, "lte": 5}}},
    {"regexp": {"a": "^x"}},
    {"regexp": {"a": {"value": "^x", "flags": "i"}}},
    {"select": {"field": "f", "index": -1, "query": {"exists": "value"}}},
    {"match": {"a": 1}},
    {"match": {"a": [1, 2]}},
    {"nothing": True},
    {},
]


@pytest.mark.parametrize("filt", ACCEPTED, ids=[repr(f)[:60] for f in ACCEPTED])
def test_accepted(k, filt):
    k.register(filt)  # must not raise


def test_bad_distance_raises_like_reference(k):
    # the reference throws a plain Error from convertDistance
    # (lib/util/convertDistance.js:43), not a parse error
    with pytest.raises(ValueError, match="unable to parse distance"):
        k.register({"geoDistance": {"pos": {"lat": 0, "lon": 0}, "distance": "xx yy"}})
