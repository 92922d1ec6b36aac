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


# (filter, exact error message) — extracted verbatim from the reference's
# #validation sections (test/keywords/*.test.js + test/operands/*.test.js,
# `should(...).throw({message: ...})` assertions). Our messages must match
# the reference's BYTE-FOR-BYTE.
EXACT_MESSAGES = [
    ({"equals": ["foo", "bar"]}, '"equals": must be an object'),
    ({"equals": {}}, '"equals": expected object to have exactly 1 property, got 0'),
    ({"equals": {"foo": "foo", "bar": "bar"}}, '"equals": expected object to have exactly 1 property, got 2'),
    ({"equals": {"foo": ["bar"]}}, '"equals.foo": must either be a string, a number, a boolean, or null'),
    ({"equals": {"foo": {}}}, '"equals.foo": must either be a string, a number, a boolean, or null'),
    ({"exists": {}}, '"exists": expected object to have exactly 1 property, got 0'),
    ({"exists": {"field": "foo", "bar": "bar"}}, '"exists": expected object to have exactly 1 property, got 2'),
    ({"exists": {"foo": "bar"}}, '"exists": the property "field" is missing'),
    ({"exists": {"field": ["bar"]}}, '"exists.field": must be a string'),
    ({"exists": {"field": 42}}, '"exists.field": must be a string'),
    ({"exists": {"field": None}}, '"exists.field": must be a string'),
    ({"exists": {"field": True}}, '"exists.field": must be a string'),
    ({"exists": {"field": ""}}, '"exists.field": cannot be empty'),
    ({"exists": ""}, '"exists": cannot test empty field name'),
    ({"exists": "foo['bar']"}, '"exists": contains an invalid array value ("\'bar\'")'),
    ({"ids": {}}, '"ids": expected object to have exactly 1 property, got 0'),
    ({"ids": {"foo": ["foo"]}}, '"ids": the property "values" is missing'),
    ({"ids": {"values": ["foo"], "foo": ["foo"]}}, '"ids": expected object to have exactly 1 property, got 2'),
    ({"ids": {"values": []}}, '"ids.values": cannot be empty'),
    ({"ids": {"values": "foo"}}, '"ids.values": must be an array'),
    ({"ids": {"values": ["foo", "bar", 42, "baz"]}}, '"ids.values": must hold only values of type "string"'),
    ({"in": {}}, '"in": expected object to have exactly 1 property, got 0'),
    ({"in": {"bar": ["foo"], "foo": ["foo"]}}, '"in": expected object to have exactly 1 property, got 2'),
    ({"in": {"foo": []}}, '"in.foo": cannot be empty'),
    ({"in": {"foo": "foo"}}, '"in.foo": must be an array'),
    ({"in": {"foo": ["foo", "bar", 42, "baz"]}}, '"in.foo": must hold only values of type "string"'),
    ({"match": ["foo", "bar"]}, '"match": must be an object'),
    ({"match": {}}, '"match": must be a non-empty object'),
    ({"range": {}}, '"range": expected object to have exactly 1 property, got 0'),
    ({"range": {"foo": "foo", "bar": "bar"}}, '"range": expected object to have exactly 1 property, got 2'),
    ({"range": {"foo": {}}}, '"range.foo": must be a non-empty object'),
    ({"range": {"foo": {"gt": 42, "lt": 113, "bar": "baz"}}}, '"range.foo": "bar" is not an allowed attribute (allowed: gt,gte,lt,lte)'),
    ({"range": {"foo": {"gt": "42", "lt": 113}}}, '"range.foo.gt": must be a number'),
    ({"range": {"foo": {"gt": 42, "gte": 13, "lt": 113}}}, '"range.foo": only 1 lower boundary allowed'),
    ({"range": {"foo": {"gt": 42, "lt": 113, "lte": 200}}}, '"range.foo": only 1 upper boundary allowed'),
    ({"range": {"foo": {"lt": 42, "gt": 200}}}, '"range.foo": lower boundary must be strictly inferior to the upper one'),
    ({"regexp": {}}, '"regexp": expected object to have exactly 1 property, got 0'),
    ({"regexp": {"foo": {}}}, '"regexp.foo": must be a non-empty object'),
    ({"regexp": {"foo": {"value": "v", "bar": 1}}}, '"regexp.foo": "bar" is not an allowed attribute (allowed: flags,value)'),
    ({"regexp": {"foo": {"flags": "ig"}}}, '"regexp.foo": the property "value" is missing'),
    ({"regexp": {"foo": {"value": "foo", "flags": 42}}}, '"regexp.foo.flags": must be a string'),
    ({"select": ["foo", "bar"]}, '"select": must be an object'),
    ({"select": {}}, '"select": expected object to have exactly 3 properties, got 0'),
    ({"select": {"foo": "bar", "index": 0, "query": {"equals": {"value": "bar"}}}}, '"select.field": must be a string'),
    ({"select": {"foo": "bar", "field": "foo", "query": {"equals": {"value": "bar"}}}}, '"select.index": must be an integer'),
    ({"select": {"foo": "bar", "field": "foo", "index": 0}}, '"select.query": must be an object'),
    ({"select": {"field": 42, "index": 0, "query": {"equals": {"value": "bar"}}}}, '"select.field": must be a string'),
    ({"select": {"field": "foo", "index": 1.2, "query": {"equals": {"value": "bar"}}}}, '"select.index": cannot have decimals, must be an integer'),
    ({"select": {"field": "foo", "index": 0, "query": {"yeet": {"foo": "bar"}}}}, '"select.query.yeet": unknown keyword'),
    ({"and": []}, '"and": cannot be empty'),
    ({"and": {"foo": "bar"}}, '"and": must be an array'),
    ({"bool": {}}, '"bool": must be a non-empty object'),
    ({"or": []}, '"or": cannot be empty'),
    ({"or": {"foo": "bar"}}, '"or": must be an array'),
]


@pytest.mark.parametrize(
    "filt,message", EXACT_MESSAGES, ids=[m for _, m in EXACT_MESSAGES]
)
def test_exact_reference_error_message(k, filt, message):
    with pytest.raises(KoncordeParseError) as exc:
        k.validate(filt)
    assert str(exc.value) == message


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
