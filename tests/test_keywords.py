"""Per-keyword match matrix, ported from the shapes exercised by
/root/reference/test/keywords/*.test.js (strict typing, missing-field
semantics of the negative keywords, array-value exists, match subset
semantics, select with negative indexes)."""

import pytest

from koncorde_spark import Koncorde


def matches(filt, doc, index=None):
    k = Koncorde()
    fid = k.register(filt, index) if index else k.register(filt)
    return fid in k.test(doc, index) if index else fid in k.test(doc)


CASES = [
    # equals — strict typing (matchEquals.js Map.get semantics)
    ({"equals": {"a": "foo"}}, {"a": "foo"}, True),
    ({"equals": {"a": "foo"}}, {"a": "bar"}, False),
    ({"equals": {"a": "foo"}}, {}, False),
    ({"equals": {"a": 1}}, {"a": 1}, True),
    ({"equals": {"a": 1}}, {"a": 1.0}, True),
    ({"equals": {"a": 1}}, {"a": "1"}, False),
    ({"equals": {"a": "1"}}, {"a": 1}, False),
    ({"equals": {"a": True}}, {"a": True}, True),
    ({"equals": {"a": True}}, {"a": 1}, False),
    ({"equals": {"a": None}}, {"a": None}, True),
    ({"equals": {"a": None}}, {"a": 0}, False),
    ({"equals": {"a.b": "x"}}, {"a": {"b": "x"}}, True),  # nested via flatten
    # notequals — missing field matches
    ({"not": {"equals": {"a": "foo"}}}, {"a": "bar"}, True),
    ({"not": {"equals": {"a": "foo"}}}, {}, True),
    ({"not": {"equals": {"a": "foo"}}}, {"a": "foo"}, False),
    ({"not": {"equals": {"a": 1}}}, {"a": "1"}, True),  # strict: '1' !== 1
    # notequals:null — DOCUMENTED DIVERGENCE (SURVEY §8, compiled.py:531):
    # the reference's `doc[key] !== null` lets a MISSING field match
    # (undefined !== null); here missing ≡ null, so it does NOT match —
    # consistent with the SQL twin on both engines. Pinned deliberately.
    ({"not": {"equals": {"a": None}}}, {}, False),
    ({"not": {"equals": {"a": None}}}, {"a": None}, False),
    ({"not": {"equals": {"a": None}}}, {"a": 1}, True),
    # exists
    ({"exists": "a"}, {"a": 1}, True),
    ({"exists": "a"}, {"a": None}, False),  # null collapses to missing (documented)
    ({"exists": "a"}, {}, False),
    ({"exists": "a.b"}, {"a": {"b": {"c": 1}}}, True),  # intermediate node
    ({"exists": 'tags["x"]'}, {"tags": ["x", "y"]}, True),
    ({"exists": 'tags["x"]'}, {"tags": ["y"]}, False),
    ({"exists": "tags[42]"}, {"tags": [42]}, True),
    ({"exists": "tags[42]"}, {"tags": ["42"]}, False),  # type-sensitive
    ({"exists": "tags[true]"}, {"tags": [True]}, True),
    ({"exists": "tags[true]"}, {"tags": [1]}, False),
    ({"exists": "tags[null]"}, {"tags": [None]}, True),
    # missing
    ({"missing": "a"}, {}, True),
    ({"missing": "a"}, {"a": 0}, False),
    ({"missing": 'tags["x"]'}, {"tags": ["y"]}, True),
    ({"missing": 'tags["x"]'}, {"tags": ["x"]}, False),
    ({"missing": 'tags["x"]'}, {"tags": "notanarray"}, True),
    ({"missing": 'tags["x"]'}, {}, True),
    # range (open/closed bounds)
    ({"range": {"n": {"gt": 5, "lt": 10}}}, {"n": 5}, False),
    ({"range": {"n": {"gt": 5, "lt": 10}}}, {"n": 6}, True),
    ({"range": {"n": {"gte": 5, "lte": 10}}}, {"n": 5}, True),
    ({"range": {"n": {"gte": 5, "lte": 10}}}, {"n": 10}, True),
    ({"range": {"n": {"gt": 5}}}, {"n": 1e9}, True),
    ({"range": {"n": {"lt": 5}}}, {"n": -1e9}, True),
    ({"range": {"n": {"gt": 5, "lt": 10}}}, {"n": "7"}, False),  # non-number: no match
    ({"range": {"n": {"gt": 5, "lt": 10}}}, {}, False),
    # notrange — missing/non-number matches everything
    ({"not": {"range": {"n": {"gt": 5, "lt": 10}}}}, {"n": 5}, True),
    ({"not": {"range": {"n": {"gt": 5, "lt": 10}}}}, {"n": 7}, False),
    ({"not": {"range": {"n": {"gte": 5, "lte": 10}}}}, {"n": 5}, False),
    ({"not": {"range": {"n": {"gt": 5, "lt": 10}}}}, {"n": "x"}, True),
    ({"not": {"range": {"n": {"gt": 5, "lt": 10}}}}, {}, True),
    # regexp
    ({"regexp": {"s": "^fo+$"}}, {"s": "foo"}, True),
    ({"regexp": {"s": "^fo+$"}}, {"s": "fob"}, False),
    ({"regexp": {"s": {"value": "^FOO$", "flags": "i"}}}, {"s": "foo"}, True),
    ({"regexp": {"s": "bar"}}, {"s": "xxbarxx"}, True),  # search, not anchored
    ({"regexp": {"s": "bar"}}, {"s": 42}, False),  # strings only
    ({"regexp": {"s": "bar"}}, {}, False),
    ({"not": {"regexp": {"s": "bar"}}}, {}, True),
    ({"not": {"regexp": {"s": "bar"}}}, {"s": "baz"}, True),
    ({"not": {"regexp": {"s": "bar"}}}, {"s": "bar"}, False),
    # ids
    ({"ids": {"values": ["a", "b"]}}, {"_id": "a"}, True),
    ({"ids": {"values": ["a", "b"]}}, {"_id": "c"}, False),
    # in
    ({"in": {"f": ["x", "y"]}}, {"f": "y"}, True),
    ({"in": {"f": ["x", "y"]}}, {"f": "z"}, False),
    # nothing / everything
    ({"nothing": True}, {"a": 1}, False),
    ({}, {"a": 1}, True),
    ({}, {}, True),
    # match — recursive subset, multiset arrays
    ({"match": {"a": 1}}, {"a": 1, "b": 2}, True),
    ({"match": {"a": 1}}, {"a": 2}, False),
    ({"match": {"a": 1}}, {"a": "1"}, False),  # strict typing
    ({"match": {"nested": {"x": 1}}}, {"nested": {"x": 1, "y": 2}}, True),
    ({"match": {"nested": {"x": 1}}}, {"nested": {"y": 2}}, False),
    ({"match": {"tags": ["a"]}}, {"tags": ["b", "a"]}, True),  # order-insensitive
    ({"match": {"tags": ["a", "a"]}}, {"tags": ["a", "b"]}, False),  # duplicates consumed
    ({"match": {"tags": ["a", "a"]}}, {"tags": ["a", "a", "b"]}, True),
    ({"not": {"match": {"a": 1}}}, {"a": 2}, True),
    ({"not": {"match": {"a": 1}}}, {"a": 1}, False),
    # select — positive/negative indexes, sub-query sees {value: elem}
    ({"select": {"field": "arr", "index": 0, "query": {"equals": {"value": "x"}}}},
     {"arr": ["x", "y"]}, True),
    ({"select": {"field": "arr", "index": 1, "query": {"equals": {"value": "x"}}}},
     {"arr": ["x", "y"]}, False),
    ({"select": {"field": "arr", "index": -1, "query": {"equals": {"value": "y"}}}},
     {"arr": ["x", "y"]}, True),
    ({"select": {"field": "arr", "index": 5, "query": {"equals": {"value": "x"}}}},
     {"arr": ["x", "y"]}, False),  # out of bounds
    ({"select": {"field": "arr", "index": 0, "query": {"equals": {"value": "x"}}}},
     {"arr": "notanarray"}, False),
    ({"select": {"field": "arr", "index": 0, "query": {"range": {"value": {"gt": 5}}}}},
     {"arr": [10]}, True),
    # operands
    ({"and": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]}, {"a": 1, "b": 2}, True),
    ({"and": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]}, {"a": 1, "b": 3}, False),
    ({"or": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]}, {"b": 2}, True),
    ({"or": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]}, {"c": 3}, False),
    ({"bool": {"must": [{"equals": {"a": 1}}],
               "must_not": [{"equals": {"b": 2}}],
               "should": [{"equals": {"c": 3}}, {"equals": {"c": 4}}]}},
     {"a": 1, "c": 3}, True),
    ({"bool": {"must": [{"equals": {"a": 1}}],
               "must_not": [{"equals": {"b": 2}}],
               "should": [{"equals": {"c": 3}}, {"equals": {"c": 4}}]}},
     {"a": 1, "b": 2, "c": 3}, False),
    ({"bool": {"should_not": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]}},
     {"a": 1, "b": 3}, True),  # should_not = not(and): at least one must fail
    ({"bool": {"should_not": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]}},
     {"a": 1, "b": 2}, False),
]


@pytest.mark.parametrize("filt,doc,expected", CASES)
def test_keyword_matrix(filt, doc, expected):
    assert matches(filt, doc) is expected, (filt, doc)


def test_subfilter_sharing():
    """Two filters sharing an AND-clause share the subfilter (dedup)."""
    k = Koncorde()
    f1 = k.register({"and": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]})
    f2 = k.register({"or": [
        {"and": [{"equals": {"a": 1}}, {"equals": {"b": 2}}]},
        {"equals": {"c": 3}},
    ]})
    ci = k.compiled()
    assert ci.n_sf == 2  # shared AND-clause + the c==3 clause
    got = set(k.test({"a": 1, "b": 2}))
    assert got == {f1, f2}


def test_batch_matches_single():
    """test_many over a doc batch == per-doc test results."""
    k = Koncorde()
    for f in [
        {"equals": {"t": "x"}},
        {"range": {"n": {"gte": 0, "lt": 50}}},
        {"not": {"exists": "t"}},
        {"regexp": {"s": "^ab"}},
        {"and": [{"equals": {"t": "y"}}, {"range": {"n": {"gt": 10}}}]},
    ]:
        k.register(f)
    docs = [
        {"t": "x", "n": 10, "s": "abc"},
        {"n": 99},
        {"t": "y", "n": 20},
        {},
        {"t": "x", "n": -1, "s": "zab"},
    ]
    batch = k.test_many(docs)
    for d, got in zip(docs, batch):
        assert sorted(got) == sorted(k.test(d))
