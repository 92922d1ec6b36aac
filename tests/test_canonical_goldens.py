"""Golden cases ported verbatim from the reference canonicalizer suite
(/root/reference/test/transform/canonical.test.js:12-267): every
_removeImpossiblePredicates fixture and its exact expected DNF.

The repo's condition format matches the reference's canonical format
(dicts with a `not` flag); `exists` specs use the NormalizedExists
dataclass where the reference uses {path, array, value} objects.
"""

import pytest

from koncorde_spark.normalize.canonical import Canonical
from koncorde_spark.normalize.standardize import NormalizedExists


def rip(dnf):
    return Canonical._remove_impossible_predicates(dnf)


KEEP = [{"equals": {"foo": "bar"}, "not": False}]


def ex(path, array=False, value=None):
    return NormalizedExists(path=path, array=array, value=value)


# (name, impossible-clause, reference file:line)
IMPOSSIBLE_CLAUSES = [
    (
        "foo === A && foo === B",  # canonical.test.js:13
        [
            {"equals": {"foo": "bar"}, "not": False},
            {"equals": {"foo": "baz"}, "not": False},
            {"exists": ex("anotherfield"), "not": False},
        ],
    ),
    (
        "foo === A && foo does not exist",  # canonical.test.js:29
        [
            {"equals": {"foo": "bar"}, "not": False},
            {"exists": ex("foo", True, "bar"), "not": True},
            {"exists": ex("anotherField"), "not": False},
        ],
    ),
    (
        "foo does not exist && foo === A",  # canonical.test.js:45
        [
            {"exists": ex("foo"), "not": True},
            {"equals": {"foo": "bar"}, "not": False},
            {"exists": ex("anotherField"), "not": False},
        ],
    ),
    (
        "foo exists && foo does not exist",  # canonical.test.js:61
        [
            {"exists": ex("foo", True, 42), "not": False},
            {"exists": ex("foo"), "not": True},
            {"exists": ex("anotherField"), "not": False},
        ],
    ),
    (
        "foo does not exist && foo exists",  # canonical.test.js:77
        [
            {"exists": ex("foo", True, 42), "not": True},
            {"exists": ex("foo"), "not": False},
            {"exists": ex("anotherField"), "not": False},
        ],
    ),
    (
        "foo === A && foo !== A",  # canonical.test.js:93
        [
            {"equals": {"foo": "bar"}, "not": True},
            {"equals": {"foo": "bar"}, "not": False},
            {"exists": ex("foo"), "not": False},
        ],
    ),
    (
        "foo !== A && foo === A",  # canonical.test.js:109
        [
            {"equals": {"foo": "bar"}, "not": False},
            {"equals": {"foo": "bar"}, "not": True},
            {"exists": ex("foo"), "not": False},
        ],
    ),
    (
        "foo === 9 && foo < 5",  # canonical.test.js:125
        [
            {"range": {"foo": {"lt": 5}}, "not": False},
            {"equals": {"foo": 9}, "not": False},
            {"exists": ex("anotherfield"), "not": False},
        ],
    ),
    (
        "foo < 5 && foo === 9",  # canonical.test.js:141
        [
            {"equals": {"foo": 9}, "not": False},
            {"range": {"foo": {"lt": 5}}, "not": False},
            {"exists": ex("anotherfield"), "not": False},
        ],
    ),
    (
        "foo === 9 && foo <= 5",  # canonical.test.js:157
        [
            {"range": {"foo": {"lte": 5}}, "not": False},
            {"equals": {"foo": 9}, "not": False},
            {"exists": ex("anotherfield"), "not": False},
        ],
    ),
    (
        "foo <= 5 && foo === 9",  # canonical.test.js:173
        [
            {"equals": {"foo": 9}, "not": False},
            {"range": {"foo": {"lte": 5}}, "not": False},
            {"exists": ex("anotherfield"), "not": False},
        ],
    ),
    (
        "foo == 9 && foo > 10",  # canonical.test.js:189
        [
            {"range": {"foo": {"gt": 10}}, "not": False},
            {"equals": {"foo": 9}, "not": False},
            {"exists": ex("anotherfield"), "not": False},
        ],
    ),
    (
        "foo > 10 && foo == 9",  # canonical.test.js:205
        [
            {"equals": {"foo": 9}, "not": False},
            {"range": {"foo": {"gt": 10}}, "not": False},
            {"exists": ex("anotherfield"), "not": False},
        ],
    ),
    (
        "foo == 9 && foo >= 10",  # canonical.test.js:221
        [
            {"range": {"foo": {"gte": 10}}, "not": False},
            {"equals": {"foo": 9}, "not": False},
            {"exists": ex("anotherfield"), "not": False},
        ],
    ),
    (
        "foo >= 10 && foo == 9",  # canonical.test.js:237
        [
            {"equals": {"foo": 9}, "not": False},
            {"range": {"foo": {"gte": 10}}, "not": False},
            {"exists": ex("anotherfield"), "not": False},
        ],
    ),
]


@pytest.mark.parametrize(
    "name,clause", IMPOSSIBLE_CLAUSES, ids=[n for n, _ in IMPOSSIBLE_CLAUSES]
)
def test_impossible_clause_is_pruned(name, clause):
    assert rip([list(KEEP), clause]) == [KEEP]


def test_all_anti_tautologies_collapse_to_nothing():
    # canonical.test.js:253-267
    out = rip(
        [
            [
                {"equals": {"foo": 1}, "not": False},
                {"equals": {"foo": 2}, "not": False},
            ],
            [
                {"exists": ex("bar"), "not": False},
                {"exists": ex("bar", True, "qux"), "not": True},
            ],
        ]
    )
    assert out == [[{"nothing": True}]]


def test_possible_clauses_survive_unchanged():
    dnf = [
        [
            {"equals": {"foo": 5}, "not": False},
            {"range": {"foo": {"lt": 10, "gt": 0}}, "not": False},
        ],
        [
            {"equals": {"foo": "bar"}, "not": False},
            {"equals": {"baz": "qux"}, "not": False},
        ],
    ]
    assert rip([list(c) for c in dnf]) == dnf
