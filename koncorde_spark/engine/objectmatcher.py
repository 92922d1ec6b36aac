"""Recursive subset matching for the `match` keyword.

Semantics of /root/reference/lib/util/ObjectMatcher.ts:9-92: every key of the
pattern must be contained in the document; arrays use order-insensitive
multiset containment (each pattern element consumes one document element).
Strict JS typing: 1 does not match '1', true does not match 1.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _norm(v: Any) -> Any:
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    return v


def match_any(obj: Any, to_match: Any) -> bool:
    obj = _norm(obj)
    to_match = _norm(to_match)
    obj_is_bool = isinstance(obj, bool)
    pat_is_bool = isinstance(to_match, bool)
    if obj_is_bool != pat_is_bool:
        return False
    if obj_is_bool:
        return obj == to_match
    if isinstance(obj, (int, float)) and isinstance(to_match, (int, float)):
        return float(obj) == float(to_match)
    if type(obj) is not type(to_match) and not (
        isinstance(obj, (list, dict)) and isinstance(to_match, (list, dict))
    ):
        # differing JS typeof → no match (None == None handled below)
        if obj is None and to_match is None:
            return True
        return False
    if isinstance(obj, list) and isinstance(to_match, list):
        return match_array(obj, to_match)
    if isinstance(obj, dict) and isinstance(to_match, dict):
        return match_object(obj, to_match)
    if isinstance(obj, (list, dict)) or isinstance(to_match, (list, dict)):
        return False  # array vs object mismatch
    return obj == to_match


def match_array(array: list, match: list) -> bool:
    if len(array) < len(match):
        return False
    pool = list(array)
    for want in match:
        for j, got in enumerate(pool):
            if match_any(got, want):
                pool.pop(j)  # consume: duplicates in the pattern need duplicates in the doc
                break
        else:
            return False
    return True


def match_object(obj: dict, match: dict) -> bool:
    for key, want in match.items():
        if key not in obj:
            # JS obj[key] === undefined; matchAny(undefined, x) is false
            # unless x is also undefined — undefined can't appear in JSON.
            return False
        if not match_any(obj[key], want):
            return False
    return True


def match_document(doc: dict, pattern: dict) -> bool:
    """Top-level match against a document.

    The reference matcher runs against the FLATTENED document (dot-path
    keys with intermediate nodes), so a pattern key like 'foo.bar.baz'
    resolves through nesting at the root level (match.test.js:124-130).
    Nested pattern objects compare against raw nested values (plain-key
    lookup, matchObject semantics).
    """
    for key, want in pattern.items():
        if key in doc:
            value = doc[key]
        elif "." in key:
            value = doc
            for part in key.split("."):
                if isinstance(value, dict) and part in value:
                    value = value[part]
                else:
                    return False
        else:
            return False
        if not match_any(value, want):
            return False
    return True
