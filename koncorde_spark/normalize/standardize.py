"""Filter DSL standardization: validation + rewrites to the reduced keyword set.

Fresh Python implementation of the semantics of the reference standardizer
(/root/reference/lib/transform/standardize.js:40-792):

- every filter node has exactly one keyword;
- ``ids`` / ``in`` are rewritten to leaf-flagged or-of-equals;
- ``missing`` → ``{not: {exists}}``; ``bool`` → and/or/not composition;
- ``not`` is pushed down over and/or (De Morgan), double negation removed;
- same-operand and/or nesting is flattened, single-child operands unwrapped;
- geo keywords are normalized and wrapped under the ``geospatial`` keyword;
- ``exists``/``missing`` field syntax supports ``path.to.array["value"]``.

Leaf-flagged and/or groups (``_isLeaf``) mark boolean groups whose members
are all plain conditions; the canonicalizer treats them as single truth-table
variables (/root/reference/lib/transform/canonical.ts:196-216).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Any

from ..errors import KoncordeParseError
from ..geo.geopoint import convert_distance, convert_geopoint, geo_to_camel_case

BBOX_PROPERTIES = ("top", "left", "bottom", "right")
BOOL_ATTRIBUTES = ("must", "must_not", "should", "should_not")

ALLOWED_KEYWORDS = frozenset(
    [
        "and", "bool", "equals", "exists", "geoBoundingBox", "geoDistance",
        "geoDistanceRange", "geoPolygon", "ids", "in", "match", "missing",
        "not", "nothing", "or", "select", "range", "regexp",
    ]
)

# JS regexp flags we accept; matching itself runs through Python re with a
# documented translation (see engine/matcher).
_JS_FLAGS = set("gimsuy")
_JS_TO_PY_FLAGS = {"i": re.IGNORECASE, "m": re.MULTILINE, "s": re.DOTALL}


class LeafDict(dict):
    """A filter node dict carrying the non-enumerable ``_isLeaf`` marker."""

    is_leaf: bool = True


def make_leaf(d: dict, is_leaf: bool) -> LeafDict:
    out = LeafDict(d)
    out.is_leaf = is_leaf
    return out


def get_is_leaf(d: Any) -> bool | None:
    return getattr(d, "is_leaf", None)


@dataclass(frozen=True)
class NormalizedExists:
    """Parsed exists/missing field: path + optional array-value search.

    ``'foo.bar'`` → path='foo.bar', array=False, value=None;
    ``'foo.bar["baz"]'`` → path='foo.bar', array=True, value='baz'.
    """

    path: str
    array: bool
    value: Any

    def __koncorde_json__(self):
        return {"path": self.path, "array": self.array, "value": self.value}


_ARRAY_FIELD_RE = re.compile(r"^(.*?[^\\])\[(.*)]$", re.DOTALL)
_UNESCAPE_BRACKET_RE = re.compile(r"\\([\[\]])")


def parse_field_syntax(field: str, keyword: str, path: str | None) -> dict:
    m = _ARRAY_FIELD_RE.match(field)
    field_path = field
    value = None
    is_array = m is not None
    if m:
        field_path, raw_value = m.group(1), m.group(2)
        try:
            value = json.loads(raw_value)
        except (ValueError, TypeError):
            raise KoncordeParseError(
                f'contains an invalid array value ("{raw_value}")', keyword, path
            ) from None
    field_path = _UNESCAPE_BRACKET_RE.sub(r"\1", field_path)
    return {keyword: NormalizedExists(field_path, is_array, value)}


def _path_add(current: str | None, leaf: str) -> str:
    return leaf if current is None else f"{current}.{leaf}"


def _is_plain_object(v: Any) -> bool:
    return isinstance(v, dict)


def _is_js_string(v: Any) -> bool:
    return isinstance(v, str)


def _is_js_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _is_scalar(v: Any) -> bool:
    # JS: anything that is not an Object (string/number/boolean/null).
    return v is None or isinstance(v, (str, bool)) or _is_js_number(v)


def _check_object(
    container: dict,
    prop: str,
    keyword: str,
    path: str | None,
    *,
    allowed: tuple[str, ...] | None = None,
    non_empty: bool = False,
    required: tuple[str, ...] | None = None,
    properties: int | None = None,
) -> None:
    v = container.get(prop)
    if not _is_plain_object(v):
        raise KoncordeParseError("must be an object", keyword, path)
    fields = list(v.keys())
    if non_empty and not fields:
        raise KoncordeParseError("must be a non-empty object", keyword, path)
    if properties is not None and len(fields) != properties:
        plural = "ies" if properties > 1 else "y"
        raise KoncordeParseError(
            f"expected object to have exactly {properties} propert{plural}, got {len(fields)}",
            keyword,
            path,
        )
    if required:
        for r in required:
            if r not in v:
                raise KoncordeParseError(f'the property "{r}" is missing', keyword, path)
    if allowed:
        for f in fields:
            if f not in allowed:
                raise KoncordeParseError(
                    f'"{f}" is not an allowed attribute (allowed: {",".join(allowed)})',
                    keyword,
                    path,
                )


def _check_string(container: dict, prop: str, keyword: str, path: str | None) -> None:
    v = container.get(prop)
    if not _is_js_string(v):
        raise KoncordeParseError("must be a string", keyword, path)
    if len(v) == 0:
        raise KoncordeParseError("cannot be empty", keyword, path)


def _check_array(
    container: dict,
    prop: str,
    keyword: str,
    path: str | None,
    *,
    non_empty: bool = False,
    item_type: str | None = None,
) -> None:
    v = container.get(prop)
    if not isinstance(v, list):
        raise KoncordeParseError("must be an array", keyword, path)
    if non_empty and not v:
        raise KoncordeParseError("cannot be empty", keyword, path)
    if item_type == "string" and not all(_is_js_string(i) for i in v):
        raise KoncordeParseError('must hold only values of type "string"', keyword, path)


class Standardizer:
    """Validates filters and rewrites them to the reduced keyword set."""

    def __init__(self, regexp_engine: str = "js"):
        # 're2' = the reference's linear-time contract: real re2 when the
        # wheel is importable, else patterns that could backtrack
        # superlinearly (or that re2 itself rejects) fail registration —
        # never a silent downgrade to backtracking (see resafety.py).
        self.regexp_engine = regexp_engine

    def standardize(self, filters: Any, path: str | None = None) -> dict:
        keywords = list(filters.keys()) if isinstance(filters, dict) else []
        if isinstance(filters, LeafDict) and not keywords:
            return {}
        if filters is not None and not isinstance(filters, dict):
            raise KoncordeParseError("filter must be an object", None, path)
        if len(keywords) == 0:
            return {}
        if len(keywords) > 1:
            raise KoncordeParseError(
                "Invalid filter syntax. Filters must have one keyword only",
                ",".join(keywords),
                path,
            )
        kw = keywords[0]
        if kw not in ALLOWED_KEYWORDS:
            raise KoncordeParseError("unknown keyword", kw, _path_add(path, kw))
        handler = getattr(self, f"_kw_{kw}")
        return handler(filters, _path_add(path, kw))

    # ---- leaf keywords -------------------------------------------------

    def _kw_exists(self, filt: dict, path: str, name: str = "exists") -> dict:
        v = filt[name]
        if isinstance(v, NormalizedExists):  # already parsed — idempotent
            return filt
        if _is_js_string(v):
            if len(v) == 0:
                raise KoncordeParseError("cannot test empty field name", name, path)
            return parse_field_syntax(v, name, path)
        _check_object(filt, name, name, path, properties=1, required=("field",))
        field_path = _path_add(path, "field")
        _check_string(filt[name], "field", name, field_path)
        return parse_field_syntax(filt[name]["field"], name, field_path)

    def _kw_missing(self, filt: dict, path: str) -> dict:
        parsed = self._kw_exists(filt, path, "missing")
        return {"not": {"exists": parsed["missing"]}}

    def _kw_nothing(self, filt: dict, path: str) -> dict:
        return {"nothing": True}

    def _kw_ids(self, filt: dict, path: str) -> dict:
        _check_object(filt, "ids", "ids", path, properties=1, required=("values",))
        _check_array(
            filt["ids"], "values", "ids", _path_add(path, "values"),
            non_empty=True, item_type="string",
        )
        return make_leaf(
            {"or": [{"equals": {"_id": v}} for v in filt["ids"]["values"]]}, True
        )

    def _kw_in(self, filt: dict, path: str) -> dict:
        _check_object(filt, "in", "in", path, properties=1)
        field = next(iter(filt["in"]))
        _check_array(
            filt["in"], field, "in", _path_add(path, field),
            non_empty=True, item_type="string",
        )
        return make_leaf(
            {"or": [{"equals": {field: v}} for v in filt["in"][field]]}, True
        )

    def _kw_equals(self, filt: dict, path: str) -> dict:
        _check_object(filt, "equals", "equals", path, properties=1)
        field = next(iter(filt["equals"]))
        if not _is_scalar(filt["equals"][field]):
            raise KoncordeParseError(
                "must either be a string, a number, a boolean, or null",
                "equals",
                _path_add(path, field),
            )
        return filt

    def _kw_range(self, filt: dict, path: str) -> dict:
        _check_object(filt, "range", "range", path, properties=1)
        field = next(iter(filt["range"]))
        field_path = f"{path}.{field}"
        _check_object(
            filt["range"], field, "range", _path_add(path, field),
            allowed=("gt", "gte", "lt", "lte"), non_empty=True,
        )
        high = float("inf")
        low = float("-inf")
        for key, value in filt["range"][field].items():
            if not _is_js_number(value):
                raise KoncordeParseError("must be a number", "range", _path_add(field_path, key))
            if key in ("lt", "lte"):
                if high != float("inf"):
                    raise KoncordeParseError("only 1 upper boundary allowed", "range", field_path)
                high = value
            if key in ("gt", "gte"):
                if low != float("-inf"):
                    raise KoncordeParseError("only 1 lower boundary allowed", "range", field_path)
                low = value
        if high <= low:
            raise KoncordeParseError(
                "lower boundary must be strictly inferior to the upper one", "range", field_path
            )
        return filt

    def _kw_regexp(self, filt: dict, path: str) -> dict:
        _check_object(filt, "regexp", "regexp", path, properties=1)
        field = next(iter(filt["regexp"]))
        spec = filt["regexp"][field]
        flags = None
        if _is_js_string(spec):
            value = spec
        elif _is_plain_object(spec):
            field_path = _path_add(path, field)
            _check_object(
                filt["regexp"], field, "regexp", field_path,
                allowed=("flags", "value"), non_empty=True, required=("value",),
            )
            value = spec["value"]
            if spec.get("flags"):
                _check_string(spec, "flags", "regexp", _path_add(field_path, "flags"))
                flags = spec["flags"]
        else:
            raise KoncordeParseError(
                "must be either a string or a non-empty object", "regexp", _path_add(path, field)
            )
        try:
            pat = compile_js_regex(value, flags)
            if self.regexp_engine == "re2":
                # honor the re2 contract: reject what real re2 rejects
                # (backrefs/lookarounds) and superlinear-backtracking shapes
                # (reference lib/engine/objects/regexpCondition.js:37)
                from .resafety import check_re2_safe

                check_re2_safe(value, pat.flags)
        except Exception as err:
            raise KoncordeParseError(
                f'cannot parse regexp expression "/{value}/{flags or ""}" ({err})',
                "regexp",
                _path_add(path, field),
            ) from None
        return {"regexp": {field: {"flags": flags, "value": value}}}

    def _kw_select(self, filt: dict, path: str) -> dict:
        _check_object(filt, "select", "select", path, properties=3)
        _check_string(filt["select"], "field", "select", _path_add(path, "field"))
        idx = filt["select"].get("index")
        if not _is_js_number(idx) or idx != idx or idx in (float("inf"), float("-inf")):
            # NaN/±inf pass _is_js_number but int() on them raises raw
            # OverflowError/ValueError — keep the error type contractual
            raise KoncordeParseError("must be an integer", "select", _path_add(path, "index"))
        if int(idx) != idx:
            raise KoncordeParseError(
                "cannot have decimals, must be an integer", "select", _path_add(path, "index")
            )
        _check_object(filt["select"], "query", "select", _path_add(path, "query"), non_empty=True)
        self.standardize(filt["select"]["query"], _path_add(path, "query"))
        return filt

    def _kw_match(self, filt: dict, path: str) -> dict:
        _check_object(filt, "match", "match", path, non_empty=True)
        return filt

    # ---- geo keywords --------------------------------------------------

    def _kw_geoBoundingBox(self, filt: dict, path: str) -> dict:
        _check_object(filt, "geoBoundingBox", "geoBoundingBox", path, properties=1)
        field = next(iter(filt["geoBoundingBox"]))
        raw = filt["geoBoundingBox"][field]
        if not _is_plain_object(raw):
            raise KoncordeParseError("must be an object", "geoBoundingBox", _path_add(path, field))
        bbox = geo_to_camel_case(raw)
        standardized: dict[str, float] = {}
        if all(isinstance(bbox.get(p), (str, int, float)) and not isinstance(bbox.get(p), bool)
               for p in BBOX_PROPERTIES):
            for p in BBOX_PROPERTIES:
                try:
                    n = float(bbox[p])
                except (TypeError, ValueError):
                    n = float("nan")
                if n != n:
                    raise KoncordeParseError(
                        f"unrecognized geoBoundingBox format: {json.dumps(bbox)}",
                        "geoBoundingBox",
                        _path_add(path, field),
                    )
                standardized[p] = n
        elif bbox.get("topLeft") and bbox.get("bottomRight"):
            top_left = convert_geopoint(bbox["topLeft"])
            bottom_right = convert_geopoint(bbox["bottomRight"])
            if top_left is not None and bottom_right is not None:
                standardized = {
                    "bottom": bottom_right[0],
                    "left": top_left[1],
                    "right": bottom_right[1],
                    "top": top_left[0],
                }
        if any(standardized.get(p) is None for p in BBOX_PROPERTIES):
            raise KoncordeParseError(
                "unrecognized geo-point format", "geoBoundingBox", _path_add(path, field)
            )
        return {"geospatial": {"geoBoundingBox": {field: standardized}}}

    def _kw_geoDistance(self, filt: dict, path: str) -> dict:
        _check_object(filt, "geoDistance", "geoDistance", path, properties=2, required=("distance",))
        _check_string(filt["geoDistance"], "distance", "geoDistance", _path_add(path, "distance"))
        field = next(f for f in filt["geoDistance"] if f != "distance")
        point = convert_geopoint(filt["geoDistance"][field])
        if point is None:
            raise KoncordeParseError(
                "unrecognized point format", "geoDistance", _path_add(path, field)
            )
        return {
            "geospatial": {
                "geoDistance": {
                    field: {
                        "distance": convert_distance(filt["geoDistance"]["distance"]),
                        "lat": point[0],
                        "lon": point[1],
                    }
                }
            }
        }

    def _kw_geoDistanceRange(self, filt: dict, path: str) -> dict:
        _check_object(
            filt, "geoDistanceRange", "geoDistanceRange", path,
            properties=3, required=("from", "to"),
        )
        field = next(f for f in filt["geoDistanceRange"] if f not in ("from", "to"))
        bounds = []
        for f in ("from", "to"):
            _check_string(filt["geoDistanceRange"], f, "geoDistanceRange", _path_add(path, f))
            bounds.append(convert_distance(filt["geoDistanceRange"][f]))
        dist_from, dist_to = bounds
        if dist_from >= dist_to:
            raise KoncordeParseError(
                "inner radius must be smaller than outer radius", "geoDistanceRange", path
            )
        point = convert_geopoint(filt["geoDistanceRange"][field])
        if point is None:
            raise KoncordeParseError(
                "unrecognized point format", "geoDistanceRange", _path_add(path, field)
            )
        return {
            "geospatial": {
                "geoDistanceRange": {
                    field: {"from": dist_from, "lat": point[0], "lon": point[1], "to": dist_to}
                }
            }
        }

    def _kw_geoPolygon(self, filt: dict, path: str) -> dict:
        _check_object(filt, "geoPolygon", "geoPolygon", path, properties=1)
        field = next(iter(filt["geoPolygon"]))
        field_path = _path_add(path, field)
        _check_object(
            filt["geoPolygon"], field, "geoPolygon", field_path,
            properties=1, required=("points",),
        )
        points_path = _path_add(field_path, "points")
        _check_array(filt["geoPolygon"][field], "points", "geoPolygon", points_path)
        raw_points = filt["geoPolygon"][field]["points"]
        if len(raw_points) < 3:
            raise KoncordeParseError(
                "at least 3 points are required to build a polygon", "geoPolygon", points_path
            )
        points = []
        for rp in raw_points:
            pt = convert_geopoint(rp)
            if pt is None:
                raise KoncordeParseError(
                    f'unrecognized point format "{json.dumps(rp)}"', "geoPolygon", points_path
                )
            points.append([pt[0], pt[1]])
        return {"geospatial": {"geoPolygon": {field: points}}}

    # ---- logical operands ----------------------------------------------

    def _kw_and(self, filt: dict, path: str) -> dict:
        _check_array(filt, "and", "and", path, non_empty=True)
        return self._standardize_filter_array(filt, "and", path)

    def _kw_or(self, filt: dict, path: str) -> dict:
        _check_array(filt, "or", "or", path, non_empty=True)
        return self._standardize_filter_array(filt, "or", path)

    def _kw_not(self, filt: dict, path: str) -> dict:
        _check_object(filt, "not", "not", path, properties=1)
        result = self.standardize(filt["not"], path)
        k = next(iter(result), None)
        if k in ("and", "or"):
            # De Morgan push-down: not(and[x,y]) → or[not x, not y] etc.
            is_leaf = True
            subs = []
            for f in result[k]:
                sub = self.standardize({"not": f})
                if "or" in sub or "and" in sub:
                    is_leaf = False
                subs.append(sub)
            return make_leaf({"or" if k == "and" else "and": subs}, is_leaf)
        if "not" in result:
            return result["not"]  # double negation
        return {"not": result}

    def _kw_bool(self, filt: dict, path: str) -> dict:
        _check_object(filt, "bool", "bool", path, allowed=BOOL_ATTRIBUTES, non_empty=True)
        clauses: list = []
        b = filt["bool"]
        if b.get("must"):
            clauses.extend(b["must"])
        if b.get("must_not"):
            clauses.append({"not": {"or": b["must_not"]}})
        if b.get("should"):
            clauses.append({"or": b["should"]})
        if b.get("should_not"):
            clauses.append({"not": {"and": b["should_not"]}})
        return self.standardize({"and": clauses}, path)

    def _standardize_filter_array(self, filt: dict, operand: str, path: str) -> dict:
        items = filt[operand]
        for v in items:
            if not _is_plain_object(v) or len(v) == 0:
                raise KoncordeParseError("can only contain non-empty objects", operand, path)

        result_is_leaf = True
        leaves: list = []
        and_ors: list = []
        for f in items:
            sub = self.standardize(f, path)
            if operand in sub:
                # same-operand flattening (and-in-and / or-in-or)
                leaves.extend(sub[operand])
                if get_is_leaf(sub) is False:
                    result_is_leaf = False
            elif "and" in sub or "or" in sub:
                result_is_leaf = False
                and_ors.append(sub)
            else:
                leaves.append(sub)

        if not result_is_leaf and len(leaves) > 1:
            # group plain leaves under one nested same-operand node so the
            # canonicalizer can treat them as a single truth-table variable
            sub = self.standardize({operand: leaves}, path)
            return make_leaf({operand: and_ors + [sub]}, False)

        merged = and_ors + leaves
        if len(merged) == 1:
            return merged[0]
        return make_leaf({operand: merged}, result_is_leaf)


def compile_js_regex(pattern: str, flags: str | None) -> re.Pattern:
    """Compile a JS-flavored regex with Python `re`, translating flags.

    ``g``/``y`` affect only iteration in JS, not match semantics — ignored.
    ``u`` is the default in Python 3. Unknown flags raise.
    """
    py_flags = 0
    for f in flags or "":
        if f not in _JS_FLAGS:
            raise ValueError(f"invalid regular expression flag '{f}'")
        py_flags |= _JS_TO_PY_FLAGS.get(f, 0)
    return re.compile(pattern, py_flags)
