"""DNF → ANSI SQL compiler for percolation oracles.

Turns a registered filter set into the equivalent SQL (DuckDB dialect) so
an independent engine can verify percolation match sets. SQL semantics
mirror the matcher exactly, including the missing-field behavior of the
negative keywords (missing ⇒ notequals/notexists/notregexp/notrange match).

Only SQL-expressible keywords are supported (equals/exists/range/regexp and
their negations, nothing/everything); geo/match/select filters raise — the
driver records those as rows-only checks instead.
"""

from __future__ import annotations

from typing import Any

from ..normalize.standardize import NormalizedExists


class NotSqlExpressible(Exception):
    pass


def _lit(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise NotSqlExpressible(f"non-scalar literal {v!r}")


def _q(col: str) -> str:
    if not col.replace("_", "").isalnum():
        raise NotSqlExpressible(f"unsupported column name {col!r}")
    return col


def condition_to_sql(cond: dict, resolve=_q) -> str:
    keyword = next(k for k in cond if k != "not")
    negated = bool(cond.get("not"))
    spec = cond[keyword]

    if keyword == "everything":
        return "FALSE" if negated else "TRUE"
    if keyword == "nothing":
        # stored `nothing` never matches in the reference matcher,
        # negated or not (no matcher entry exists for it)
        return "FALSE"

    if keyword == "equals":
        field = next(iter(spec))
        col = resolve(field)
        v = spec[field]
        if not negated:
            return f"{col} IS NULL" if v is None else f"{col} = {_lit(v)}"
        # notequals: missing field ⇒ match
        if v is None:
            return f"{col} IS NOT NULL"
        return f"({col} IS NULL OR {col} <> {_lit(v)})"

    if keyword == "exists":
        ne: NormalizedExists = spec
        col = resolve(ne.path)
        if ne.array:
            # array-value form `field[value]`: strict containment in a typed
            # list column (test/keywords/exists.test.js array fixtures)
            hit = f"coalesce(list_contains({col}, {_lit(ne.value)}), FALSE)"
            if negated:
                return f"({col} IS NULL OR NOT {hit})"
            return f"({col} IS NOT NULL AND {hit})"
        return f"{col} IS NULL" if negated else f"{col} IS NOT NULL"

    if keyword == "range":
        field = next(iter(spec))
        col = resolve(field)
        parts = []
        b = spec[field]
        if "gt" in b:
            parts.append(f"{col} > {_lit(b['gt'])}")
        if "gte" in b:
            parts.append(f"{col} >= {_lit(b['gte'])}")
        if "lt" in b:
            parts.append(f"{col} < {_lit(b['lt'])}")
        if "lte" in b:
            parts.append(f"{col} <= {_lit(b['lte'])}")
        inside = " AND ".join(parts)
        if not negated:
            return f"({inside})"
        # notrange: missing/non-number ⇒ match; else complement
        return f"({col} IS NULL OR NOT ({inside}))"

    if keyword == "regexp":
        field = next(iter(spec))
        col = resolve(field)
        pat = spec[field]["value"]
        flags = spec[field].get("flags") or ""
        if "i" in flags:
            pat = "(?i)" + pat
        if set(flags) - {"i", "g", "u"}:
            raise NotSqlExpressible(f"regexp flags {flags!r}")
        m = f"regexp_matches({col}, {_lit(pat)})"
        if not negated:
            return f"({col} IS NOT NULL AND {m})"
        return f"({col} IS NULL OR NOT {m})"

    if keyword == "match":
        # subset semantics (ObjectMatcher.ts): every pattern key must match;
        # scalar → strict equality, array → multiset containment (only
        # duplicate-free patterns are SQL-expressible via list_contains)
        parts = []
        for field, pat in spec.items():
            col = resolve(field)
            if isinstance(pat, dict):
                raise NotSqlExpressible("nested-object match pattern")
            if isinstance(pat, (list, tuple)):
                keys = [repr(type(v)) + repr(v) for v in pat]
                if len(set(keys)) != len(keys):
                    raise NotSqlExpressible("multiset match with duplicates")
                elems = [
                    f"coalesce(list_contains({col}, {_lit(v)}), FALSE)" for v in pat
                ]
                parts.append(f"({col} IS NOT NULL AND {' AND '.join(elems)})")
            elif pat is None:
                parts.append(f"{col} IS NULL")
            else:
                parts.append(f"{col} = {_lit(pat)}")
        m = "(" + " AND ".join(parts) + ")"
        if not negated:
            return m
        # notmatch: missing field / failed match ⇒ match (NULL-safe)
        return f"(NOT coalesce({m}, FALSE))"

    if keyword == "select":
        # element select: field[index] probed by a child query over `value`
        field, idx = spec["field"], int(spec["index"])
        if negated:
            raise NotSqlExpressible("negated select")
        base = resolve(field)
        duck_idx = idx + 1 if idx >= 0 else idx  # DuckDB lists are 1-based
        elem = f"{base}[{duck_idx}]"
        # The matcher only probes elements of an actual in-range list —
        # DuckDB returns NULL for NULL lists and out-of-bounds indexes,
        # which would make a null-valued child (elem IS NULL) match rows
        # the engine skips. Guard list presence + index range explicitly.
        in_range = idx + 1 if idx >= 0 else -idx
        guard = f"{base} IS NOT NULL AND len({base}) >= {in_range}"
        return f"({guard} AND {_select_child_sql(spec['query'], elem)})"

    raise NotSqlExpressible(f"keyword {keyword!r}")


def _select_child_sql(query: dict, elem: str) -> str:
    """SQL for a select's raw child query applied to the element expr.

    Only the simple non-negated forms over the synthetic `value` field are
    expressible; nested selects / negations fall back to rows-only checks.
    """
    if not isinstance(query, dict) or len(query) != 1:
        raise NotSqlExpressible("complex select child")
    kw = next(iter(query))
    spec = query[kw]
    if kw in ("not",):
        raise NotSqlExpressible("negated select child")
    if not isinstance(spec, dict) or set(spec) != {"value"}:
        raise NotSqlExpressible("select child must probe `value`")
    v = spec["value"]
    if kw == "regexp" and isinstance(v, str):
        v = {"value": v, "flags": None}
    cond = {kw: {"value": v}, "not": False}
    return condition_to_sql(cond, resolve=lambda f: elem)


def dnf_to_sql(dnf: list[list[dict]]) -> str:
    """WHERE-clause for one filter's canonical DNF."""
    clauses = []
    for ands in dnf:
        parts = [condition_to_sql(c) for c in ands]
        clauses.append("(" + " AND ".join(parts) + ")")
    return " OR ".join(clauses)


def percolation_oracle_sql(
    filters: dict[str, list[list[dict]]], table: str, id_col: str, result_col: str = "filter_id"
) -> str:
    """UNION ALL oracle: one SELECT per filter, (id, filter_id) pairs."""
    selects = []
    for fid in sorted(filters):
        where = dnf_to_sql(filters[fid])
        selects.append(
            f"SELECT {id_col}, '{fid}' AS {result_col} FROM {table} WHERE {where}"
        )
    return "\nUNION ALL\n".join(selects)
