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


def condition_to_sql(cond: dict) -> str:
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
        col = _q(field)
        v = spec[field]
        if not negated:
            return f"{col} IS NULL" if v is None else f"{col} = {_lit(v)}"
        # notequals: missing field ⇒ match
        if v is None:
            return f"{col} IS NOT NULL"
        return f"({col} IS NULL OR {col} <> {_lit(v)})"

    if keyword == "exists":
        ne: NormalizedExists = spec
        if ne.array:
            raise NotSqlExpressible("array-value exists")
        col = _q(ne.path)
        return f"{col} IS NULL" if negated else f"{col} IS NOT NULL"

    if keyword == "range":
        field = next(iter(spec))
        col = _q(field)
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
        col = _q(field)
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

    raise NotSqlExpressible(f"keyword {keyword!r}")


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
