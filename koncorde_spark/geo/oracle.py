"""DuckDB SQL twins for the geospatial keywords.

Generates the exact same arithmetic the numpy matcher runs
(geo/shapes.py): haversine with the frozen EARTH_RADIUS_M constant and
clip-to-[0,1], even-odd ray casting with the inclusive on-edge test.
Polygon membership is pure IEEE arithmetic (identical bit-for-bit across
engines); haversine uses sin/cos/asin whose ulp-level differences only
matter for points within ~1e-9 m of a threshold — not reachable with the
test data generators.

Reference semantics: lib/engine/matcher/matchGeospatial.js (positive) and
the notgeospatial missing-point ⇒ match rule.
"""

from __future__ import annotations

from .shapes import EARTH_RADIUS_M


def haversine_sql(lat_col: str, lon_col: str, clat: float, clon: float) -> str:
    """Distance in meters — term-for-term the numpy haversine_m formula."""
    return (
        f"(2 * {EARTH_RADIUS_M!r} * asin(sqrt(least(greatest("
        f"pow(sin((radians({clat!r}) - radians({lat_col})) / 2), 2)"
        f" + cos(radians({lat_col})) * cos(radians({clat!r}))"
        f" * pow(sin((radians({clon!r}) - radians({lon_col})) / 2), 2)"
        f", 0.0), 1.0))))"
    )


def point_in_polygon_sql(
    lat_col: str, lon_col: str, lats: list[float], lons: list[float]
) -> str:
    """Even-odd crossing count + inclusive on-edge test (shapes.py Polygon)."""
    n = len(lats)
    crossings = []
    edges = []
    for i in range(n):
        y1, x1 = lats[i], lons[i]
        y2, x2 = lats[(i + 1) % n], lons[(i + 1) % n]
        cond = f"(({y1!r} > {lat_col}) <> ({y2!r} > {lat_col}))"
        xin = f"(({x2!r} - {x1!r}) * ({lat_col} - {y1!r}) / ({y2!r} - {y1!r}) + {x1!r})"
        crossings.append(
            f"CASE WHEN {cond} THEN (CASE WHEN {lon_col} < {xin} THEN 1 ELSE 0 END) ELSE 0 END"
        )
        cross = f"(({x2!r} - {x1!r}) * ({lat_col} - {y1!r}) - ({y2!r} - {y1!r}) * ({lon_col} - {x1!r}))"
        within = (
            f"({min(x1, x2)!r} - 1e-12 <= {lon_col} AND {lon_col} <= {max(x1, x2)!r} + 1e-12"
            f" AND {min(y1, y2)!r} - 1e-12 <= {lat_col} AND {lat_col} <= {max(y1, y2)!r} + 1e-12)"
        )
        edges.append(f"(abs({cross}) < 1e-12 AND {within})")
    inside = "((" + " + ".join(crossings) + ") % 2 = 1)"
    on_edge = "(" + " OR ".join(edges) + ")"
    return f"({inside} OR {on_edge})"


def geo_condition_sql(cond: dict, lat_col: str = "lat", lon_col: str = "lon") -> str:
    """SQL for one canonical geospatial condition dict.

    Shapes: {"geospatial": {"geoDistance"|"geoDistanceRange"|"geoPolygon"|
    "geoBoundingBox": {field: spec}}, "not": bool}. Negation follows the
    notgeospatial rule: missing/invalid point ⇒ match (NULL-safe NOT).
    """
    negated = bool(cond.get("not"))
    spec = cond["geospatial"]
    kind = next(iter(spec))
    body = next(iter(spec[kind].values()))
    if kind == "geoDistance":
        d = haversine_sql(lat_col, lon_col, body["lat"], body["lon"])
        inside = f"({d} <= {float(body['distance'])!r})"
    elif kind == "geoDistanceRange":
        d = haversine_sql(lat_col, lon_col, body["lat"], body["lon"])
        inside = (
            f"({d} >= {float(body['from'])!r} AND {d} <= {float(body['to'])!r})"
        )
    elif kind == "geoPolygon":
        pts = body if isinstance(body, (list, tuple)) else body["points"]
        lats = [float(p[0]) for p in pts]
        lons = [float(p[1]) for p in pts]
        inside = point_in_polygon_sql(lat_col, lon_col, lats, lons)
    elif kind == "geoBoundingBox":
        inside = (
            f"({lat_col} <= {body['top']!r} AND {lat_col} >= {body['bottom']!r}"
            f" AND {lon_col} >= {body['left']!r} AND {lon_col} <= {body['right']!r})"
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown geo kind {kind!r}")
    if negated:
        return (
            f"({lat_col} IS NULL OR {lon_col} IS NULL OR NOT coalesce({inside}, FALSE))"
        )
    return f"({lat_col} IS NOT NULL AND {lon_col} IS NOT NULL AND {inside})"


def geo_percolation_oracle_sql(
    filters: dict[str, list[list[dict]]],
    table: str,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    result_col: str = "filter_id",
) -> str:
    selects = []
    for fid in sorted(filters):
        ors = []
        for clause in filters[fid]:
            ands = [geo_condition_sql(c, lat_col, lon_col) for c in clause]
            ors.append("(" + " AND ".join(ands) + ")")
        selects.append(
            f"SELECT {id_col}, '{fid}' AS {result_col} FROM {table}"
            f" WHERE {' OR '.join(ors)}"
        )
    return "\nUNION ALL\n".join(selects)
