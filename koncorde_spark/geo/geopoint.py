"""Geopoint + distance normalization.

Reproduces the 9 accepted geopoint formats of the reference
(/root/reference/lib/util/convertGeopoint.js:36-127) and the unit-suffixed
distance strings (/root/reference/lib/util/convertDistance.js:29-46):

- ``[lat, lon]`` array
- ``"lat, lon"`` string
- ``"geohash"`` string (>= 4 base32 chars)
- ``{lat, lon}``
- ``{latLon: [lat, lon]}`` / ``{latLon: {lat, lon}}`` / ``{latLon: "lat, lon"}``
  (also geohash strings)
- snake_case ``lat_lon`` variants of the above
"""

from __future__ import annotations

import re
from typing import Any

from .geohash import decode as geohash_decode

# The reference accepts any [0-9a-z]{4,} string and lets ngeohash produce
# garbage coordinates for non-base32 chars (a/i/l/o); the observable match
# behavior is "invalid point". We reject those strings outright — same
# observable behavior, no NaN propagation.
_GEOHASH_RE = re.compile(r"^[0-9bcdefghjkmnpqrstuvwxyz]{4,}$")
_SNAKE_KEYS = {"lat_lon": "latLon", "top_left": "topLeft", "bottom_right": "bottomRight"}


def geo_to_camel_case(obj: dict) -> dict:
    """snake_case → camelCase for the known geolocation keys."""
    return {_SNAKE_KEYS.get(k, k): v for k, v in obj.items()}


def _parse_float(v: Any) -> float | None:
    """JS Number.parseFloat semantics: leading-numeric-prefix parse."""
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        m = re.match(r"\s*[-+]?(\d+\.?\d*([eE][-+]?\d+)?|\.\d+([eE][-+]?\d+)?)", v)
        if m:
            try:
                return float(m.group(0))
            except ValueError:
                return None
    return None


def _to_coordinate(lat: Any, lon: Any) -> tuple[float, float] | None:
    lat_n = _parse_float(lat)
    lon_n = _parse_float(lon)
    if lat_n is None or lon_n is None:
        return None
    return (lat_n, lon_n)


def _from_string(s: str) -> tuple[float, float] | None:
    parts = s.split(",")
    if len(parts) == 2:
        return _to_coordinate(parts[0], parts[1])
    if _GEOHASH_RE.match(s):
        return geohash_decode(s)
    return None


def convert_geopoint(point: Any) -> tuple[float, float] | None:
    """Normalize any accepted geopoint format to (lat, lon); None if invalid."""
    if point is None or point is True or point is False:
        return None
    if isinstance(point, str):
        return _from_string(point)
    if isinstance(point, (list, tuple)):
        if len(point) == 2:
            return _to_coordinate(point[0], point[1])
        return None
    if not isinstance(point, dict):
        return None

    cc = geo_to_camel_case(point)
    if "lat" in cc and "lon" in cc:
        return _to_coordinate(cc["lat"], cc["lon"])
    if "latLon" in cc:
        ll = cc["latLon"]
        if isinstance(ll, (list, tuple)):
            if len(ll) == 2:
                return _to_coordinate(ll[0], ll[1])
            return None
        if isinstance(ll, dict) and "lat" in ll and "lon" in ll:
            return _to_coordinate(ll["lat"], ll["lon"])
        if isinstance(ll, str):
            return _from_string(ll)
    return None


# Unit table: factors to meters. Mirrors the units the reference accepts via
# node-units for distance strings (metric + imperial length units).
_UNIT_TO_M = {
    "m": 1.0,
    "meter": 1.0,
    "meters": 1.0,
    "metre": 1.0,
    "metres": 1.0,
    "mm": 0.001,
    "millimeter": 0.001,
    "millimeters": 0.001,
    "cm": 0.01,
    "centimeter": 0.01,
    "centimeters": 0.01,
    "dm": 0.1,
    "km": 1000.0,
    "kilometer": 1000.0,
    "kilometers": 1000.0,
    "kilometre": 1000.0,
    "kilometres": 1000.0,
    "in": 0.0254,
    "inch": 0.0254,
    "inches": 0.0254,
    "ft": 0.3048,
    "foot": 0.3048,
    "feet": 0.3048,
    "yd": 0.9144,
    "yard": 0.9144,
    "yards": 0.9144,
    "mi": 1609.344,
    "mile": 1609.344,
    "miles": 1609.344,
}

_DIST_RE = re.compile(r"^([0-9.]+)\s*([a-z]*)$")


def convert_distance(distance: str) -> float:
    """Convert a distance string like ``"500m"``, ``"3 258,55 Ft"`` to meters.

    Cleanup mirrors the reference: strip dashes/spaces, ``,`` → ``.``,
    lowercase, then split the numeric prefix from the unit suffix.
    A bare number is meters.
    """
    if not isinstance(distance, str):
        raise KoncordeDistanceError(distance)
    cleaned = re.sub(r"[-\s]", "", distance).replace(",", ".").lower()
    m = _DIST_RE.match(cleaned)
    if not m:
        raise KoncordeDistanceError(distance)
    value_s, unit = m.groups()
    try:
        value = float(value_s)
    except ValueError:
        raise KoncordeDistanceError(distance) from None
    if unit == "":
        return value
    factor = _UNIT_TO_M.get(unit)
    if factor is None:
        raise KoncordeDistanceError(distance)
    return value * factor


class KoncordeDistanceError(ValueError):
    def __init__(self, distance):
        super().__init__(f'unable to parse distance value "{distance}"')
