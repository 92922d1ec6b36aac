"""Geo shapes: registration-time geohash covering cells + exact vectorized tests.

Replaces the reference's Boost R-tree (/root/reference/lib/engine/
storeOperands.ts:385-451) with the Spark-friendly design mandated by the
north-star: each registered shape precomputes the set of geohash cells that
cover it (at a precision derived from the shape's extent); at match time the
document's cell is computed vectorized (numpy) and probed against a
cell → shape hash map, and only candidate (row, shape) pairs get the exact
point-in-shape check (bbox bounds / haversine / winding-number), all numpy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .geohash import cell_bounds_int, encode_int_scalar

EARTH_RADIUS_M = 6371008.8  # mean Earth radius (IUGG)

# Geohash cell height in degrees latitude per precision (5 bits/char,
# lat gets floor(5p/2) bits): 180 / 2^(floor(5p/2)).
_MAX_COVER_CELLS = 1024


def haversine_m(lat1: np.ndarray, lon1: np.ndarray, lat2: float, lon2: float) -> np.ndarray:
    """Vectorized haversine distance in meters from points to a fixed center."""
    la1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lo1 = np.radians(np.asarray(lon1, dtype=np.float64))
    la2 = math.radians(lat2)
    lo2 = math.radians(lon2)
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = np.sin(dlat / 2) ** 2 + np.cos(la1) * math.cos(la2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def _precision_for_extent(lat_extent_deg: float, lon_extent_deg: float) -> int:
    """Pick the geohash precision whose cells are not much smaller than the
    shape, so the covering stays under _MAX_COVER_CELLS."""
    for p in range(8, 0, -1):
        lat_bits = (5 * p) // 2
        lon_bits = (5 * p + 1) // 2
        cell_lat = 180.0 / (1 << lat_bits)
        cell_lon = 360.0 / (1 << lon_bits)
        n_lat = int(lat_extent_deg / cell_lat) + 2
        n_lon = int(lon_extent_deg / cell_lon) + 2
        if n_lat * n_lon <= _MAX_COVER_CELLS:
            return p
    return 1


def _cover_bbox(lat_lo, lat_hi, lon_lo, lon_hi) -> tuple[int, frozenset[int]]:
    """Covering cell set (integer geohash) for a lat/lon box."""
    precision = _precision_for_extent(max(lat_hi - lat_lo, 1e-9), max(lon_hi - lon_lo, 1e-9))
    lat_bits = (5 * precision) // 2
    lon_bits = (5 * precision + 1) // 2
    cell_lat = 180.0 / (1 << lat_bits)
    cell_lon = 360.0 / (1 << lon_bits)
    cells = set()
    lat = max(lat_lo, -90.0)
    while lat <= min(lat_hi, 90.0) + cell_lat:
        lon = max(lon_lo, -180.0)
        while lon <= min(lon_hi, 180.0) + cell_lon:
            cells.add(encode_int_scalar(min(lat, 89.9999999), min(lon, 179.9999999), precision))
            lon += cell_lon
        lat += cell_lat
        if len(cells) > 4 * _MAX_COVER_CELLS:
            break
    return precision, frozenset(cells)


@dataclass(frozen=True)
class GeoShape:
    """Base: precision + covering cells computed by subclass constructors."""

    precision: int
    cells: frozenset[int]

    def contains(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


@dataclass(frozen=True)
class BBox(GeoShape):
    top: float
    left: float
    bottom: float
    right: float

    @staticmethod
    def make(top: float, left: float, bottom: float, right: float) -> "BBox":
        precision, cells = _cover_bbox(bottom, top, left, right)
        return BBox(precision, cells, top, left, bottom, right)

    def contains(self, lat, lon):
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        return (lat <= self.top) & (lat >= self.bottom) & (lon >= self.left) & (lon <= self.right)


@dataclass(frozen=True)
class Circle(GeoShape):
    lat: float
    lon: float
    radius_m: float

    @staticmethod
    def make(lat: float, lon: float, radius_m: float) -> "Circle":
        dlat = math.degrees(radius_m / EARTH_RADIUS_M)
        dlon = dlat / max(math.cos(math.radians(lat)), 1e-6)
        precision, cells = _cover_bbox(lat - dlat, lat + dlat, lon - dlon, lon + dlon)
        return Circle(precision, cells, lat, lon, radius_m)

    def contains(self, lat, lon):
        return haversine_m(lat, lon, self.lat, self.lon) <= self.radius_m


@dataclass(frozen=True)
class Annulus(GeoShape):
    lat: float
    lon: float
    from_m: float
    to_m: float

    @staticmethod
    def make(lat: float, lon: float, from_m: float, to_m: float) -> "Annulus":
        dlat = math.degrees(to_m / EARTH_RADIUS_M)
        dlon = dlat / max(math.cos(math.radians(lat)), 1e-6)
        precision, cells = _cover_bbox(lat - dlat, lat + dlat, lon - dlon, lon + dlon)
        return Annulus(precision, cells, lat, lon, from_m, to_m)

    def contains(self, lat, lon):
        d = haversine_m(lat, lon, self.lat, self.lon)
        return (d >= self.from_m) & (d <= self.to_m)


@dataclass(frozen=True)
class Polygon(GeoShape):
    # vertex arrays, closed implicitly (last→first edge)
    lats: tuple = field(default=())
    lons: tuple = field(default=())

    @staticmethod
    def make(points: list[list[float]]) -> "Polygon":
        lats = tuple(float(p[0]) for p in points)
        lons = tuple(float(p[1]) for p in points)
        precision, cells = _cover_bbox(min(lats), max(lats), min(lons), max(lons))
        return Polygon(precision, cells, lats, lons)

    def contains(self, lat, lon):
        """Vectorized even-odd (ray casting) point-in-polygon.

        Boundary points count as inside (matches the inclusive behavior of
        the reference's boost point-in-shape for test fixtures).
        """
        x = np.asarray(lon, dtype=np.float64)
        y = np.asarray(lat, dtype=np.float64)
        inside = np.zeros(x.shape, dtype=bool)
        on_edge = np.zeros(x.shape, dtype=bool)
        n = len(self.lats)
        for i in range(n):
            x1, y1 = self.lons[i], self.lats[i]
            x2, y2 = self.lons[(i + 1) % n], self.lats[(i + 1) % n]
            # edge crossing test for the horizontal ray to +inf in x
            cond = (y1 > y) != (y2 > y)
            with np.errstate(divide="ignore", invalid="ignore"):
                xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            inside ^= cond & (x < xin)
            # point-on-edge: collinear + within bounding box of the edge
            cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
            within = (
                (np.minimum(x1, x2) - 1e-12 <= x)
                & (x <= np.maximum(x1, x2) + 1e-12)
                & (np.minimum(y1, y2) - 1e-12 <= y)
                & (y <= np.maximum(y1, y2) + 1e-12)
            )
            on_edge |= (np.abs(cross) < 1e-12) & within
        return inside | on_edge


def cells_hash_for_points(lat: np.ndarray, lon: np.ndarray, precision: int) -> np.ndarray:
    """Vectorized integer geohash cells for a batch of points."""
    from .geohash import encode_uint

    return encode_uint(lat, lon, precision)


__all__ = [
    "Annulus",
    "BBox",
    "Circle",
    "GeoShape",
    "Polygon",
    "cell_bounds_int",
    "cells_hash_for_points",
    "haversine_m",
]
