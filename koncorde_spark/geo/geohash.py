"""Geohash encode/decode (base-32 interleaved lat/lon bits).

Public algorithm (Niemeyer geohash). The reference uses the ``ngeohash``
npm package for decode (/root/reference/lib/util/convertGeopoint.js:98-112);
decode here returns the cell-center point, matching ``ngeohash.decode``.

Vectorized ``encode_many`` (numpy) is used by the percolation matcher to
compute per-document cells for the geohash-cell pre-filter.
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_INDEX = {c: i for i, c in enumerate(BASE32)}


def decode(gh: str) -> tuple[float, float]:
    """Decode a geohash to its cell-center (lat, lon)."""
    lat_lo, lon_lo, lat_hi, lon_hi = decode_bbox(gh)
    return ((lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2)


def decode_bbox(gh: str) -> tuple[float, float, float, float]:
    """Decode a geohash to its cell bounds (lat_lo, lon_lo, lat_hi, lon_hi)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for ch in gh:
        cd = _B32_INDEX[ch]
        for bit in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2
                if cd & bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if cd & bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lon_lo, lat_hi, lon_hi


def encode(lat: float, lon: float, precision: int = 12) -> str:
    """Encode a point to a geohash string of ``precision`` characters."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    bit = 0
    ch = 0
    out: list[str] = []
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch |= 16 >> bit
                lon_lo = mid
            else:
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch |= 16 >> bit
                lat_lo = mid
            else:
                lat_hi = mid
        even = not even
        if bit < 4:
            bit += 1
        else:
            out.append(BASE32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def encode_uint(lat: np.ndarray, lon: np.ndarray, precision: int) -> np.ndarray:
    """Vectorized geohash as uint64 (precision chars = 5*precision bits).

    Interleaves lon/lat bits exactly like :func:`encode`, but returns the
    integer form (top 5*precision bits right-aligned). Integer cells are
    cheaper to hash-probe than strings in the matcher hot path.
    """
    nbits = 5 * precision
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    # Normalize to [0, 1) then take the top bits of the fraction — this is
    # equivalent to the bisection loop but fully vectorized.
    nlon_bits = (nbits + 1) // 2  # lon gets the extra bit when nbits is odd
    nlat_bits = nbits // 2
    lon_frac = np.clip((lon + 180.0) / 360.0, 0.0, np.nextafter(1.0, 0.0))
    lat_frac = np.clip((lat + 90.0) / 180.0, 0.0, np.nextafter(1.0, 0.0))
    lon_bits = (lon_frac * (1 << nlon_bits)).astype(np.uint64)
    lat_bits = (lat_frac * (1 << nlat_bits)).astype(np.uint64)
    # Interleave: bit 0 (MSB of the result) is lon's MSB, then lat's MSB, ...
    out = np.zeros(len(lon_bits) if lon_bits.ndim else 1, dtype=np.uint64)
    for i in range(nlon_bits):
        src = (lon_bits >> np.uint64(nlon_bits - 1 - i)) & np.uint64(1)
        out |= src << np.uint64(nbits - 1 - 2 * i)
    for i in range(nlat_bits):
        src = (lat_bits >> np.uint64(nlat_bits - 1 - i)) & np.uint64(1)
        out |= src << np.uint64(nbits - 2 - 2 * i)
    return out


def encode_int_scalar(lat: float, lon: float, precision: int) -> int:
    """Scalar uint-cell encode (registration-time covering cells)."""
    return int(encode_uint(np.array([lat]), np.array([lon]), precision)[0])


def cell_bounds_int(cell: int, precision: int) -> tuple[float, float, float, float]:
    """Bounds (lat_lo, lon_lo, lat_hi, lon_hi) of an integer cell."""
    nbits = 5 * precision
    nlon_bits = (nbits + 1) // 2
    nlat_bits = nbits // 2
    lon_bits = 0
    lat_bits = 0
    for i in range(nlon_bits):
        lon_bits = (lon_bits << 1) | ((cell >> (nbits - 1 - 2 * i)) & 1)
    for i in range(nlat_bits):
        lat_bits = (lat_bits << 1) | ((cell >> (nbits - 2 - 2 * i)) & 1)
    lon_lo = lon_bits / (1 << nlon_bits) * 360.0 - 180.0
    lat_lo = lat_bits / (1 << nlat_bits) * 180.0 - 90.0
    lon_hi = (lon_bits + 1) / (1 << nlon_bits) * 360.0 - 180.0
    lat_hi = (lat_bits + 1) / (1 << nlat_bits) * 180.0 - 90.0
    return lat_lo, lon_lo, lat_hi, lon_hi
