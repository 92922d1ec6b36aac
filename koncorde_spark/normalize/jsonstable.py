"""Stable JSON serialization + seeded HMAC filter identifiers.

The reference derives filter / subfilter / condition IDs from
``HMAC-SHA256(seed, json-stable-stringify(obj))`` (see
/root/reference/lib/util/hash.js:25-30). ``json-stable-stringify`` emits
JSON with keys sorted lexicographically and no whitespace; numbers use
JavaScript's ``Number::toString`` formatting (integral doubles print with no
decimal point). This module reproduces that serialization from scratch in
Python so that IDs are deterministic for a fixed 32-byte seed.
"""

from __future__ import annotations

import hashlib
import hmac
import math
import re
from typing import Any

DEFAULT_SEED = bytes(range(32))  # fixed test seed (bytes 0x00..0x1f)


def js_number_repr(x: float) -> str:
    """Format a float the way JavaScript's Number::toString does.

    Integral doubles with |x| < 1e21 print without a decimal point;
    otherwise Python's shortest-roundtrip repr coincides with JS for the
    value ranges used in filters (JS switches to exponent notation at
    >= 1e21 and < 1e-6, same thresholds as repr's 1e16/1e-5 are close
    enough for filter literals; exact for integral and typical decimals).
    """
    if math.isnan(x):
        return "null"  # JSON.stringify(NaN) === 'null'
    if math.isinf(x):
        return "null"
    if x == int(x) and abs(x) < 1e21:
        r = repr(x)
        if "e" in r:
            # ≥1e16 integral doubles: JS prints the shortest-roundtrip
            # digits zero-padded, NOT the exact integer value
            mant, exp = r.split("e")
            neg = mant.startswith("-")
            digits = mant.lstrip("-").replace(".", "")
            pad = int(exp) + 1 - len(digits)
            return ("-" if neg else "") + digits + "0" * pad
        return str(int(x))
    r = repr(x)
    if "e" not in r:
        return r
    # JS exponent formatting differs from Python repr in two ways:
    # no zero-padding ('1e-7', not '1e-07'), and decimal notation is kept
    # down to 1e-6 (repr switches to exponent already at 1e-5).
    mant, exp = r.split("e")
    ei = int(exp)
    if -7 < ei < 0:
        neg = mant.startswith("-")
        digits = mant.lstrip("-").replace(".", "")
        dec = "0." + "0" * (-ei - 1) + digits
        return ("-" if neg else "") + dec
    sign = "+" if ei >= 0 else "-"
    return f"{mant}e{sign}{abs(ei)}"


def stable_stringify(obj: Any) -> str:
    """Serialize ``obj`` to the json-stable-stringify wire format.

    Keys sorted, no whitespace, JS number formatting. Objects exposing a
    ``__koncorde_json__()`` method are serialized through it (used by
    NormalizedExists).
    """
    out: list[str] = []
    _write(obj, out)
    return "".join(out)


_ESCAPE_RE = re.compile('["\\\\\\x00-\\x1f]')
_ESCAPE_MAP = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}


def _escape_match(m: "re.Match[str]") -> str:
    ch = m.group(0)
    mapped = _ESCAPE_MAP.get(ch)
    return mapped if mapped is not None else f"\\u{ord(ch):04x}"


def _escape(s: str) -> str:
    # Minimal JSON string escaping identical to JSON.stringify for the
    # characters that can appear in filter values. Escape-free strings
    # (the overwhelmingly common case) return unchanged without a
    # per-character Python loop.
    if _ESCAPE_RE.search(s) is None:
        return s
    return _ESCAPE_RE.sub(_escape_match, s)


def _write(obj: Any, out: list[str]) -> None:
    if obj is None:
        out.append("null")
    elif obj is True:
        out.append("true")
    elif obj is False:
        out.append("false")
    elif isinstance(obj, str):
        out.append('"')
        out.append(_escape(obj))
        out.append('"')
    elif isinstance(obj, int):
        out.append(str(obj))
    elif isinstance(obj, float):
        out.append(js_number_repr(obj))
    elif isinstance(obj, (list, tuple)):
        out.append("[")
        for i, v in enumerate(obj):
            if i:
                out.append(",")
            _write(v, out)
        out.append("]")
    elif hasattr(obj, "__koncorde_json__"):
        _write(obj.__koncorde_json__(), out)
    elif isinstance(obj, dict):
        out.append("{")
        first = True
        for k in sorted(obj.keys()):
            v = obj[k]
            if v is _UNDEFINED:
                continue  # json-stable-stringify drops undefined values
            if not first:
                out.append(",")
            first = False
            out.append('"')
            out.append(_escape(str(k)))
            out.append('":')
            _write(v, out)
        out.append("}")
    else:
        raise TypeError(f"cannot stable-stringify value of type {type(obj)!r}")


class _Undefined:
    """Sentinel mirroring JS ``undefined`` (dropped from objects)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "undefined"


_UNDEFINED = _Undefined()
UNDEFINED = _UNDEFINED


def seeded_hash(seed: bytes, obj: Any) -> str:
    """HMAC-SHA256 hex digest over the stable serialization of ``obj``."""
    return hmac.new(seed, stable_stringify(obj).encode("utf-8"), hashlib.sha256).hexdigest()
