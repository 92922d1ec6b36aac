"""Normalization facade: DSL filter → canonical DNF + seeded filter ID.

Mirrors the reference Transformer (/root/reference/lib/transform/index.js:44-48):
``normalize = canonical(standardize(filter))``; the filter ID is the seeded
HMAC of ``{filter: normalized, index}`` (/root/reference/lib/index.ts:187).
"""

from __future__ import annotations

from dataclasses import dataclass

from .canonical import Canonical, FilterTooComplexError
from .jsonstable import DEFAULT_SEED, seeded_hash, stable_stringify
from .standardize import NormalizedExists, Standardizer, compile_js_regex

__all__ = [
    "Canonical",
    "DEFAULT_SEED",
    "FilterTooComplexError",
    "NormalizedFilter",
    "NormalizedExists",
    "Standardizer",
    "Transformer",
    "compile_js_regex",
    "seeded_hash",
    "stable_stringify",
]


@dataclass
class NormalizedFilter:
    """Result of normalization: DNF clauses + identity."""

    filter_id: str
    index: str | None
    dnf: list[list[dict]]  # OR of ANDs; each condition dict carries a 'not' flag


class Transformer:
    def __init__(self, max_conditions: int = 50, seed: bytes = DEFAULT_SEED,
                 regexp_engine: str = "js"):
        if not isinstance(seed, (bytes, bytearray)) or len(seed) != 32:
            raise ValueError("Invalid seed: expected a 32 bytes long buffer")
        self.seed = bytes(seed)
        self.standardizer = Standardizer(regexp_engine)
        self.canonical = Canonical(max_conditions)

    def standardize(self, filters: dict) -> dict:
        return self.standardizer.standardize(filters)

    def normalize(self, filters: dict, index: str | None = None) -> NormalizedFilter:
        dnf = self.canonical.convert(self.standardizer.standardize(filters))
        fid = seeded_hash(self.seed, {"filter": dnf, "index": index})
        return NormalizedFilter(filter_id=fid, index=index, dnf=dnf)
