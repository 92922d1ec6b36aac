"""Builds a CompiledIndex from normalized filters.

Reproduces the link-table construction of the reference engine —
subfilter/condition dedup by seeded content hash
(/root/reference/lib/engine/index.js:175-235), negation folded into the
stored keyword name (`'not' + keyword`, engine/index.js:225) — then compiles
per-keyword probe structures (storeOperands.ts equivalents) into the
broadcast-friendly numpy layout of :mod:`.compiled`.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..geo.shapes import Annulus, BBox, Circle, Polygon
from ..normalize import NormalizedFilter, Transformer, seeded_hash
from ..normalize.standardize import NormalizedExists
from .compiled import (
    CompiledIndex,
    GeoSet,
    MatchPattern,
    RangeSet,
    RegexpSet,
    SelectEntry,
    vkey,
)



class FilterEngine:
    """One filter namespace: authoritative filter registry + compiler."""

    def __init__(self, transformer: Transformer, index_name: str | None = None):
        self.transformer = transformer
        self.index_name = index_name
        self.filters: dict[str, list[list[dict]]] = {}  # fid → DNF
        self._compiled: CompiledIndex | None = None

    def store(self, normalized: NormalizedFilter) -> str:
        if normalized.filter_id not in self.filters:
            self.filters[normalized.filter_id] = normalized.dnf
            self._compiled = None
        return normalized.filter_id

    def remove(self, filter_id: str) -> bool:
        if filter_id in self.filters:
            del self.filters[filter_id]
            self._compiled = None
            return True
        return False

    @property
    def compiled(self) -> CompiledIndex:
        if self._compiled is None:
            self._compiled = compile_index(
                self.filters, self.transformer, self.index_name
            )
        return self._compiled


def compile_index(
    filters: dict[str, list[list[dict]]],
    transformer: Transformer,
    index_name: str | None = None,
) -> CompiledIndex:
    seed = transformer.seed
    ci = CompiledIndex()

    sf_ord_by_hash: dict[str, int] = {}
    sf_filters: list[set[str]] = []
    # cond hash → (keyword, spec, set of sf ords)
    conds: dict[str, tuple[str, Any, set[int]]] = {}
    sf_cond_ids: list[set[str]] = []

    fid_ord = {fid: i for i, fid in enumerate(sorted(filters))}
    ci.filter_ids = sorted(filters)

    for fid in ci.filter_ids:
        dnf = filters[fid]
        for clause in dnf:
            sf_hash = seeded_hash(seed, clause)
            ord_ = sf_ord_by_hash.get(sf_hash)
            if ord_ is None:
                ord_ = len(sf_filters)
                sf_ord_by_hash[sf_hash] = ord_
                sf_filters.append(set())
                sf_cond_ids.append(set())
                for cond in clause:
                    cond_hash = seeded_hash(seed, cond)
                    if cond_hash not in conds:
                        keyword = next(k for k in cond if k != "not")
                        stored_kw = ("not" + keyword) if cond.get("not") else keyword
                        conds[cond_hash] = (stored_kw, cond[keyword], set())
                    conds[cond_hash][2].add(ord_)
                    sf_cond_ids[ord_].add(cond_hash)
            sf_filters[ord_].add(fid)

    ci.n_sf = len(sf_filters)
    ci.sf_counts = np.asarray([len(c) for c in sf_cond_ids], dtype=np.int32)

    # CSR: sf ordinal → filter ordinals
    offsets = np.zeros(ci.n_sf + 1, dtype=np.int64)
    data: list[int] = []
    for i, fset in enumerate(sf_filters):
        ords = sorted(fid_ord[f] for f in fset)
        data.extend(ords)
        offsets[i + 1] = len(data)
    ci.sf_filter_offsets = offsets
    ci._sf_filter_ord = np.asarray(data, dtype=np.int64)

    # ---- per-keyword probe structures ----------------------------------

    range_acc: dict[str, list] = {}
    notrange_acc: dict[str, list] = {}
    regexp_acc: dict[str, list] = {}
    notregexp_acc: dict[str, list] = {}
    geo_acc: dict[str, list] = {}
    notgeo_acc: dict[str, list] = {}

    for _chash, (kw, spec, sf_set) in conds.items():
        sfs = np.asarray(sorted(sf_set), dtype=np.int32)

        if kw == "equals":
            field = next(iter(spec))
            _merge_vmap(ci.equals.setdefault(field, {}), vkey(spec[field]), sfs)
            ci.fields_needed.add(field)
        elif kw == "notequals":
            field = next(iter(spec))
            _merge_vmap(ci.notequals.setdefault(field, {}), vkey(spec[field]), sfs)
            ci.fields_needed.add(field)
        elif kw == "exists":
            ne: NormalizedExists = spec
            if ne.array:
                _merge_vmap(ci.exists_values.setdefault(ne.path, {}), vkey(ne.value), sfs)
            else:
                ci.exists_sfs[ne.path] = _union(ci.exists_sfs.get(ne.path), sfs)
            ci.fields_needed.add(ne.path)
        elif kw == "notexists":
            ne = spec
            if ne.array:
                _merge_vmap(ci.notexists_values.setdefault(ne.path, {}), vkey(ne.value), sfs)
                ci.notexists_values_all[ne.path] = _concat(
                    ci.notexists_values_all.get(ne.path), sfs
                )
            else:
                ci.notexists_sfs[ne.path] = _union(ci.notexists_sfs.get(ne.path), sfs)
            ci.fields_needed.add(ne.path)
        elif kw == "range":
            field = next(iter(spec))
            low, high, lo_strict, hi_strict = _bounds(spec[field])
            range_acc.setdefault(field, []).append((low, high, lo_strict, hi_strict, sfs))
            ci.fields_needed.add(field)
        elif kw == "notrange":
            field = next(iter(spec))
            low, high, lo_strict, hi_strict = _bounds(spec[field])
            # complement intervals with flipped openness (storeOperands.ts:295-333)
            acc = notrange_acc.setdefault(field, [])
            if low != -np.inf:
                acc.append((-np.inf, low, False, not lo_strict, sfs))
            if high != np.inf:
                acc.append((high, np.inf, not hi_strict, False, sfs))
            ci.notrange_all[field] = _concat(ci.notrange_all.get(field), sfs)
            ci.fields_needed.add(field)
        elif kw == "regexp":
            field = next(iter(spec))
            regexp_acc.setdefault(field, []).append(
                ((spec[field]["value"], spec[field].get("flags")), sfs)
            )
            ci.fields_needed.add(field)
        elif kw == "notregexp":
            field = next(iter(spec))
            notregexp_acc.setdefault(field, []).append(
                ((spec[field]["value"], spec[field].get("flags")), sfs)
            )
            ci.notregexp_all[field] = _concat(ci.notregexp_all.get(field), sfs)
            ci.fields_needed.add(field)
        elif kw in ("geospatial", "notgeospatial"):
            shape_kw = next(iter(spec))
            field = next(iter(spec[shape_kw]))
            shape = _build_shape(shape_kw, spec[shape_kw][field])
            acc = geo_acc if kw == "geospatial" else notgeo_acc
            acc.setdefault(field, []).append((shape, sfs))
            ci.geo_fields.add(field)
        elif kw == "match":
            ci.match_patterns.append(MatchPattern(pattern=spec, sfs=sfs))
            ci.needs_docs = True
        elif kw == "notmatch":
            ci.notmatch_patterns.append(MatchPattern(pattern=spec, sfs=sfs))
            ci.needs_docs = True
        elif kw == "select":
            field, idx, query = spec["field"], int(spec["index"]), spec["query"]
            child_norm = transformer.normalize(query, f"{field}[{idx}]")
            child = compile_index(
                {child_norm.filter_id: child_norm.dnf}, transformer, f"{field}[{idx}]"
            )
            # merge with an existing entry for the same (field, index)
            for se in ci.selects:
                if se.field == field and se.index == idx:
                    merged = dict(se.filters)
                    merged[child_norm.filter_id] = _union(
                        merged.get(child_norm.filter_id), sfs
                    )
                    # recompile child with both sub-queries
                    all_children = dict(se._child_filters)
                    all_children[child_norm.filter_id] = child_norm.dnf
                    new_child = compile_index(all_children, transformer, f"{field}[{idx}]")
                    se.child = new_child
                    se.filters = merged
                    se._child_filters = all_children
                    break
            else:
                se = SelectEntry(
                    field=field,
                    index=idx,
                    child=child,
                    filters={child_norm.filter_id: sfs},
                )
                se._child_filters = {child_norm.filter_id: child_norm.dnf}
                ci.selects.append(se)
            ci.needs_docs = True
            ci.fields_needed.add(field)
        elif kw == "everything":
            ci.everything_sfs = _union(ci.everything_sfs if len(ci.everything_sfs) else None, sfs)
        elif kw == "nothing" or kw.startswith("not"):
            # `nothing` and unmatched negated keywords (e.g. notselect,
            # notnothing) never match — same as the reference matcher
            # registry, which has no entry for them.
            pass

    for field, items in range_acc.items():
        ci.ranges[field] = _build_rangeset(items)
    for field, items in notrange_acc.items():
        ci.notranges[field] = _build_rangeset(items)
    for field, items in regexp_acc.items():
        ci.regexps[field] = RegexpSet(
            patterns=[p for p, _ in items], sf_lists=[s for _, s in items]
        )
    for field, items in notregexp_acc.items():
        ci.notregexps[field] = RegexpSet(
            patterns=[p for p, _ in items], sf_lists=[s for _, s in items]
        )
    for field, items in geo_acc.items():
        gs = GeoSet(shapes=[sh for sh, _ in items], sf_lists=[s for _, s in items])
        gs.build_cells()
        ci.geo[field] = gs
    for field, items in notgeo_acc.items():
        gs = GeoSet(shapes=[sh for sh, _ in items], sf_lists=[s for _, s in items])
        gs.build_cells()
        gs.all_sfs = np.concatenate([s for _, s in items]).astype(np.int32)
        ci.notgeo[field] = gs

    return ci


def _merge_vmap(vmap: dict, key, sfs: np.ndarray):
    vmap[key] = _union(vmap.get(key), sfs)


def _union(existing: np.ndarray | None, sfs: np.ndarray) -> np.ndarray:
    if existing is None or len(existing) == 0:
        return np.unique(sfs).astype(np.int32)
    return np.union1d(existing, sfs).astype(np.int32)


def _concat(existing: np.ndarray | None, sfs: np.ndarray) -> np.ndarray:
    """MULTISET accumulation for the negative-keyword blanket arrays.

    The countdown in match_batch requires one hit per CONDITION, so a
    subfilter holding two notequals/notrange/... conditions on the same
    field must receive two hits from that field's blanket emit — a
    deduplicated union would under-count and the subfilter could never
    match (review r2 finding #1)."""
    if existing is None or len(existing) == 0:
        return sfs.astype(np.int32)
    return np.concatenate([existing, sfs]).astype(np.int32)


def _bounds(spec: dict) -> tuple[float, float, bool, bool]:
    low, high = -np.inf, np.inf
    lo_strict = hi_strict = True  # infinite bounds are never reached anyway
    if "gt" in spec:
        low, lo_strict = float(spec["gt"]), True
    if "gte" in spec:
        low, lo_strict = float(spec["gte"]), False
    if "lt" in spec:
        high, hi_strict = float(spec["lt"]), True
    if "lte" in spec:
        high, hi_strict = float(spec["lte"]), False
    return low, high, lo_strict, hi_strict


def _build_rangeset(items: list) -> RangeSet:
    lows = np.asarray([i[0] for i in items], dtype=np.float64)
    highs = np.asarray([i[1] for i in items], dtype=np.float64)
    lo_strict = np.asarray([i[2] for i in items], dtype=bool)
    hi_strict = np.asarray([i[3] for i in items], dtype=bool)
    sf_lists = [i[4] for i in items]
    offsets = np.zeros(len(items) + 1, dtype=np.int64)
    for i, lst in enumerate(sf_lists):
        offsets[i + 1] = offsets[i] + len(lst)
    data = (
        np.concatenate(sf_lists).astype(np.int32)
        if sf_lists
        else np.empty(0, dtype=np.int32)
    )
    return RangeSet(lows, highs, lo_strict, hi_strict, offsets, data)


def _build_shape(shape_kw: str, spec):
    if shape_kw == "geoBoundingBox":
        return BBox.make(spec["top"], spec["left"], spec["bottom"], spec["right"])
    if shape_kw == "geoDistance":
        return Circle.make(spec["lat"], spec["lon"], spec["distance"])
    if shape_kw == "geoDistanceRange":
        return Annulus.make(spec["lat"], spec["lon"], spec["from"], spec["to"])
    if shape_kw == "geoPolygon":
        return Polygon.make(spec)
    raise ValueError(f"unknown geospatial shape keyword: {shape_kw}")
