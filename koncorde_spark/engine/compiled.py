"""Compiled percolation index: link tables + per-keyword probe structures.

Spark-first re-expression of the reference engine
(/root/reference/lib/engine/index.js:51-235 and storeOperands.ts): the
filter → subfilter → condition link tables are the same conceptual shape,
but the probe structures are immutable, picklable, numpy-backed objects
designed to be ``spark.sparkContext.broadcast`` to executors and probed
**vectorized over whole Arrow batches** instead of one document at a time.

Removal (/root/reference/lib/engine/removeOperands.js) is handled the
Spark-idiomatic way: the authoritative state is the registered-filters dict;
``compile()`` derives a fresh CompiledIndex, so "remove" is just re-derive
without the filter — no in-place surgical teardown.
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass, field as dc_field
from typing import Any

import numpy as np
import pandas as pd

# pandas warns when str.contains gets a pattern with groups; matching
# intent here is a plain boolean test, groups are incidental
warnings.filterwarnings(
    "ignore", message="This pattern is interpreted as a regular expression"
)

from ..geo.geopoint import convert_geopoint
from ..geo.shapes import Annulus, BBox, Circle, GeoShape, Polygon, cells_hash_for_points
from ..normalize import NormalizedFilter, compile_js_regex, seeded_hash
from ..normalize.standardize import NormalizedExists

# ---------------------------------------------------------------------------
# typed value keys (strict JS equality: 1 !== '1', true !== 1)
# ---------------------------------------------------------------------------


def vkey(v: Any):
    """Type-tagged key for strict-equality dictionaries."""
    if v is None:
        return ("null", None)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, (int, float)):
        return ("num", float(v))
    if isinstance(v, str):
        return ("str", v)
    return ("other", repr(v))


def _item_matches(item: Any, tag: str, value: Any) -> bool:
    """One typed-scalar equality check (the strict true!==1 contract)."""
    if tag == "null":
        return item is None
    if tag == "bool":
        return isinstance(item, (bool, np.bool_)) and bool(item) == value
    if tag == "num":
        return (
            isinstance(item, (int, float, np.integer, np.floating))
            and not isinstance(item, (bool, np.bool_))
            and float(item) == value
        )
    if tag == "str":
        return isinstance(item, str) and item == value
    return False


def typed_contains(lst: Any, tag: str, value: Any) -> bool:
    """Strict containment of a typed scalar in a (possibly non-list) value."""
    if not isinstance(lst, (list, tuple, np.ndarray)):
        return False
    return any(_item_matches(item, tag, value) for item in lst)


def _flatten_object_lists(vals: np.ndarray):
    """One-pass decomposition of an object array's list entries.

    Returns ``(is_arr, items, parents)``: ``is_arr`` marks the list-typed
    entries; ``items`` is the flat object array of every list element;
    ``parents[i]`` is the source row of ``items[i]``. The single Python
    pass here replaces one FULL ``Series.apply`` pass PER CONDITION —
    every condition on the column then probes the same flattened view."""
    n = len(vals)
    is_arr = np.fromiter(
        (isinstance(v, (list, tuple, np.ndarray)) for v in vals),
        dtype=bool,
        count=n,
    )
    arr_pos = np.nonzero(is_arr)[0]
    if len(arr_pos) == 0:
        return is_arr, np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    lens = np.fromiter(
        (len(vals[i]) for i in arr_pos), dtype=np.int64, count=len(arr_pos)
    )
    parents = np.repeat(arr_pos, lens)
    items = np.empty(int(lens.sum()), dtype=object)
    pos = 0
    for i, ln in zip(arr_pos, lens):
        if ln:
            v = vals[i]
            # list() guard: slice-assigning a 2-D ndarray into an object
            # slice would broadcast-fail; a list of its rows assigns
            items[pos : pos + ln] = v if type(v) is list else list(v)
        pos += ln
    return is_arr, items, parents


class _FlatItems:
    """Factorized view of a flattened list column: typed containment per
    condition costs O(uniques) Python + O(items) numpy gathers instead of
    a per-row Python ``apply``. Bool items factorize apart from the rest
    (True/1 Python-hash equality — same guard as ``_scalar_eq_groups``);
    None/NaN items carry factorize's -1 sentinel, so ``null`` containment
    is answered from a dedicated identity-is-None mask."""

    def __init__(self, items: np.ndarray, parents: np.ndarray, n_rows: int):
        self.items = items
        self.parents = parents
        self.n_rows = n_rows
        self.is_none = (
            np.fromiter((x is None for x in items), dtype=bool, count=len(items))
            if len(items)
            else np.empty(0, dtype=bool)
        )
        # parts: (positions, codes, uniques); codes None → unhashable
        # items in that partition, probed per-item instead
        self.parts: list[tuple[np.ndarray, Any, Any]] = []
        if len(items) == 0:
            return
        bmask = np.fromiter(
            (isinstance(x, (bool, np.bool_)) for x in items),
            dtype=bool,
            count=len(items),
        )
        if bmask.any() and not bmask.all():
            groups = [np.nonzero(bmask)[0], np.nonzero(~bmask)[0]]
        else:
            groups = [np.arange(len(items), dtype=np.int64)]
        for pos in groups:
            try:
                codes, uniques = pd.factorize(
                    pd.Series(items[pos], dtype=object)
                )
            except TypeError:
                self.parts.append((pos, None, None))
                continue
            self.parts.append((pos, codes, np.asarray(uniques, dtype=object)))

    def row_mask(self, tag: str, value: Any) -> np.ndarray:
        """Bool mask over source rows: list contains the typed value."""
        out = np.zeros(self.n_rows, dtype=bool)
        if len(self.items) == 0:
            return out
        if tag == "null":
            out[self.parents[self.is_none]] = True
            return out
        for pos, codes, uniques in self.parts:
            if codes is None:
                im = np.fromiter(
                    (_item_matches(self.items[i], tag, value) for i in pos),
                    dtype=bool,
                    count=len(pos),
                )
            else:
                uf = np.fromiter(
                    (_item_matches(u, tag, value) for u in uniques),
                    dtype=bool,
                    count=len(uniques),
                )
                im = np.zeros(len(pos), dtype=bool)
                valid = codes >= 0  # -1 = factorize NA sentinel (None/NaN)
                im[valid] = uf[codes[valid]]
            out[self.parents[pos[im]]] = True
        return out

    def rows_containing(self, tag: str, value: Any) -> np.ndarray:
        return np.nonzero(self.row_mask(tag, value))[0]


# ---------------------------------------------------------------------------
# probe structures
# ---------------------------------------------------------------------------


@dataclass
class RangeSet:
    """All range intervals on one field, SoA layout for broadcast tests.

    ``notrange`` complements are inserted at build time as the two
    complement intervals with flipped bound openness, exactly like the
    reference (/root/reference/lib/engine/storeOperands.ts:295-333).
    """

    lows: np.ndarray  # float64
    highs: np.ndarray  # float64
    low_strict: np.ndarray  # bool (True = open bound)
    high_strict: np.ndarray  # bool
    sf_offsets: np.ndarray  # int64, CSR offsets into sf_data
    sf_data: np.ndarray  # int32 subfilter ordinals

    def probe(self, values: np.ndarray, valid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Return (row_idx, sf_ord) hit pairs for numeric values."""
        k = len(self.lows)
        if k == 0:
            return _EMPTY_PAIRS
        rows_all = []
        ivals_all = []
        n = len(values)
        # chunk so the boolean matrix stays < ~64M cells
        chunk = max(1, (1 << 26) // max(k, 1))
        vi = np.nonzero(valid)[0]
        v = values[vi]
        for s in range(0, len(v), chunk):
            vv = v[s : s + chunk, None]
            ge = np.where(self.low_strict, vv > self.lows, vv >= self.lows)
            le = np.where(self.high_strict, vv < self.highs, vv <= self.highs)
            r, c = np.nonzero(ge & le)
            rows_all.append(vi[s : s + chunk][r])
            ivals_all.append(c)
        if not rows_all:
            return _EMPTY_PAIRS
        rows = np.concatenate(rows_all)
        ivs = np.concatenate(ivals_all)
        return _expand_csr(rows, ivs, self.sf_offsets, self.sf_data)


@dataclass
class RegexpSet:
    """Regex conditions on one field; compiled lazily per process."""

    patterns: list[tuple[str, str | None]]  # (pattern, flags)
    sf_lists: list[np.ndarray]
    _compiled: list = dc_field(default_factory=list, repr=False)

    def compiled(self):
        if len(self._compiled) != len(self.patterns):
            self._compiled = [compile_js_regex(p, f) for p, f in self.patterns]
        return self._compiled


@dataclass
class GeoSet:
    """Geo shapes on one field + cell → candidate-shape prefilter maps."""

    shapes: list[GeoShape]
    sf_lists: list[np.ndarray]
    # precision → {cell_int: np.ndarray(shape indices)}
    cell_maps: dict[int, dict[int, np.ndarray]] = dc_field(default_factory=dict)
    all_sfs: np.ndarray = dc_field(default_factory=lambda: np.empty(0, dtype=np.int32))

    def build_cells(self):
        per_precision: dict[int, dict[int, list[int]]] = {}
        for si, shape in enumerate(self.shapes):
            pp = per_precision.setdefault(shape.precision, {})
            for cell in shape.cells:
                pp.setdefault(cell, []).append(si)
        self.cell_maps = {
            p: {c: np.asarray(v, dtype=np.int32) for c, v in m.items()}
            for p, m in per_precision.items()
        }

    def candidates(self, lat: np.ndarray, lon: np.ndarray, valid: np.ndarray):
        """Geohash-cell pre-filter: (row, shape_idx) candidate pairs."""
        vi = np.nonzero(valid)[0]
        if len(vi) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
        rows_out = []
        shapes_out = []
        for precision, cmap in self.cell_maps.items():
            cells = cells_hash_for_points(lat[vi], lon[vi], precision)
            # probe the dict per distinct cell (few distinct cells per batch)
            uniq, inv = np.unique(cells, return_inverse=True)
            for ui, cell in enumerate(uniq):
                cand = cmap.get(int(cell))
                if cand is None:
                    continue
                rr = vi[inv == ui]
                rows_out.append(np.repeat(rr, len(cand)))
                shapes_out.append(np.tile(cand, len(rr)))
        if not rows_out:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
        return np.concatenate(rows_out), np.concatenate(shapes_out)


_EMPTY_PAIRS = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32))


def _expand_csr(rows, idxs, offsets, data):
    """Expand per-(row, item) hits into (row, sf) pairs through CSR lists."""
    if len(rows) == 0:
        return _EMPTY_PAIRS
    counts = (offsets[idxs + 1] - offsets[idxs]).astype(np.int64)
    out_rows = np.repeat(rows, counts)
    # gather sf data: build index ranges
    starts = offsets[idxs]
    total = int(counts.sum())
    if total == 0:
        return _EMPTY_PAIRS
    # vectorized multi-range gather
    flat = np.arange(total, dtype=np.int64)
    cum = np.concatenate(([0], np.cumsum(counts)))
    within = flat - np.repeat(cum[:-1], counts)
    gather = np.repeat(starts, counts) + within
    return out_rows, data[gather]


def _csr_from_lists(sf_lists: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(sf_lists) + 1, dtype=np.int64)
    for i, lst in enumerate(sf_lists):
        offsets[i + 1] = offsets[i] + len(lst)
    data = (
        np.concatenate(sf_lists).astype(np.int32)
        if sf_lists
        else np.empty(0, dtype=np.int32)
    )
    return offsets, data


# ---------------------------------------------------------------------------
# document batches
# ---------------------------------------------------------------------------


@dataclass
class DocBatch:
    """A batch of documents in columnar form for the matcher."""

    n: int
    cols: dict[str, pd.Series]  # dot-path → values
    docs: pd.Series | None = None  # original documents (dicts) for match/select

    _geo_cache: dict = dc_field(default_factory=dict, repr=False)

    def col(self, path: str) -> pd.Series | None:
        return self.cols.get(path)

    def geo(self, path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(lat, lon, valid) arrays for a geopoint field."""
        cached = self._geo_cache.get(path)
        if cached is not None:
            return cached
        lat_s = self.cols.get(f"{path}.lat")
        lon_s = self.cols.get(f"{path}.lon")
        if lat_s is not None and lon_s is not None:
            lat = pd.to_numeric(lat_s, errors="coerce").to_numpy(dtype=np.float64, na_value=np.nan)
            lon = pd.to_numeric(lon_s, errors="coerce").to_numpy(dtype=np.float64, na_value=np.nan)
            valid = ~(np.isnan(lat) | np.isnan(lon))
        else:
            s = self.cols.get(path)
            lat = np.full(self.n, np.nan)
            lon = np.full(self.n, np.nan)
            if s is not None:
                for i, v in enumerate(s):
                    if v is None or (isinstance(v, float) and math.isnan(v)):
                        continue
                    pt = convert_geopoint(_unwrap(v))
                    if pt is not None:
                        lat[i], lon[i] = pt
            valid = ~(np.isnan(lat) | np.isnan(lon))
        out = (lat, lon, valid)
        self._geo_cache[path] = out
        return out


def _unwrap(v):
    """Arrow → python: structs arrive as dicts already; Rows → dict."""
    if hasattr(v, "asDict"):
        return v.asDict(recursive=True)
    return v


def extract_path(doc: Any, path: str):
    """Dot-path extraction mirroring reference flatten semantics
    (/root/reference/lib/util/Flatten.ts:21-46): intermediate object nodes
    are addressable; arrays are leaves (no descent)."""
    cur = doc
    for part in path.split("."):
        if isinstance(cur, dict):
            if part not in cur:
                return _MISSING
            cur = cur[part]
        else:
            return _MISSING
    return cur


class _Missing:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "<missing>"


_MISSING = _Missing()


# ---------------------------------------------------------------------------
# compiled index
# ---------------------------------------------------------------------------


@dataclass
class MatchPattern:
    """A `match` keyword pattern (recursive subset semantics)."""

    pattern: dict
    sfs: np.ndarray


@dataclass
class SelectEntry:
    """A `select` keyword: child index per (field, index)."""

    field: str
    index: int
    child: "CompiledIndex"
    # child filter_id → parent sf ordinals
    filters: dict[str, np.ndarray]


class CompiledIndex:
    """Immutable, picklable probe structures for one filter namespace."""

    def __getstate__(self):
        # never pickle the cached Spark broadcast handle (spark/percolate
        # attaches it driver-side for reuse; it must not ride to executors)
        state = dict(self.__dict__)
        state.pop("_percolate_bc", None)
        return state

    def __init__(self):
        self.n_sf = 0
        self.sf_counts = np.empty(0, dtype=np.int32)
        self.sf_filter_offsets = np.empty(1, dtype=np.int64)
        self.sf_filter_data: list[str] = []  # filter ids, CSR by sf ordinal
        self.filter_ids: list[str] = []
        self.fields_needed: set[str] = set()
        self.geo_fields: set[str] = set()
        self.needs_docs = False

        self.equals: dict[str, dict[tuple, np.ndarray]] = {}
        self.notequals: dict[str, dict[tuple, np.ndarray]] = {}
        self.exists_sfs: dict[str, np.ndarray] = {}
        self.exists_values: dict[str, dict[tuple, np.ndarray]] = {}
        self.notexists_sfs: dict[str, np.ndarray] = {}
        self.notexists_values: dict[str, dict[tuple, np.ndarray]] = {}
        self.notexists_values_all: dict[str, np.ndarray] = {}
        self.ranges: dict[str, RangeSet] = {}
        self.notranges: dict[str, RangeSet] = {}
        self.notrange_all: dict[str, np.ndarray] = {}
        self.regexps: dict[str, RegexpSet] = {}
        self.notregexps: dict[str, RegexpSet] = {}
        self.notregexp_all: dict[str, np.ndarray] = {}
        self.geo: dict[str, GeoSet] = {}
        self.notgeo: dict[str, GeoSet] = {}
        self.match_patterns: list[MatchPattern] = []
        self.notmatch_patterns: list[MatchPattern] = []
        self.selects: list[SelectEntry] = []
        self.everything_sfs = np.empty(0, dtype=np.int32)

    # -- matching ---------------------------------------------------------

    def match_batch(self, batch: DocBatch) -> tuple[np.ndarray, np.ndarray]:
        """Match a batch; returns deduplicated (row, filter-ordinal) pairs.

        The condition countdown of the reference
        (/root/reference/lib/engine/matcher/testTables.js:53-66) becomes a
        single vectorized count: every keyword section emits
        (row, sf_ordinal) hits — one per matched condition — and a subfilter
        matches when its hit count equals its condition count.
        """
        hits_r: list[np.ndarray] = []
        hits_s: list[np.ndarray] = []

        def emit(rows, sfs):
            if len(rows):
                hits_r.append(np.asarray(rows, dtype=np.int64))
                hits_s.append(np.asarray(sfs, dtype=np.int32))

        def emit_rows_x_sfs(rows: np.ndarray, sfs: np.ndarray):
            if len(rows) and len(sfs):
                hits_r.append(np.repeat(np.asarray(rows, dtype=np.int64), len(sfs)))
                hits_s.append(np.tile(sfs, len(rows)))

        n = batch.n
        all_rows = np.arange(n, dtype=np.int64)

        if len(self.everything_sfs):
            emit_rows_x_sfs(all_rows, self.everything_sfs)

        self._match_equals(batch, emit, emit_rows_x_sfs)
        self._match_exists(batch, emit, emit_rows_x_sfs)
        self._match_ranges(batch, emit, emit_rows_x_sfs)
        self._match_regexps(batch, emit, emit_rows_x_sfs)
        self._match_geo(batch, emit, emit_rows_x_sfs)
        self._match_match(batch, emit)
        self._match_select(batch, emit)

        if not hits_r:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)

        rows = np.concatenate(hits_r)
        sfs = np.concatenate(hits_s).astype(np.int64)
        combined = rows * self.n_sf + sfs
        uniq, counts = np.unique(combined, return_counts=True)
        u_rows = uniq // self.n_sf
        u_sfs = uniq % self.n_sf
        ok = counts == self.sf_counts[u_sfs]
        m_rows = u_rows[ok]
        m_sfs = u_sfs[ok]
        # resolve sf → filters (CSR), then dedup (row, filter)
        off = self.sf_filter_offsets
        counts_f = off[m_sfs + 1] - off[m_sfs]
        out_rows = np.repeat(m_rows, counts_f)
        total = int(counts_f.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        flat = np.arange(total, dtype=np.int64)
        cum = np.concatenate(([0], np.cumsum(counts_f)))
        within = flat - np.repeat(cum[:-1], counts_f)
        gather = np.repeat(off[m_sfs], counts_f) + within
        out_fids = self._sf_filter_ord[gather]
        pair = out_rows * len(self.filter_ids) + out_fids
        upair = np.unique(pair)
        return upair // len(self.filter_ids), upair % len(self.filter_ids)

    def match_docs(self, docs: list[dict]) -> list[list[str]]:
        """Local (driver-side) matching of Python dict documents — the
        ``Koncorde.test`` compatibility path used by ported reference tests."""
        batch = batch_from_docs(docs, self)
        rows, fords = self.match_batch(batch)
        out: list[list[str]] = [[] for _ in range(len(docs))]
        for r, f in zip(rows.tolist(), fords.tolist()):
            out[r].append(self.filter_ids[f])
        return out

    # -- keyword sections ---------------------------------------------------

    def _series_scalar_hits(self, s: pd.Series, cond_map: dict[tuple, np.ndarray], emit):
        """Emit (rows, sfs) for strict-equality probes over one column.

        O(n log n): factorize to distinct values, dict-probe the (few)
        distinct values against the condition map, then gather row groups
        per hit value via one stable argsort — the batch analogue of the
        reference's O(1)-per-doc Map.get
        (/root/reference/lib/engine/matcher/matchEquals.js:30-38).
        """
        if s is None:
            return
        for _key, rows, sfs in self._scalar_eq_groups(s, cond_map):
            emit(np.repeat(rows, len(sfs)), np.tile(sfs, len(rows)))

    def _scalar_eq_groups(self, s: pd.Series, cond_map: dict[tuple, np.ndarray]):
        """Yield (value_key, rows, sfs) per condition whose value occurs in
        the column (rows = absolute row indices with that exact value;
        the null condition yields the NA rows)."""
        null_sfs = cond_map.get(("null", None))
        isna = s.isna().to_numpy()
        if null_sfs is not None and isna.any():
            yield ("null", None), np.nonzero(isna)[0], null_sfs
        nn = np.nonzero(~isna)[0]
        if len(nn) == 0:
            return
        sub = s.iloc[nn]
        if sub.dtype == object:
            # Strict typing: Python hashes True==1 and False==0, so a batch
            # mixing booleans and numbers in one field would factorize them
            # into ONE code and the first-seen value's vkey would decide the
            # whole group (true !== 1 contract, reference matchEquals.js
            # strict Map keys). Split on the bool/non-bool boundary so each
            # factorize partition is type-pure w.r.t. that hash collision.
            vals = sub.to_numpy()
            bmask = np.fromiter(
                (isinstance(x, (bool, np.bool_)) for x in vals),
                dtype=bool, count=len(vals),
            )
            if bmask.any() and not bmask.all():
                yield from self._factorized_groups(nn[bmask], sub[bmask], cond_map)
                yield from self._factorized_groups(nn[~bmask], sub[~bmask], cond_map)
                return
        yield from self._factorized_groups(nn, sub, cond_map)

    def _factorized_groups(self, nn, sub, cond_map):
        try:
            codes, uniques = pd.factorize(sub)
        except TypeError:
            # unhashable values (lists/structs) → typed per-row fallback
            for off, v in zip(nn, sub):
                try:
                    key = vkey(_coerce_np(v))
                    sfs = cond_map.get(key)
                except TypeError:
                    continue
                if sfs is not None:
                    yield key, np.asarray([off], dtype=np.int64), sfs
            return
        hits = []
        for ui, u in enumerate(uniques):
            try:
                key = vkey(_coerce_np(u))
                sfs = cond_map.get(key)
            except TypeError:
                continue
            if sfs is not None:
                hits.append((ui, key, sfs))
        if not hits:
            return
        order = np.argsort(codes, kind="stable")
        sorted_codes = codes[order]
        for ui, key, sfs in hits:
            lo = np.searchsorted(sorted_codes, ui, side="left")
            hi = np.searchsorted(sorted_codes, ui, side="right")
            yield key, nn[order[lo:hi]], sfs

    def _match_equals(self, batch, emit, emit_x):
        for field, cond_map in self.equals.items():
            self._series_scalar_hits(batch.col(field), cond_map, emit)
        for field, cond_map in self.notequals.items():
            s = batch.col(field)
            # every condition gets its OWN emit (the countdown needs one
            # hit per condition — a deduplicated union blanket would make
            # a subfilter with two notequals on one field never match)
            null_key = ("null", None)
            nonnull_multi = [sfs for k2, sfs in cond_map.items() if k2 != null_key]
            na_sfs = (
                np.concatenate(nonnull_multi).astype(np.int32)
                if nonnull_multi
                else np.empty(0, dtype=np.int32)
            )
            if s is None:
                # absent column ≡ null: matches every notequals except
                # the notequals-null condition itself. Deliberate divergence
                # from the reference (where undefined !== null is TRUE, so a
                # MISSING field matches notequals-null): a tabular engine
                # conflates missing/null, and we follow the SQL-twin
                # semantics (to_sql: IS NOT NULL) on both sides.
                emit_x(np.arange(batch.n, dtype=np.int64), na_sfs)
                continue
            isna = s.isna().to_numpy()
            emit_x(np.nonzero(isna)[0], na_sfs)
            nn = np.nonzero(~isna)[0]
            if len(nn) == 0:
                continue
            # per-cond equal rows (at most one cond value per row)
            eq_map: dict[tuple, list[np.ndarray]] = {}
            for key2, rows2, _sfs in self._scalar_eq_groups(s, cond_map):
                eq_map.setdefault(key2, []).append(rows2)
            for key2, sfs2 in cond_map.items():
                if key2 == null_key:
                    hit = nn  # present value !== null, always
                else:
                    eq_lists = eq_map.get(key2)
                    if eq_lists:
                        eq = np.concatenate(eq_lists)
                        hit = np.setdiff1d(nn, eq, assume_unique=False)
                    else:
                        hit = nn
                emit_x(hit.astype(np.int64), sfs2)

    def _match_exists(self, batch, emit, emit_x):
        for path, sfs in self.exists_sfs.items():
            s = batch.col(path)
            if s is None:
                continue
            rows = np.nonzero(s.notna().to_numpy())[0]
            emit_x(rows, sfs)
        for path, vmap in self.exists_values.items():
            s = batch.col(path)
            if s is None:
                continue
            if s.dtype != object:
                continue  # scalar-typed column: no entry can be an array
            is_arr, items, parents = _flatten_object_lists(
                s.to_numpy(dtype=object)
            )
            if not is_arr.any():
                continue
            flat = _FlatItems(items, parents, batch.n)
            for (tag, value), sfs in vmap.items():
                emit_x(flat.rows_containing(tag, value), sfs)
        for path, sfs in self.notexists_sfs.items():
            s = batch.col(path)
            if s is None:
                rows = np.arange(batch.n, dtype=np.int64)
            else:
                rows = np.nonzero(s.isna().to_numpy())[0]
            emit_x(rows, sfs)
        for path, vmap in self.notexists_values.items():
            s = batch.col(path)
            all_sfs = self.notexists_values_all[path]
            if s is None:
                emit_x(np.arange(batch.n, dtype=np.int64), all_sfs)
                continue
            isna = s.isna().to_numpy()
            emit_x(np.nonzero(isna)[0], all_sfs)
            nn = np.nonzero(~isna)[0]
            if len(nn) == 0:
                continue
            if s.dtype != object:
                # scalar-typed column: no entry is an array, every
                # array-value cond matches every present row
                emit_x(nn.astype(np.int64), all_sfs)
                continue
            is_arr, items, parents = _flatten_object_lists(
                s.to_numpy(dtype=object)
            )
            # non-array present value: every array-value cond matches
            emit_x(nn[~is_arr[nn]], all_sfs)
            arr_rows = np.nonzero(is_arr)[0]  # arrays are never NA rows
            if len(arr_rows) == 0:
                continue
            flat = _FlatItems(items, parents, batch.n)
            for (tag, value), sfs in vmap.items():
                contains = flat.row_mask(tag, value)
                emit_x(arr_rows[~contains[arr_rows]], sfs)

    def _numeric_col(self, batch, field):
        s = batch.col(field)
        if s is None:
            return None, None
        if pd.api.types.is_bool_dtype(s.dtype):
            return None, None
        if pd.api.types.is_numeric_dtype(s.dtype):
            vals = s.to_numpy(dtype=np.float64, na_value=np.nan)
            return vals, ~np.isnan(vals)
        # object column: extract numbers only (strict typing: strings don't match range)
        vals = np.full(batch.n, np.nan)
        for i, v in enumerate(s):
            if isinstance(v, (int, float, np.integer, np.floating)) and not isinstance(
                v, (bool, np.bool_)
            ):
                vals[i] = float(v)
        return vals, ~np.isnan(vals)

    def _match_ranges(self, batch, emit, emit_x):
        for field, rset in self.ranges.items():
            vals, valid = self._numeric_col(batch, field)
            if vals is None:
                continue
            r, s = rset.probe(vals, valid)
            emit(r, s)
        for field, rset in self.notranges.items():
            all_sfs = self.notrange_all[field]
            vals, valid = self._numeric_col(batch, field)
            if vals is None:
                # column entirely absent → non-number → all notrange match
                emit_x(np.arange(batch.n, dtype=np.int64), all_sfs)
                continue
            # non-number value ⇒ matches all notrange conds on the field
            emit_x(np.nonzero(~valid)[0], all_sfs)
            r, s = rset.probe(vals, valid)
            # complement intervals already encode the negation — hits are matches
            emit(r, s)

    @staticmethod
    def _string_view(s: pd.Series) -> "pd.Series | None":
        """String-only view of a column for regexp probes.

        Non-string values become NA; a column whose dtype can't hold strings
        at all (numeric/bool from a Spark schema) returns None — regexp on a
        non-string simply doesn't match (reference regexpCondition), it must
        never crash the mapInPandas job with a .str accessor error.
        """
        if pd.api.types.is_object_dtype(s.dtype):
            return s.where(s.apply(lambda v: isinstance(v, str)), other=None)
        if pd.api.types.is_string_dtype(s.dtype):
            return s
        return None

    def _match_regexps(self, batch, emit, emit_x):
        for field, rx in self.regexps.items():
            s = batch.col(field)
            if s is None:
                continue
            sstr = self._string_view(s)
            if sstr is None:
                continue  # non-string column ⇒ zero regexp hits
            for creg, sfs in zip(rx.compiled(), rx.sf_lists):
                hit = sstr.str.contains(creg, na=False, regex=True).to_numpy(dtype=bool)
                emit_x(np.nonzero(hit)[0], sfs)
        for field, rx in self.notregexps.items():
            s = batch.col(field)
            if s is None:
                all_sfs = self.notregexp_all[field]
                emit_x(np.arange(batch.n, dtype=np.int64), all_sfs)
                continue
            sstr = self._string_view(s)
            if sstr is None:
                # non-string column ⇒ every notregexp cond matches all rows
                emit_x(np.arange(batch.n, dtype=np.int64), self.notregexp_all[field])
                continue
            for creg, sfs in zip(rx.compiled(), rx.sf_lists):
                hit = sstr.str.contains(creg, na=False, regex=True).to_numpy(dtype=bool)
                # missing or non-matching values ⇒ match
                emit_x(np.nonzero(~hit)[0], sfs)

    def _match_geo(self, batch, emit, emit_x):
        for field, gset in self.geo.items():
            lat, lon, valid = batch.geo(field)
            rows, shape_idx = gset.candidates(lat, lon, valid)
            if len(rows) == 0:
                continue
            for si in np.unique(shape_idx):
                rr = rows[shape_idx == si]
                inside = gset.shapes[si].contains(lat[rr], lon[rr])
                hit_rows = rr[inside]
                sfs = gset.sf_lists[si]
                emit_x(hit_rows, sfs)
        for field, gset in self.notgeo.items():
            lat, lon, valid = batch.geo(field)
            # no/invalid geopoint ⇒ all notgeospatial conds on the field match
            emit_x(np.nonzero(~valid)[0], gset.all_sfs)
            vi = np.nonzero(valid)[0]
            if len(vi) == 0:
                continue
            matched = np.zeros((len(gset.shapes), batch.n), dtype=bool)
            rows, shape_idx = gset.candidates(lat, lon, valid)
            for si in np.unique(shape_idx):
                rr = rows[shape_idx == si]
                inside = gset.shapes[si].contains(lat[rr], lon[rr])
                matched[si, rr[inside]] = True
            for si, sfs in enumerate(gset.sf_lists):
                out_rows = vi[~matched[si, vi]]
                emit_x(out_rows, sfs)

    def _match_match(self, batch, emit):
        if not self.match_patterns and not self.notmatch_patterns:
            return
        docs = batch.docs
        if docs is None:
            return
        from .objectmatcher import match_document

        for mp in self.match_patterns:
            rows = [
                i for i, d in enumerate(docs)
                if isinstance(d, dict) and match_document(d, mp.pattern)
            ]
            if rows:
                r = np.asarray(rows, dtype=np.int64)
                emit(np.repeat(r, len(mp.sfs)), np.tile(mp.sfs, len(r)))
        for mp in self.notmatch_patterns:
            rows = [
                i for i, d in enumerate(docs)
                if not (isinstance(d, dict) and match_document(d, mp.pattern))
            ]
            if rows:
                r = np.asarray(rows, dtype=np.int64)
                emit(np.repeat(r, len(mp.sfs)), np.tile(mp.sfs, len(r)))

    def _match_select(self, batch, emit):
        if not self.selects:
            return
        docs = batch.docs
        for se in self.selects:
            # collect the selected element per row, then match them as a
            # child batch in one vectorized pass
            elems: list = []
            rows: list[int] = []
            if docs is not None:
                values = [
                    extract_path(d, se.field) if isinstance(d, dict) else _MISSING for d in docs
                ]
            else:
                s = batch.col(se.field)
                if s is None:
                    continue
                values = list(s)
            for i, arr in enumerate(values):
                if not isinstance(arr, (list, tuple, np.ndarray)):
                    continue
                idx = se.index if se.index >= 0 else len(arr) + se.index
                if idx < 0 or idx >= len(arr):
                    continue
                elems.append({"value": _coerce_np(arr[idx])})
                rows.append(i)
            if not rows:
                continue
            child_batch = batch_from_docs(elems, se.child)
            c_rows, c_fords = se.child.match_batch(child_batch)
            for cr, cf in zip(c_rows.tolist(), c_fords.tolist()):
                child_fid = se.child.filter_ids[cf]
                sfs = se.filters.get(child_fid)
                if sfs is not None:
                    emit(np.full(len(sfs), rows[cr], dtype=np.int64), sfs)

    # finalize helper set by builder
    _sf_filter_ord: np.ndarray = np.empty(0, dtype=np.int64)


def _coerce_np(v):
    """numpy scalar → python scalar (Arrow lists arrive as np arrays)."""
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.ndarray):
        return [_coerce_np(x) for x in v.tolist()]
    return v


def batch_from_docs(docs: list[dict], index: "CompiledIndex") -> DocBatch:
    """Build a DocBatch from Python dict documents (driver-side test path)."""
    n = len(docs)
    cols: dict[str, pd.Series] = {}
    for path in index.fields_needed:
        vals = []
        for d in docs:
            v = extract_path(d, path) if isinstance(d, dict) else _MISSING
            vals.append(None if v is _MISSING else v)
        cols[path] = pd.Series(vals, dtype=object)
    for gf in index.geo_fields:
        # geo fields are parsed per row from the raw value by DocBatch.geo
        if gf not in cols:
            vals = []
            for d in docs:
                v = extract_path(d, gf) if isinstance(d, dict) else _MISSING
                vals.append(None if v is _MISSING else v)
            cols[gf] = pd.Series(vals, dtype=object)
    return DocBatch(n=n, cols=cols, docs=pd.Series(docs, dtype=object))
