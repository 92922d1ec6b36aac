"""Spark-free low-latency BM25 serving over a built index.

The distributed job (indexer.py) builds the index; serving top-k queries
does not need a Spark job at all — a query touches only the posting rows
of its terms. LocalSearcher reads those rows straight from the postings
parquet with pyarrow (dataset filter on ``term`` → row-group pruning via
the term-sorted files) and scores them with the same block-max WAND
kernel the distributed path uses, so results are bit-identical to
``Bm25Index.topk`` by construction.

At cluster scale this is the "searcher" tier: each searcher process maps
a subset of shard directories; here one process serves all shards.
p50/p95 latencies are milliseconds (vs ~1s for a Spark job round-trip).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.dataset as ds

from .codecs import delta_decode, varint_decode
from .indexer import read_meta
from .tokenizer import tokenize_text
from .wand import (
    TermPostings,
    bm25_idf,
    check_after_cursor,
    topk_block_max_wand,
    topk_conjunctive,
)


def _levenshtein_capped(a: str, b: str, cap: int) -> int | None:
    """Edit distance if ≤ cap, else None (banded DP with row cutoff) —
    agrees with Spark's F.levenshtein / DuckDB's levenshtein() on every
    pair (fuzz-pinned in tests)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = i
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
            if cur[j] < best:
                best = cur[j]
        if best > cap:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= cap else None


def _local_tombstones(index_dir: str) -> "np.ndarray":
    path = os.path.join(index_dir, "tombstones")
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    tbl = ds.dataset(path, format="parquet").to_table()
    return np.unique(np.asarray(tbl["doc_id"].to_pylist(), dtype=np.int64))


class LocalSearcher:
    def __init__(self, index_dir: str):
        from .indexer import check_stats_consistency

        self.index_dir = index_dir
        self.meta = read_meta(index_dir)
        # refuse mixed statistics (crash between terms swap + meta write)
        check_stats_consistency(index_dir, self.meta)
        self._postings = ds.dataset(
            os.path.join(index_dir, "postings"), format="parquet", partitioning="hive"
        )
        # term → global df (small: one row per distinct term)
        tbl = ds.dataset(os.path.join(index_dir, "terms"), format="parquet").to_table()
        self._df = dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))
        # per-shard doc-length packs, decoded once
        self._tombstones = _local_tombstones(index_dir)
        # decoded term-segment cache: term → [(shard, ids, tfpart, blast,
        # ub_base)] with tombstones applied and block metadata rebuilt —
        # everything idf-INDEPENDENT, so a query multiplies by its own idf
        # (scores = idf·tfpart, bounds = idf·ub_base: exactly the uncached
        # arithmetic). Same decode-once discipline as self._dl and the job
        # tier's worker caches; bounded by _SEG_CACHE_MAX_TERMS. The cache
        # is PER-HANDLE state — a reopened searcher (the reader-reopen
        # contract after append/compact) starts empty.
        self._seg_cache: dict[str, list[tuple]] = {}
        pack = ds.dataset(os.path.join(index_dir, "dlpack"), format="parquet").to_table()
        self._dl: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for shard, n, ids_b, dls_b in zip(
            pack["shard"].to_pylist(),
            pack["n"].to_pylist(),
            pack["doc_ids"].to_pylist(),
            pack["dls"].to_pylist(),
        ):
            self._dl[int(shard)] = (
                delta_decode(bytes(ids_b), int(n)).astype(np.int64),
                varint_decode(bytes(dls_b), int(n)).astype(np.float64),
            )

    def _df_for(self, q_terms: list[str]) -> dict[str, int]:
        """term → global df for the present query terms — the same
        accessor contract as Bm25Index._df_for, so federation's
        combined_stats treats both tiers uniformly."""
        return {t: int(self._df[t]) for t in q_terms if t in self._df}

    def topk(
        self, query: str, k: int = 10, mode: str = "any",
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), ties broken by ascending doc_id —
        rank-identical to the distributed Bm25Index.topk path (both
        modes: the conjunctive path shares wand.topk_conjunctive).
        ``after``: (score, doc_id) search-after cursor, same contract as
        Bm25Index.topk — returns the next k ranks strictly after it."""
        if mode not in ("any", "all"):
            raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
        q_terms = sorted(set(tokenize_text(query)))
        idf = {t: float(bm25_idf(self.meta["n_docs"], self._df[t]))
               for t in q_terms if t in self._df}
        if not idf or (mode == "all" and len(idf) < len(q_terms)):
            return []
        return self._topk_with_idf(idf, k, mode, after)

    def profile_topk(
        self, query: str, k: int = 10
    ) -> tuple[list[tuple[int, float]], dict]:
        """topk plus the kernel's measured pruning counters (see
        wand.topk_block_max_wand ``stats``) — WAND-skip evidence for a
        query, per process rather than per claim."""
        q_terms = sorted(set(tokenize_text(query)))
        idf = {t: float(bm25_idf(self.meta["n_docs"], self._df[t]))
               for t in q_terms if t in self._df}
        if not idf:
            return [], {}
        stats: dict = {}
        hits = self._topk_with_idf(idf, k, stats=stats)
        return hits, stats

    # cache budget: decoded segments for this many DISTINCT terms AND at
    # most this many decoded posting entries across them (~24 B/entry:
    # int64 ids + float64 tfpart + block arrays) — a term cap alone would
    # let a few stopword-grade terms pin GBs. FIFO eviction that NEVER
    # evicts the terms of the query currently executing (evicting a warm
    # term mid-query would silently drop its postings from scoring).
    _SEG_CACHE_MAX_TERMS = 1024
    _SEG_CACHE_MAX_ENTRIES = 16_000_000  # ≈ 400 MB decoded

    def _ensure_segments(self, terms: list[str]) -> None:
        """Decode (once) the postings segments of any ``terms`` missing
        from the per-handle cache. Stored per segment: (shard, ids,
        tfpart, block_last, ub_base) — tombstones already applied, block
        metadata rebuilt where filtering changed entry positions, and the
        avgdl_seg bound correction folded into ub_base, so per-query
        arithmetic is exactly scores = idf·tfpart / bounds = idf·ub_base
        (bit-identical to the uncached path by associativity of the
        scalar factor)."""
        missing = [t for t in terms if t not in self._seg_cache]
        if not missing:
            return
        k1, b = self.meta["k1"], self.meta["b"]
        avgdl, bs = self.meta["avgdl"], self.meta["block_size"]
        cols = ["term", "shard", "df", "doc_ids", "tfs", "block_last", "block_max"]
        if "avgdl_seg" in self._postings.schema.names:
            cols.append("avgdl_seg")
        tbl = self._postings.to_table(
            filter=ds.field("term").isin(missing), columns=cols
        )
        for t in missing:
            self._seg_cache[t] = []  # absent-from-postings terms cache []
        tomb = self._tombstones
        for i in range(tbl.num_rows):
            term = tbl["term"][i].as_py()
            shard = int(tbl["shard"][i].as_py())
            n = int(tbl["df"][i].as_py())
            ids = delta_decode(bytes(tbl["doc_ids"][i].as_py()), n).astype(np.int64)
            tfs = varint_decode(bytes(tbl["tfs"][i].as_py()), n).astype(np.float64)
            dl_ids, dl_vals = self._dl[shard]
            dls = dl_vals[np.searchsorted(dl_ids, ids)]
            tfpart = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
            # same avgdl-shift bound correction as the Spark path (keeps
            # the two tiers bit-identical across appends)
            seg = tbl["avgdl_seg"][i].as_py() if "avgdl_seg" in tbl.column_names else None
            bscale = max(1.0, avgdl / float(seg)) if seg else 1.0
            if len(tomb):
                pos = np.searchsorted(tomb, ids)
                keep = tomb[np.minimum(pos, len(tomb) - 1)] != ids
                if not keep.all():
                    ids, tfpart = ids[keep], tfpart[keep]
                    if len(ids) == 0:
                        continue
                    # rebuild position-addressed block metadata (exact)
                    nb = (len(ids) + bs - 1) // bs
                    starts = np.arange(nb) * bs
                    self._seg_cache[term].append(
                        (
                            shard, ids, tfpart,
                            ids[np.minimum(starts + bs - 1, len(ids) - 1)],
                            np.maximum.reduceat(tfpart, starts),
                            None,
                        )
                    )
                    continue
            self._seg_cache[term].append(
                (
                    shard, ids, tfpart,
                    np.asarray(tbl["block_last"][i].as_py(), dtype=np.int64),
                    np.asarray(tbl["block_max"][i].as_py()),
                    bscale,
                )
            )
        protected = set(terms)

        def total_entries():
            return sum(
                len(seg[1]) for segs in self._seg_cache.values() for seg in segs
            )

        if (
            len(self._seg_cache) > self._SEG_CACHE_MAX_TERMS
            or total_entries() > self._SEG_CACHE_MAX_ENTRIES
        ):
            evictable = [t for t in self._seg_cache if t not in protected]
            for t in evictable:
                if (
                    len(self._seg_cache) <= self._SEG_CACHE_MAX_TERMS
                    and total_entries() <= self._SEG_CACHE_MAX_ENTRIES
                ):
                    break
                self._seg_cache.pop(t)

    def _topk_with_idf(
        self,
        idf: dict[str, float],
        k: int,
        mode: str = "any",
        after: tuple[float, int] | None = None,
        stats: dict | None = None,
    ) -> list[tuple[int, float]]:
        """topk with an INJECTED idf map (federation passes combined-corpus
        idf; this member's own avgdl normalizes length — same contract as
        Bm25Index._shard_topk_frame). Conjunctive ``require`` is the full
        injected vocabulary size, so a member missing a term contributes
        nothing in mode='all'."""
        bs = self.meta["block_size"]
        self._ensure_segments(list(idf))
        by_shard: dict[int, dict[str, list[TermPostings]]] = {}
        # canonical term order — same rule as _decode_shard_postings: the
        # per-doc float64 sum must accumulate terms in a job-independent
        # order for cross-tier and cross-page bit-parity (segment order
        # within a term is per-doc irrelevant: segments are doc-disjoint)
        for term in sorted(idf):
            for shard, ids, tfpart, blast, ub_arr, bscale in self._seg_cache.get(term, ()):
                # bscale None = tombstone-rebuilt bounds (reduceat of
                # tfpart): idf·max(x) == max(idf·x) exactly (monotone
                # scalar multiply). bscale set = stored block_max: keep
                # the original fl(idf·bscale)·bm rounding order so bounds
                # are bit-identical to the uncached path.
                ub = (
                    idf[term] * ub_arr
                    if bscale is None
                    else (idf[term] * bscale) * ub_arr
                )
                by_shard.setdefault(shard, {}).setdefault(term, []).append(
                    TermPostings(
                        doc_ids=ids,
                        scores=idf[term] * tfpart,
                        block_last=blast,
                        block_ub=ub,
                        block_size=bs,
                    )
                )

        after_ = check_after_cursor(after) if after is not None else None
        cand_ids: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        for shard, by_term in by_shard.items():
            if mode == "all":
                ids, scores = topk_conjunctive(
                    by_term, k, require=len(idf), after=after_
                )
            else:
                tps = [tp for segs in by_term.values() for tp in segs]
                ids, scores = topk_block_max_wand(
                    tps, k, after=after_, stats=stats
                )
            cand_ids.append(ids)
            cand_scores.append(scores)
        if not cand_ids:
            # every matching entry may be tombstoned (terms keeps its df
            # until compaction) — by_shard ends empty, not just short
            return []
        ids = np.concatenate(cand_ids)
        scores = np.concatenate(cand_scores)
        order = np.lexsort((ids, -scores))[:k]
        return [(int(i), float(s)) for i, s in zip(ids[order], scores[order])]

    def _scored_union_by_shard(self, toks: list[str]):
        """Per-shard (TermOccurrences list, idf list) for the present
        query terms — the brute multiterm decode the multi-field path
        feeds to the shared kernel (highlight.multiterm_scores)."""
        from .phrase import TermOccurrences as _TO

        present = [t for t in toks if t in self._df]
        if not present:
            return {}
        idf = {t: float(bm25_idf(self.meta["n_docs"], self._df[t]))
               for t in present}
        tbl = self._postings.to_table(
            filter=ds.field("term").isin(present),
            columns=["term", "shard", "df", "doc_ids", "tfs"],
        )
        by_shard: dict[int, tuple[list, list]] = {}
        _no_pos = np.empty(0, dtype=np.int64)
        for i in range(tbl.num_rows):
            shard = int(tbl["shard"][i].as_py())
            n = int(tbl["df"][i].as_py())
            ids = delta_decode(bytes(tbl["doc_ids"][i].as_py()), n).astype(np.int64)
            tfs = varint_decode(bytes(tbl["tfs"][i].as_py()), n).astype(np.int64)
            occ_off = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
            acc = by_shard.setdefault(shard, ([], []))
            acc[0].append(_TO(ids, occ_off, _no_pos))
            acc[1].append(idf[tbl["term"][i].as_py()])
        return by_shard

    def highlight(
        self, query: str, k: int = 10, window: int = 30
    ) -> list[tuple[int, float, int, int]]:
        """Top-k with snippets over a positional index — rank- and
        window-identical to Bm25Index.topk_highlight by the shared
        kernel (highlight.py). Returns (doc_id, score, snip_start,
        snip_hits) tuples."""
        if not self.meta.get("positions"):
            raise RuntimeError(
                "highlighting requires a positional index — build with "
                "IndexConfig(positions=True)"
            )
        from .highlight import highlight_topk_shard
        from .phrase import decode_entry_positions, merge_term_segments

        toks = sorted(set(tokenize_text(query)))
        present = [t for t in toks if t in self._df]
        if not present:
            return []
        idf = {t: float(bm25_idf(self.meta["n_docs"], self._df[t])) for t in present}
        k1, b, avgdl = self.meta["k1"], self.meta["b"], self.meta["avgdl"]

        tbl = self._postings.to_table(
            filter=ds.field("term").isin(present),
            columns=["term", "shard", "df", "doc_ids", "tfs", "pos"],
        )
        by_shard: dict[int, dict[str, list]] = {}
        for i in range(tbl.num_rows):
            shard = int(tbl["shard"][i].as_py())
            by_shard.setdefault(shard, {}).setdefault(
                tbl["term"][i].as_py(), []
            ).append(
                decode_entry_positions(
                    bytes(tbl["doc_ids"][i].as_py()),
                    bytes(tbl["tfs"][i].as_py()),
                    bytes(tbl["pos"][i].as_py()),
                    int(tbl["df"][i].as_py()),
                )
            )
        rows: list[tuple[int, float, int, int]] = []
        for shard, by_term in by_shard.items():
            here = sorted(by_term)
            per_term = [merge_term_segments(by_term[t]) for t in here]
            dl_ids, dl_vals = self._dl[shard]
            ids, scores, starts, hits = highlight_topk_shard(
                per_term, [idf[t] for t in here], k1, b, avgdl,
                dl_ids, dl_vals, k, window, self._tombstones,
            )
            rows.extend(
                (int(i), float(s), int(st), int(h))
                for i, s, st, h in zip(ids, scores, starts, hits)
            )
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def count(self, query: str, mode: str = "any") -> int:
        """totalHits twin of Bm25Index.count (same set semantics)."""
        if mode not in ("any", "all"):
            raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
        toks = sorted(set(tokenize_text(query)))
        present = [t for t in toks if t in self._df]
        if not present or (mode == "all" and len(present) < len(toks)):
            return 0
        tbl = self._postings.to_table(
            filter=ds.field("term").isin(present),
            columns=["term", "shard", "df", "doc_ids"],
        )
        by_shard: dict[int, dict[str, list[np.ndarray]]] = {}
        for i in range(tbl.num_rows):
            by_shard.setdefault(int(tbl["shard"][i].as_py()), {}).setdefault(
                tbl["term"][i].as_py(), []
            ).append(
                delta_decode(
                    bytes(tbl["doc_ids"][i].as_py()), int(tbl["df"][i].as_py())
                ).astype(np.int64)
            )
        total = 0
        for by_term in by_shard.values():
            sets = [
                np.sort(np.concatenate(v)) if len(v) > 1 else v[0]
                for v in by_term.values()
            ]
            if mode == "all":
                if len(by_term) < len(present):
                    continue
                sets.sort(key=len)
                cand = sets[0]
                for ids in sets[1:]:
                    if len(cand) == 0:
                        break
                    at = np.searchsorted(ids, cand)
                    cand = cand[ids[np.minimum(at, len(ids) - 1)] == cand]
            else:
                cand = np.unique(np.concatenate(sets))
            tomb = self._tombstones
            if len(tomb) and len(cand):
                at = np.searchsorted(tomb, cand)
                cand = cand[tomb[np.minimum(at, len(tomb) - 1)] != cand]
            total += len(cand)
        return total

    def topk_boolean(
        self,
        must: list[str] | None = None,
        should: list[str] | None = None,
        must_not: list[str] | None = None,
        boosts: dict[str, float] | None = None,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """Structured boolean top-k — rank-identical to
        Bm25Index.topk_boolean by the shared kernel
        (highlight.boolean_topk_shard)."""
        from .highlight import boolean_topk_shard
        from .phrase import TermOccurrences as _TO

        must_t = sorted({t for s in (must or []) for t in tokenize_text(s)})
        should_t = sorted({t for s in (should or []) for t in tokenize_text(s)})
        not_t = sorted({t for s in (must_not or []) for t in tokenize_text(s)})
        score_t = sorted(set(must_t) | set(should_t))
        if not score_t:
            return []
        if any(t not in self._df for t in must_t):
            return []
        score_present = [t for t in score_t if t in self._df]
        if not score_present:
            return []
        n_docs = self.meta["n_docs"]
        k1, b, avgdl = self.meta["k1"], self.meta["b"], self.meta["avgdl"]
        boosts_ = {t: float((boosts or {}).get(t, 1.0)) for t in score_present}
        idf = {
            t: boosts_[t] * float(bm25_idf(n_docs, self._df[t]))
            for t in score_present
        }
        scan = sorted(set(score_present) | {t for t in not_t if t in self._df})

        tbl = self._postings.to_table(
            filter=ds.field("term").isin(scan),
            columns=["term", "shard", "df", "doc_ids", "tfs"],
        )
        by_shard: dict[int, dict[str, list]] = {}
        for i in range(tbl.num_rows):
            shard = int(tbl["shard"][i].as_py())
            n = int(tbl["df"][i].as_py())
            ids = delta_decode(bytes(tbl["doc_ids"][i].as_py()), n).astype(np.int64)
            tfs = varint_decode(bytes(tbl["tfs"][i].as_py()), n).astype(np.int64)
            occ_off = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
            by_shard.setdefault(shard, {}).setdefault(
                tbl["term"][i].as_py(), []
            ).append(_TO(ids, occ_off, np.empty(0, dtype=np.int64)))

        rows: list[tuple[int, float]] = []
        for shard, by_term in by_shard.items():
            if any(t not in by_term for t in must_t):
                continue
            score_terms, score_idfs = [], []
            for t in score_present:
                for seg in by_term.get(t, []):
                    score_terms.append(seg)
                    score_idfs.append(idf[t])
            dl_ids, dl_vals = self._dl[shard]
            ids, scores = boolean_topk_shard(
                [by_term[t] for t in must_t],
                score_terms, score_idfs,
                [seg for t in not_t for seg in by_term.get(t, [])],
                k1, b, avgdl, dl_ids, dl_vals, k, self._tombstones,
            )
            rows.extend((int(i), float(s)) for i, s in zip(ids, scores))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def expand_fuzzy(
        self, term: str, max_distance: int = 1, max_expansions: int = 50
    ) -> list[str]:
        """Vocabulary terms within ``max_distance`` edits, (distance ASC,
        df DESC, term ASC) capped — same contract as
        Bm25Index.expand_fuzzy (in-memory scan with a length pre-filter
        and a row-cutoff Levenshtein DP)."""
        hits = []
        n = len(term)
        for t, df in self._df.items():
            if abs(len(t) - n) > max_distance:
                continue
            d = _levenshtein_capped(term, t, max_distance)
            if d is not None:
                hits.append((d, -df, t))
        hits.sort()
        return [t for _, _, t in hits[:max_expansions]]

    def topk_fuzzy(
        self,
        query: str,
        k: int = 10,
        max_distance: int = 1,
        max_expansions: int = 50,
        mode: str = "any",
    ) -> list[tuple[int, float]]:
        """Fuzzy top-k, rank-identical to Bm25Index.topk_fuzzy (same
        expansion contract, then the shared topk path)."""
        from .query import parse_expansion_query

        terms = parse_expansion_query(
            query, "~", "fuzzy term",
            lambda b_: self.expand_fuzzy(b_, max_distance, max_expansions),
        )
        if not terms:
            return []
        return self.topk(" ".join(terms), k, mode=mode)

    def expand_prefix(self, prefix: str, max_expansions: int = 50) -> list[str]:
        """Vocabulary terms starting with ``prefix``, (df DESC, term ASC)
        capped — the same deterministic contract as Bm25Index.expand_prefix
        (here an in-memory scan of the already-loaded term dict)."""
        hits = [(t, df) for t, df in self._df.items() if t.startswith(prefix)]
        hits.sort(key=lambda x: (-x[1], x[0]))
        return [t for t, _ in hits[:max_expansions]]

    def suggest(
        self, term: str, max_distance: int = 2, k: int = 5
    ) -> list[tuple[str, int, int]]:
        """Did-you-mean suggester: (suggestion, df, distance) tuples
        within ``max_distance`` edits, ranked (distance ASC, df DESC,
        term ASC), top k — row-identical to Bm25Index.suggest."""
        from .tokenizer import tokenize_text

        toks = tokenize_text(term)
        if len(toks) != 1:
            raise ValueError(f"suggest() takes one indexable token, got {term!r}")
        t0 = toks[0]
        n = len(t0)
        hits = []
        for t, df in self._df.items():
            if abs(len(t) - n) > max_distance:
                continue
            d = _levenshtein_capped(t0, t, max_distance)
            if d is not None:
                hits.append((d, -df, t))
        hits.sort()
        return [(t, -ndf, d) for d, ndf, t in hits[:k]]

    def topk_prefix(
        self, query: str, k: int = 10, max_expansions: int = 50, mode: str = "any"
    ) -> list[tuple[int, float]]:
        """Wildcard-prefix top-k, rank-identical to Bm25Index.topk_prefix
        (same expansion contract, then the shared topk path)."""
        from .query import parse_expansion_query

        terms = parse_expansion_query(
            query, "*", "prefix",
            lambda b_: self.expand_prefix(b_, max_expansions),
        )
        if not terms:
            return []
        return self.topk(" ".join(terms), k, mode=mode)

    def phrase(
        self, phrase: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        """Exact-phrase (or, with ``slop > 0``, greedy-chain proximity)
        top-k over a positional index — rank-identical to
        Bm25Index.topk_phrase by the shared kernel (phrase.py)."""
        if not self.meta.get("positions"):
            raise RuntimeError(
                "phrase search requires a positional index — build with "
                "IndexConfig(positions=True)"
            )
        from .phrase import (
            decode_entry_positions,
            merge_term_segments,
            phrase_topk_shard,
        )

        toks = tokenize_text(phrase)
        if not toks:
            return []
        uniq = sorted(set(toks))
        if any(t not in self._df for t in uniq):
            return []
        idf_sum = float(
            sum(bm25_idf(self.meta["n_docs"], self._df[t]) for t in toks)
        )
        k1, b, avgdl = self.meta["k1"], self.meta["b"], self.meta["avgdl"]

        tbl = self._postings.to_table(
            filter=ds.field("term").isin(uniq),
            columns=["term", "shard", "df", "doc_ids", "tfs", "pos"],
        )
        by_shard: dict[int, dict[str, list]] = {}
        for i in range(tbl.num_rows):
            shard = int(tbl["shard"][i].as_py())
            by_shard.setdefault(shard, {}).setdefault(
                tbl["term"][i].as_py(), []
            ).append(
                decode_entry_positions(
                    bytes(tbl["doc_ids"][i].as_py()),
                    bytes(tbl["tfs"][i].as_py()),
                    bytes(tbl["pos"][i].as_py()),
                    int(tbl["df"][i].as_py()),
                )
            )

        cand_ids: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        for shard, by_term in by_shard.items():
            if len(by_term) < len(uniq):
                continue
            merged = {t: merge_term_segments(v) for t, v in by_term.items()}
            dl_ids, dl_vals = self._dl[shard]
            ids, scores = phrase_topk_shard(
                [merged[t] for t in toks], idf_sum, k1, b, avgdl,
                dl_ids, dl_vals, k, self._tombstones, slop=slop,
            )
            cand_ids.append(ids)
            cand_scores.append(scores)
        if not cand_ids:
            return []
        ids = np.concatenate(cand_ids)
        scores = np.concatenate(cand_scores)
        order = np.lexsort((ids, -scores))[:k]
        return [(int(i), float(s)) for i, s in zip(ids[order], scores[order])]


class LocalMultiFieldSearcher:
    """Spark-free twin of multifield.MultiFieldSearch.

    Same invariants (shared n_shards → doc→shard co-location across field
    indexes; one (k1, b) family), same shared kernel
    (highlight.multiterm_scores) scoring each field with its OWN
    statistics, weight-scaled and summed per doc within a shard — so
    ranks and scores are identical to the distributed path by
    construction (pinned in tests/test_serve.py)."""

    def __init__(
        self,
        index_dirs: dict[str, str],
        weights: dict[str, float] | None = None,
    ):
        if not index_dirs:
            raise ValueError("at least one field index is required")
        self.searchers = {
            f: LocalSearcher(d) for f, d in sorted(index_dirs.items())
        }
        self.weights = {
            f: float((weights or {}).get(f, 1.0)) for f in self.searchers
        }
        shards = {s.meta["n_shards"] for s in self.searchers.values()}
        if len(shards) != 1:
            raise ValueError(
                f"field indexes disagree on n_shards ({sorted(shards)}) — "
                "doc→shard co-location requires one shared value"
            )
        kb = {(s.meta["k1"], s.meta["b"]) for s in self.searchers.values()}
        if len(kb) != 1:
            raise ValueError(f"field indexes disagree on (k1, b): {sorted(kb)}")
        (self.k1, self.b), = kb

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        from .highlight import multiterm_scores

        toks = sorted(set(tokenize_text(query)))
        if not toks:
            return []
        acc: dict[int, tuple[list, list]] = {}
        for f, s in self.searchers.items():
            w = self.weights[f]
            avgdl = float(s.meta["avgdl"])
            for shard, (per_term, idfs) in s._scored_union_by_shard(toks).items():
                dl_ids, dl_vals = s._dl[shard]
                cand, sc = multiterm_scores(
                    per_term, idfs, self.k1, self.b, avgdl,
                    dl_ids, dl_vals, s._tombstones,
                )
                if len(cand):
                    parts = acc.setdefault(shard, ([], []))
                    parts[0].append(cand)
                    parts[1].append(w * sc)
        rows: list[tuple[int, float]] = []
        for shard, (idp, scp) in acc.items():
            all_ids = np.concatenate(idp)
            all_sc = np.concatenate(scp)
            uids, inv = np.unique(all_ids, return_inverse=True)
            tot = np.bincount(inv, weights=all_sc)
            order = np.lexsort((uids, -tot))[:k]
            rows.extend(
                (int(i), float(v)) for i, v in zip(uids[order], tot[order])
            )
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]
