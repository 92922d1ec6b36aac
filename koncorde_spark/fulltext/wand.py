"""Block-max WAND top-k scorer (numpy, per shard).

Operates on decoded postings for the query's terms within one doc shard.
Segment-at-a-time block-max WAND: the doc-id axis is processed in segments
bounded by the current block boundaries of the live terms; a segment whose
summed block-max upper bound cannot beat the running top-k threshold is
skipped wholesale (cursors advance past it without decoding scores);
otherwise the segment's union of candidates is scored vectorized. This
keeps the WAND pruning property while doing all arithmetic on numpy
arrays instead of per-document Python.

Scores use frozen BM25 constants: idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
tf part = tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)); ties break by
ascending doc_id for rank determinism.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class TermPostings:
    """Decoded postings of one term within one shard."""

    doc_ids: np.ndarray  # int64, sorted ascending
    scores: np.ndarray  # float64 per-entry full score (idf * tf part)
    block_last: np.ndarray  # int64 last doc id per block
    block_ub: np.ndarray  # float64 idf * block max tf part
    block_size: int


def bm25_idf(n_docs: int, df: np.ndarray | float) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _merge_topk(
    best_ids: np.ndarray, best_scores: np.ndarray,
    cand_ids: np.ndarray, cand_scores: np.ndarray, k: int
):
    ids = np.concatenate([best_ids, cand_ids])
    scores = np.concatenate([best_scores, cand_scores])
    # rank: score desc, doc_id asc — lexsort keys in reverse priority order
    order = np.lexsort((ids, -scores))[:k]
    return ids[order], scores[order]


def check_after_cursor(after: tuple[float, int]) -> tuple[float, int]:
    """Validate a search_after cursor. The cursor is in SORT-KEY order
    (score, doc_id) — a swapped (doc_id, score) hit tuple would silently
    accept everything (every score < a 63-bit id), so reject magnitudes
    no BM25 sum can reach."""
    s, d = float(after[0]), int(after[1])
    if abs(s) > 1e12:
        raise ValueError(
            "search_after cursor is (score, doc_id) in sort-key order; "
            f"got score={after[0]!r} (a doc_id-sized value)"
        )
    return s, d


def _after_mask(
    ids: np.ndarray, scores: np.ndarray, after: tuple[float, int]
) -> np.ndarray:
    """Keep only candidates STRICTLY after the ``(score, doc_id)`` cursor
    in the engine's total order (score desc, doc_id asc) — the search_after
    acceptance rule. Score equality is exact float64: both pages compute
    the same decode arithmetic, so the page-1 boundary score is
    bit-reproducible on page 2."""
    s, d = after
    return (scores < s) | ((scores == s) & (ids > d))


def topk_block_max_wand(
    terms: list[TermPostings], k: int,
    after: tuple[float, int] | None = None,
    stats: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (doc_ids, scores) over the given term postings.

    ``after``: optional (score, doc_id) cursor — only docs strictly after
    it in (score desc, doc_id asc) order are accepted, which makes k
    results of this call exactly ranks ``cursor_rank+1 .. cursor_rank+k``
    of the unfiltered ranking (deep pagination without a deep heap). The
    cursor filter runs before heap insertion, so the block-max skip
    threshold is the kth best ACCEPTED score — still a valid lower bound
    for pruning, since rejected (before-cursor) docs can never enter the
    result.

    ``stats``: optional dict the kernel increments in place —
    ``entries_total`` (postings entries in play), ``entries_scored``
    (actually decoded into the accumulator), ``segments_scored`` and
    ``segments_skipped`` (block-max prune hits), ``exhaustive`` (1 when
    the small-union fallback ran). The WAND-pruning evidence a plan
    audit wants, measured rather than claimed."""
    terms = [t for t in terms if len(t.doc_ids)]
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    total = sum(len(t.doc_ids) for t in terms)
    if stats is not None:
        stats["entries_total"] = stats.get("entries_total", 0) + total
    if total <= 1 << 17:
        if stats is not None:
            stats["exhaustive"] = stats.get("exhaustive", 0) + 1
            stats["entries_scored"] = stats.get("entries_scored", 0) + total
        return _score_all(terms, k, after=after)

    best_ids = np.empty(0, dtype=np.int64)
    best_scores = np.empty(0, dtype=np.float64)
    ptr = [0] * len(terms)  # entry cursor per term
    nterms = len(terms)

    while True:
        live = [i for i in range(nterms) if ptr[i] < len(terms[i].doc_ids)]
        if not live:
            break
        # current segment ends at the smallest current-block end among
        # live terms; scoring slices start at each contributor's own ptr
        boundary = None
        ub = 0.0
        contributors = []
        for i in live:
            t = terms[i]
            blk = ptr[i] // t.block_size
            b_end = int(t.block_last[blk])
            if boundary is None or b_end < boundary:
                boundary = b_end
        for i in live:
            t = terms[i]
            if int(t.doc_ids[ptr[i]]) <= boundary:
                blk = ptr[i] // t.block_size
                ub += float(t.block_ub[blk])
                contributors.append(i)

        threshold = float(best_scores[k - 1]) if len(best_scores) >= k else -np.inf
        if ub <= threshold:
            # skip: advance every contributor past the boundary
            for i in contributors:
                t = terms[i]
                ptr[i] += int(
                    np.searchsorted(t.doc_ids[ptr[i] :], boundary, side="right")
                )
            if stats is not None:
                stats["segments_skipped"] = stats.get("segments_skipped", 0) + 1
            continue

        # score the segment [seg_start, boundary] vectorized
        seg_ids = []
        seg_scores = []
        for i in contributors:
            t = terms[i]
            lo = ptr[i]
            hi = lo + int(np.searchsorted(t.doc_ids[lo:], boundary, side="right"))
            seg_ids.append(t.doc_ids[lo:hi])
            seg_scores.append(t.scores[lo:hi])
            ptr[i] = hi
        ids = np.concatenate(seg_ids)
        scores = np.concatenate(seg_scores)
        if stats is not None:
            stats["segments_scored"] = stats.get("segments_scored", 0) + 1
            stats["entries_scored"] = stats.get("entries_scored", 0) + len(ids)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, scores)
        if after is not None:
            keep = _after_mask(uniq, acc, after)
            uniq, acc = uniq[keep], acc[keep]
        best_ids, best_scores = _merge_topk(best_ids, best_scores, uniq, acc, k)

    return best_ids, best_scores


def topk_conjunctive(
    by_term: dict[str, list[TermPostings]], k: int, require: int,
    after: tuple[float, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ALL-terms (AND-semantics) top-k within one shard: a doc qualifies
    only if it carries EVERY query term; qualifying docs score exactly as
    in the disjunctive path (sum of per-term scores), so a doc's score is
    mode-independent. ``require`` = number of query terms present in the
    GLOBAL vocabulary — a shard missing any of them (len(by_term) <
    require) can contain no qualifying doc and short-circuits to empty.

    Candidate generation is intersection-driven (smallest merged list
    first), so cost is bounded by the rarest term's postings — the
    standard conjunctive advantage over WAND's union frontier."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if require == 0 or len(by_term) < require:
        return empty
    merged: list[tuple[np.ndarray, np.ndarray]] = []
    for segs in by_term.values():
        ids = np.concatenate([s.doc_ids for s in segs])
        sc = np.concatenate([s.scores for s in segs])
        if len(segs) > 1:
            # segments are disjoint per (term, shard); a stable sort
            # restores one globally-sorted list per term
            order = np.argsort(ids, kind="stable")
            ids, sc = ids[order], sc[order]
        merged.append((ids, sc))
    merged.sort(key=lambda p: len(p[0]))
    cand = merged[0][0]
    for ids, _ in merged[1:]:
        if len(cand) == 0:
            return empty
        pos = np.searchsorted(ids, cand)
        cand = cand[ids[np.minimum(pos, len(ids) - 1)] == cand]
    if len(cand) == 0:
        return empty
    total = np.zeros(len(cand), dtype=np.float64)
    for ids, sc in merged:
        total += sc[np.searchsorted(ids, cand)]
    if after is not None:
        keep = _after_mask(cand, total, after)
        cand, total = cand[keep], total[keep]
    order = np.lexsort((cand, -total))[:k]
    return cand[order], total[order]


def _score_all(
    terms: list[TermPostings], k: int,
    after: tuple[float, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustive vectorized scoring (small unions — faster than skipping)."""
    ids = np.concatenate([t.doc_ids for t in terms])
    scores = np.concatenate([t.scores for t in terms])
    uniq, inv = np.unique(ids, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, scores)
    if after is not None:
        keep = _after_mask(uniq, acc, after)
        uniq, acc = uniq[keep], acc[keep]
    order = np.lexsort((uniq, -acc))[:k]
    return uniq[order], acc[order]


def score_union(terms: list[TermPostings]) -> tuple[np.ndarray, np.ndarray]:
    """EVERY (doc_id, score) in the union of the given postings — no top-k
    cut. The collapse/grouping collector needs the full matching set (the
    per-group best can rank arbitrarily deep globally), so this is the
    honest per-shard cost of field collapsing; downstream the rows shrink
    to one per group before any global ordering."""
    terms = [t for t in terms if len(t.doc_ids)]
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ids = np.concatenate([t.doc_ids for t in terms])
    scores = np.concatenate([t.scores for t in terms])
    uniq, inv = np.unique(ids, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, scores)
    return uniq, acc
