"""Byte-pair-encoding vocabulary training + encoding.

The standard scalable shape (Sennrich et al. 2016 as productionized):
the CORPUS-side work is one hash-agg — distinct word → frequency — and
the iterative merge loop runs over that compact statistic on the driver
(vocabulary size, not corpus size; a 100 TB corpus of code still has a
word table in the millions). Encoding is distributed again: merges
broadcast by closure, applied per UNIQUE word per batch (words repeat
heavily, so each batch pays per-distinct-word, not per-token).

Determinism: merge selection breaks frequency ties by lexicographically
smallest pair, so the same corpus always trains the same vocabulary —
required for reproducible token budgets.

Not SQL-expressible (iterative, data-dependent control flow): pinned by
pytest against the classic hand-worked example and structural
invariants instead of a DuckDB oracle row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

END = "</w>"

# word tables beyond this are a mis-use of the compact-statistic pattern
# (train on a sampled corpus instead) — fail loudly, never spill the
# driver
MAX_WORD_TABLE = 5_000_000


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> dict[str, int]:
    """Distinct word → corpus frequency (canonical tokenizer), collected
    driver-side after ONE distributed hash-agg."""
    counts = (
        df.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .persist()  # the guard count and the toPandas share one corpus scan
    )
    try:
        n_words = counts.count()
        if n_words > MAX_WORD_TABLE:
            raise ValueError(
                f"word table has {n_words} entries (> {MAX_WORD_TABLE}); train "
                "BPE on a sampled corpus — the merge loop needs the compact "
                "word-frequency statistic, not the corpus"
            )
        pdf = counts.toPandas()
    finally:
        counts.unpersist()
    return dict(zip(pdf["w"].tolist(), pdf["n"].astype(int).tolist()))


def bpe_train_from_frequencies(
    word_freq: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a word-frequency table: every word is
    a symbol sequence (chars + end-of-word marker); each round merges the
    globally most frequent adjacent symbol pair (ties → lexicographically
    smallest pair). Stops early when no pair repeats."""
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [END], n) for w, n in sorted(word_freq.items())
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in seqs:
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merged = a + b
        for sym, _n in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [merged]
                else:
                    i += 1
        merges.append((a, b))
    return merges


def bpe_train(
    df: DataFrame, n_merges: int = 1000, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Distributed word counts + driver-side merge loop."""
    return bpe_train_from_frequencies(word_frequencies(df, text_col), n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by ascending merge rank (the greedy
    lowest-rank-first rule every BPE tokenizer uses)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE statistics: (id, n_words, n_bpe_tokens,
    bpe_tokens) with ``bpe_tokens`` the full symbol stream. One narrow
    mapInPandas pass; each batch encodes each DISTINCT word once and
    reuses the result across repeats (code/text is Zipfian, so the
    per-batch cache hits constantly)."""
    import pandas as pd
    from pyspark.sql import types as T

    ranks = {p: i for i, p in enumerate(merges)}
    id_field = df.schema[id_col]
    schema = T.StructType(
        [
            id_field,
            T.StructField("n_words", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
        ]
    )
    toks = df.select(F.col(id_col), tokens_col(text_col).alias("__t"))

    def encode(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out_rows = []
            for did, words in zip(pdf[id_col], pdf["__t"]):
                stream: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    stream.extend(enc)
                out_rows.append((did, len(words), len(stream), stream))
            yield pd.DataFrame(
                out_rows,
                columns=[id_col, "n_words", "n_bpe_tokens", "bpe_tokens"],
            )

    return toks.mapInPandas(encode, schema=schema)
