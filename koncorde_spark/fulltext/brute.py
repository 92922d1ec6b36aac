"""Pure-Catalyst BM25 (no index): tokenize/explode/agg entirely JVM-side.

Used as (a) a driver-gate cross-check of the tokenizer + score formula
against DuckDB, and (b) the no-index baseline the posting-list engine must
beat. The plan is scan → explode → two hash aggregations → broadcast join
→ sort-limit; fine at small scale, O(total tokens) at large scale — which
is exactly why the indexed path exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..rounding import round_away


def _qt_tokenize_fn(text_col: str, id_col: str, query_terms: list[str]):
    """mapInPandas kernel producing (id, dl, __qt): Arrow-re2 tokenize of
    the batch with __qt pruned to the query terms.

    Semantics are EXACTLY the Catalyst form it replaces
    (``size(tokens_col)`` + ``filter(tokens_col, in qset)``): dl counts
    ALL canonical tokens, __qt keeps only query-term occurrences in
    document order, and a NULL text yields NULL dl / NULL __qt (the
    Catalyst expressions propagate NULL; the DuckDB twin's lower(NULL)
    does too). java.util.regex split was the dominant cost of the brute
    path (~100x Arrow re2 on code text — CLAUDE.md); the downstream
    stats/explode/agg plan is unchanged."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from .tokenizer import flat_tokens_arrow, count_tokens_arrow

    qset = pa.array(sorted(set(query_terms)), type=pa.string())

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            texts = pdf[text_col]
            nulls = texts.isna().to_numpy()
            dl = count_tokens_arrow(texts)
            flat, parents = flat_tokens_arrow(texts)
            # '' boundary tokens are never query terms, so is_in prunes
            # them together with every non-query token in one pass
            kept = pc.is_in(flat, value_set=qset).to_numpy(zero_copy_only=False)
            kept_idx = np.nonzero(kept)[0]
            kept_toks = flat.take(pa.array(kept_idx)).to_pylist()
            # parents are row-major nondecreasing → per-row slices
            counts = np.bincount(parents[kept_idx], minlength=n)
            offs = np.concatenate(([0], np.cumsum(counts)))
            qt = [
                None if nulls[i] else kept_toks[offs[i]: offs[i + 1]]
                for i in range(n)
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "dl": pd.array(
                        [None if nulls[i] else int(dl[i]) for i in range(n)],
                        dtype="Int64",
                    ),
                    "__qt": qt,
                }
            )

    return run


def bm25_brute_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 6,
    materialize: bool = True,
    exclude_ids: list | None = None,
) -> DataFrame:
    """``exclude_ids``: ids dropped from the CANDIDATE set only — corpus
    statistics (n, avgdl, df) still include them, matching a Lucene index
    that contains the excluded doc (the more-like-this contract)."""
    qt_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("dl", T.LongType()),
            T.StructField("__qt", T.ArrayType(T.StringType())),
        ]
    )
    # prune to query terms BEFORE exploding: the explode then carries
    # only matching tokens instead of the full token stream
    d = df.select(id_col, text_col).mapInPandas(
        _qt_tokenize_fn(text_col, id_col, query_terms), schema=qt_schema
    )
    if materialize:
        # one tokenize pass feeds both the stats agg and the tf agg; with
        # materialize=False (plan inspection) we skip the cache entirely —
        # persisting and returning lazily would pin the tokenized corpus
        # in executor storage with no handle to ever unpersist it
        d = d.persist()
    try:
        stats = d.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
        n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])

        tf = (
            d.where(F.size("__qt") > 0)
            .select(id_col, "dl", F.explode("__qt").alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        )
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        score = (
            F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
        )
        scored = (
            tf.join(F.broadcast(dfreq), "term")
            .withColumn("__s", score)
            .groupBy(id_col)
            .agg(F.sum("__s").alias("score"))
        )
        if round_to is not None:
            scored = scored.withColumn("score", round_away(F.col("score"), round_to))
        if exclude_ids:
            scored = scored.where(~F.col(id_col).isin(exclude_ids))
        out = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
        if materialize:
            out = out.localCheckpoint()  # materialize while d is cached
        return out
    finally:
        if materialize:
            d.unpersist()


def bm25_brute_sql(
    table: str,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    tie_sql: str | None = None,
    filter_where: str | None = None,
    conjunctive: bool = False,
    offset: int = 0,
) -> str:
    """DuckDB twin of :func:`bm25_brute_topk` (identical tokens + formula).

    ``tie_sql``: optional expression over the source ``table`` columns used
    to break score ties in the top-k cut instead of ``id_col`` — the
    indexed path cuts at k ordered by its INTERNAL sha-derived doc id, so
    its oracle must reproduce that exact tie-break or a tie group
    straddling rank k picks different doc sets per engine.

    ``filter_where``: optional predicate over the source ``table`` columns
    restricting which docs are ELIGIBLE for the top-k (the oracle twin of
    Bm25Index.topk_filtered). Matching that contract, corpus statistics
    (n, avgdl, df) are computed over the FULL table — the predicate only
    gates the final candidate set.

    ``conjunctive``: AND-semantics (the oracle twin of topk(mode="all")) —
    only docs containing EVERY query term qualify; scores are unchanged
    (the tf CTE has one row per (doc, present term), so a count equal to
    the number of distinct query terms is exactly the all-terms test).

    ``offset``: skip the first N ranks of the SAME total order — the twin
    of topk(after=<last row of rank N>): a search_after cursor taken from
    the previous page's last row selects exactly ranks N+1..N+k."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    tie = "__tie" if tie_sql else id_col
    tie_proj = f", {tie_sql} AS __tie" if tie_sql else ""
    tie_carry = ", __tie" if tie_sql else ""
    tie_group = ", d3.__tie" if tie_sql else ""
    elig_cte = (
        f"elig AS (SELECT {id_col} FROM {table} WHERE {filter_where}),\n    "
        if filter_where
        else ""
    )
    elig_join = f" JOIN elig USING({id_col})" if filter_where else ""
    # the indexed path cuts by RAW score (WAND heap) before rounding, so
    # its oracle orders by the source column (qualified name bypasses the
    # rounded output alias); the Spark brute path orders by the rounded
    # score, so its oracle keeps the alias.
    order_score = "scored.score" if tie_sql else "score"
    n_distinct_terms = len(set(query_terms))
    having = (
        f"\n      HAVING count(*) = {n_distinct_terms}" if conjunctive else ""
    )
    return f"""
    WITH d2 AS (
      SELECT {id_col}{tie_proj},
             list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),
                         t -> t <> '') AS toks
      FROM {table}
    ), d3 AS (SELECT {id_col}{tie_carry}, toks, len(toks) AS dl FROM d2),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3),
    tf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3)
      WHERE term IN ({terms})
      GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    {elig_cte}scored AS (
      SELECT tf.{id_col}{tie_group},
             sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * d3.dl / stats.avgdl))) AS score
      FROM tf JOIN dfreq USING(term) JOIN d3 USING({id_col}){elig_join} CROSS JOIN stats
      GROUP BY tf.{id_col}{tie_group}{having}
    )
    SELECT {id_col}, round(score, 6)::DOUBLE AS score
    FROM scored
    ORDER BY {order_score} DESC, {tie} ASC
    LIMIT {k}{f" OFFSET {offset}" if offset else ""}
    """


def bm25_phrase_sql(
    table: str,
    phrase_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    tie_sql: str | None = None,
    slop: int = 0,
) -> str:
    """DuckDB twin of Bm25Index.topk_phrase / LocalSearcher.phrase.

    ``phrase_terms`` is the ORDERED token sequence (repeats allowed).
    With ``slop=0`` phrase occurrences are exact consecutive offsets in
    the canonical token stream, counted with a list lambda over 1-based
    DuckDB list indexing. With ``slop>0`` the occurrences follow the
    kernel's ordered greedy-chain proximity rule: from each position of
    the first token, each later token resolves to its smallest
    strictly-greater position (nested list_min/list_filter lambdas —
    the literal transcription of phrase.proximity_freqs), and the start
    counts iff the final span minus (m-1) is within slop. idf is the
    sum of member-term idfs with repeated tokens contributing once per
    repetition (the qmult VALUES list), matching the phrase.py kernel's
    classic phrase-query scoring."""
    from collections import Counter

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    m = len(phrase_terms)
    uniq = sorted(set(phrase_terms))
    terms = ", ".join(q(t) for t in uniq)
    mults = ", ".join(
        f"({q(t)}, {c})" for t, c in sorted(Counter(phrase_terms).items())
    )
    if slop > 0:
        poscol = {t: f"p{u}" for u, t in enumerate(uniq)}
        pos_proj = "".join(
            f",\n             list_filter(range(1, len(toks) + 1), "
            f"i -> toks[i] = {q(t)}) AS {poscol[t]}"
            for t in uniq
        )
        pos_carry = "".join(f", {poscol[t]}" for t in uniq)
        chain = "s0"
        for j, t in enumerate(phrase_terms[1:], start=1):
            chain = (
                f"list_min(list_filter({poscol[t]}, v{j} -> v{j} > {chain}))"
            )
        ptf_expr = (
            f"len(list_filter({poscol[phrase_terms[0]]}, s0 -> "
            f"{chain} IS NOT NULL AND {chain} - s0 <= {m - 1 + slop}))"
        )
    else:
        pos_proj = pos_carry = ""
        adj = " AND ".join(
            f"toks[i + {j}] = {q(t)}" for j, t in enumerate(phrase_terms)
        )
        ptf_expr = f"len(list_filter(range(1, len(toks) - {m} + 2), i -> {adj}))"
    tie = "__tie" if tie_sql else id_col
    tie_proj = f", {tie_sql} AS __tie" if tie_sql else ""
    tie_carry = ", __tie" if tie_sql else ""
    order_score = "scored.score" if tie_sql else "score"
    return f"""
    WITH d2 AS (
      SELECT {id_col}{tie_proj},
             list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),
                         t -> t <> '') AS toks
      FROM {table}
    ), d3 AS (SELECT {id_col}{tie_carry}, toks{pos_carry}, len(toks) AS dl
              FROM (SELECT {id_col}{tie_carry}, toks{pos_proj} FROM d2)),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3),
    tf AS (
      SELECT {id_col}, term
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3)
      WHERE term IN ({terms})
      GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    qmult(term, mult) AS (VALUES {mults}),
    idfsum AS (
      SELECT sum(qmult.mult * ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))) AS idf
      FROM qmult JOIN dfreq USING(term) CROSS JOIN stats
    ),
    ph AS (
      SELECT {id_col}{tie_carry}, dl, {ptf_expr} AS ptf
      FROM d3
    ),
    scored AS (
      SELECT {id_col}{tie_carry},
             idfsum.idf * ptf * ({k1} + 1.0)
               / (ptf + {k1} * (1.0 - {b} + {b} * ph.dl / stats.avgdl)) AS score
      FROM ph CROSS JOIN idfsum CROSS JOIN stats
      WHERE ptf > 0
    )
    SELECT {id_col}, round(score, 6)::DOUBLE AS score
    FROM scored
    ORDER BY {order_score} DESC, {tie} ASC
    LIMIT {k}
    """


def bm25_prefix_sql(
    table: str,
    literal_terms: list[str],
    prefixes: list[str],
    k: int = 10,
    max_expansions: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    tie_sql: str | None = None,
) -> str:
    """DuckDB twin of Bm25Index.topk_prefix / LocalSearcher.topk_prefix.

    Each prefix expands to its ``max_expansions`` highest-df corpus terms
    (ties by ascending term — the exact contract of expand_prefix, with
    df derived from the same corpus the index indexed), the union of
    literals + expansions dedups, and scoring is the standard brute BM25
    over that term set."""

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    lit_pred = (
        "term IN (" + ", ".join(q(t) for t in literal_terms) + ")"
        if literal_terms
        else "FALSE"
    )
    # LIKE-escape: the canonical token alphabet [a-z0-9_] contains '_',
    # a LIKE wildcard — match with prefix(), which is literal
    pfx_pred = " OR ".join(f"prefix(term, {q(p)})" for p in prefixes) or "FALSE"
    expand_selects = "\n      UNION ALL\n      ".join(
        f"SELECT term FROM (SELECT term FROM alldf WHERE prefix(term, {q(p)}) "
        f"ORDER BY df DESC, term ASC LIMIT {max_expansions})"
        for p in prefixes
    )
    lit_values = (
        "SELECT * FROM (VALUES " + ", ".join(f"({q(t)})" for t in literal_terms) + ")"
        if literal_terms
        else "SELECT term FROM alldf WHERE FALSE"
    )
    exp_cte = expand_selects if prefixes else "SELECT term FROM alldf WHERE FALSE"
    tie = "__tie" if tie_sql else id_col
    tie_proj = f", {tie_sql} AS __tie" if tie_sql else ""
    tie_carry = ", __tie" if tie_sql else ""
    tie_group = ", d3.__tie" if tie_sql else ""
    order_score = "scored.score" if tie_sql else "score"
    return f"""
    WITH d2 AS (
      SELECT {id_col}{tie_proj},
             list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),
                         t -> t <> '') AS toks
      FROM {table}
    ), d3 AS (SELECT {id_col}{tie_carry}, toks, len(toks) AS dl FROM d2),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3),
    alltf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3)
      WHERE {lit_pred} OR {pfx_pred}
      GROUP BY {id_col}, term
    ),
    alldf AS (SELECT term, count(*) AS df FROM alltf GROUP BY term),
    qterms AS (
      SELECT DISTINCT term FROM (
      {exp_cte}
      UNION ALL
      {lit_values}
      )
    ),
    tf AS (SELECT alltf.* FROM alltf JOIN qterms USING(term)),
    dfreq AS (SELECT alldf.term, alldf.df FROM alldf JOIN qterms USING(term)),
    scored AS (
      SELECT tf.{id_col}{tie_group},
             sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * d3.dl / stats.avgdl))) AS score
      FROM tf JOIN dfreq USING(term) JOIN d3 USING({id_col}) CROSS JOIN stats
      GROUP BY tf.{id_col}{tie_group}
    )
    SELECT {id_col}, round(score, 6)::DOUBLE AS score
    FROM scored
    ORDER BY {order_score} DESC, {tie} ASC
    LIMIT {k}
    """


def bm25_highlight_sql(
    table: str,
    query_terms: list[str],
    k: int = 10,
    window: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    tie_sql: str | None = None,
) -> str:
    """DuckDB twin of Bm25Index.topk_highlight / LocalSearcher.highlight.

    Standard brute BM25 top-k, then for each winner the best snippet
    window: anchors are 1-based positions of any query term; the window
    value is the occurrence count in ``[p, p + window)``; max value wins,
    ties to the smallest anchor; ``snip_start`` is emitted 0-based to
    match the kernel's token offsets."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    tie = "__tie" if tie_sql else id_col
    tie_proj = f", {tie_sql} AS __tie" if tie_sql else ""
    tie_carry = ", __tie" if tie_sql else ""
    tie_group = ", d3.__tie" if tie_sql else ""
    return f"""
    WITH d2 AS (
      SELECT {id_col}{tie_proj},
             list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),
                         t -> t <> '') AS toks
      FROM {table}
    ), d3 AS (SELECT {id_col}{tie_carry}, toks, len(toks) AS dl FROM d2),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3),
    tf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3)
      WHERE term IN ({terms})
      GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.{id_col}{tie_group},
             sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * d3.dl / stats.avgdl))) AS score
      FROM tf JOIN dfreq USING(term) JOIN d3 USING({id_col}) CROSS JOIN stats
      GROUP BY tf.{id_col}{tie_group}
    ),
    topk AS (
      SELECT {id_col}{tie_carry}, score
      FROM scored
      ORDER BY scored.score DESC, {tie} ASC
      LIMIT {k}
    ),
    anchors AS (
      SELECT topk.{id_col}, topk.score{', topk.__tie' if tie_sql else ''},
             unnest(pos) AS p, pos
      FROM topk
      JOIN (SELECT {id_col},
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] IN ({terms})) AS pos
            FROM d3) px USING({id_col})
    ),
    wins AS (
      SELECT {id_col}, score{tie_carry}, p,
             len(list_filter(pos, x -> x >= p AND x < p + {window})) AS cnt,
             row_number() OVER (
               PARTITION BY {id_col}
               ORDER BY len(list_filter(pos, x -> x >= p AND x < p + {window})) DESC,
                        p ASC
             ) AS rn
      FROM anchors
    )
    SELECT {id_col}, round(score, 6)::DOUBLE AS score,
           (p - 1)::BIGINT AS snip_start, cnt::BIGINT AS snip_hits
    FROM wins
    WHERE rn = 1
    ORDER BY wins.score DESC, {tie} ASC
    LIMIT {k}
    """


def bm25_fields_sql(
    table: str,
    fields: list[tuple[str, float]],
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    tie_sql: str | None = None,
) -> str:
    """DuckDB twin of multifield.MultiFieldSearch.topk.

    ``fields``: (text_expression, weight) pairs — each field is scored as
    its own corpus (own n/avgdl/df over that expression's tokens) and the
    final rank is the weighted sum of per-field BM25 scores."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    tie = "__tie" if tie_sql else id_col
    ctes = []
    unions = []
    for i, (expr, w) in enumerate(fields):
        ctes.append(f"""d3_{i} AS (
      SELECT {id_col}, toks, len(toks) AS dl FROM (
        SELECT {id_col},
               list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9_]+'),
                           t -> t <> '') AS toks
        FROM {table})
    ),
    stats_{i} AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3_{i}),
    tf_{i} AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3_{i})
      WHERE term IN ({terms})
      GROUP BY {id_col}, term
    ),
    dfreq_{i} AS (SELECT term, count(*) AS df FROM tf_{i} GROUP BY term),
    scored_{i} AS (
      SELECT tf_{i}.{id_col},
             sum(ln(1 + (stats_{i}.n - dfreq_{i}.df + 0.5) / (dfreq_{i}.df + 0.5))
                 * tf_{i}.tf * ({k1} + 1.0)
                 / (tf_{i}.tf + {k1} * (1.0 - {b} + {b} * d3_{i}.dl / stats_{i}.avgdl))) AS score
      FROM tf_{i} JOIN dfreq_{i} USING(term) JOIN d3_{i} USING({id_col})
      CROSS JOIN stats_{i}
      GROUP BY tf_{i}.{id_col}
    )""")
        unions.append(f"SELECT {id_col}, {w} * score AS wscore FROM scored_{i}")
    tiemap = (
        f"tiemap AS (SELECT {id_col}, {tie_sql} AS __tie FROM {table}),\n    "
        if tie_sql
        else ""
    )
    tie_join = " JOIN tiemap USING(" + id_col + ")" if tie_sql else ""
    all_ctes = ",\n    ".join(ctes)
    all_unions = "\n      UNION ALL\n      ".join(unions)
    return f"""
    WITH {all_ctes},
    {tiemap}combined AS (
      SELECT {id_col}, sum(wscore) AS score
      FROM (
      {all_unions}
      )
      GROUP BY {id_col}
    )
    SELECT {id_col}, round(score, 6)::DOUBLE AS score
    FROM combined{tie_join}
    ORDER BY combined.score DESC, {tie} ASC
    LIMIT {k}
    """


def bm25_fuzzy_sql(
    table: str,
    literal_terms: list[str],
    fuzzy_terms: list[str],
    k: int = 10,
    max_distance: int = 1,
    max_expansions: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    tie_sql: str | None = None,
) -> str:
    """DuckDB twin of Bm25Index.topk_fuzzy / LocalSearcher.topk_fuzzy.

    Each fuzzy term expands to corpus terms within ``max_distance``
    Levenshtein edits, ordered (distance ASC, df DESC, term ASC) and
    capped at ``max_expansions`` — the exact expand_fuzzy contract, with
    df derived from the same corpus the index indexed. The union of
    literals + expansions dedups and scores as standard brute BM25.

    Expansion needs df for EVERY candidate term, so this oracle derives
    the full vocabulary df (one unnest + group-by over the corpus) —
    fine at oracle scale; the engine reads it from the terms parquet."""

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    lit_values = (
        "SELECT * FROM (VALUES " + ", ".join(f"({q(t)})" for t in literal_terms) + ")"
        if literal_terms
        else "SELECT term FROM vocab WHERE FALSE"
    )
    expand_selects = "\n      UNION ALL\n      ".join(
        f"SELECT term FROM (SELECT term FROM vocab "
        f"WHERE levenshtein(term, {q(t)}) <= {max_distance} "
        f"ORDER BY levenshtein(term, {q(t)}) ASC, df DESC, term ASC "
        f"LIMIT {max_expansions})"
        for t in fuzzy_terms
    ) or "SELECT term FROM vocab WHERE FALSE"
    tie = "__tie" if tie_sql else id_col
    tie_proj = f", {tie_sql} AS __tie" if tie_sql else ""
    tie_carry = ", __tie" if tie_sql else ""
    tie_group = ", d3.__tie" if tie_sql else ""
    order_score = "scored.score" if tie_sql else "score"
    return f"""
    WITH d2 AS (
      SELECT {id_col}{tie_proj},
             list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),
                         t -> t <> '') AS toks
      FROM {table}
    ), d3 AS (SELECT {id_col}{tie_carry}, toks, len(toks) AS dl FROM d2),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3),
    vocab AS (
      SELECT term, count(*) AS df
      FROM (SELECT DISTINCT {id_col}, unnest(toks) AS term FROM d3)
      GROUP BY term
    ),
    qterms AS (
      SELECT DISTINCT term FROM (
      {expand_selects}
      UNION ALL
      {lit_values}
      )
    ),
    tf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3)
      JOIN qterms USING(term)
      GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT vocab.term, vocab.df FROM vocab JOIN qterms USING(term)),
    scored AS (
      SELECT tf.{id_col}{tie_group},
             sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * d3.dl / stats.avgdl))) AS score
      FROM tf JOIN dfreq USING(term) JOIN d3 USING({id_col}) CROSS JOIN stats
      GROUP BY tf.{id_col}{tie_group}
    )
    SELECT {id_col}, round(score, 6)::DOUBLE AS score
    FROM scored
    ORDER BY {order_score} DESC, {tie} ASC
    LIMIT {k}
    """


def bm25_boolean_sql(
    table: str,
    must: list[str],
    should: list[str],
    must_not: list[str],
    boosts: dict[str, float] | None = None,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    tie_sql: str | None = None,
) -> str:
    """DuckDB twin of Bm25Index.topk_boolean / LocalSearcher.topk_boolean.

    Eligible docs contain every ``must`` term and none of ``must_not``;
    the score is the boost-scaled BM25 sum over must ∪ should."""

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    score_terms = sorted(set(must) | set(should))
    boosts_ = {t: float((boosts or {}).get(t, 1.0)) for t in score_terms}
    terms = ", ".join(q(t) for t in score_terms)
    boost_vals = ", ".join(f"({q(t)}, {boosts_[t]})" for t in score_terms)
    tie = "__tie" if tie_sql else id_col
    tie_proj = f", {tie_sql} AS __tie" if tie_sql else ""
    tie_carry = ", __tie" if tie_sql else ""
    tie_group = ", d3.__tie" if tie_sql else ""
    order_score = "scored.score" if tie_sql else "score"
    must_gate = ""
    if must:
        must_terms = ", ".join(q(t) for t in sorted(set(must)))
        must_gate = (
            f"JOIN (SELECT {id_col} FROM tf WHERE term IN ({must_terms}) "
            f"GROUP BY {id_col} "
            f"HAVING count(DISTINCT term) = {len(set(must))}) mg USING({id_col})\n      "
        )
    not_gate = ""
    if must_not:
        not_terms = ", ".join(q(t) for t in sorted(set(must_not)))
        not_gate = (
            f"ANTI JOIN (SELECT DISTINCT {id_col} "
            f"FROM (SELECT {id_col}, unnest(toks) AS term FROM d3) "
            f"WHERE term IN ({not_terms})) nd USING({id_col})\n      "
        )
    return f"""
    WITH d2 AS (
      SELECT {id_col}{tie_proj},
             list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),
                         t -> t <> '') AS toks
      FROM {table}
    ), d3 AS (SELECT {id_col}{tie_carry}, toks, len(toks) AS dl FROM d2),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3),
    tf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3)
      WHERE term IN ({terms})
      GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bq(term, boost) AS (VALUES {boost_vals}),
    scored AS (
      SELECT tf.{id_col}{tie_group},
             sum(bq.boost
                 * ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * d3.dl / stats.avgdl))) AS score
      FROM tf JOIN dfreq USING(term) JOIN bq USING(term)
      JOIN d3 USING({id_col})
      {must_gate}{not_gate}CROSS JOIN stats
      GROUP BY tf.{id_col}{tie_group}
    )
    SELECT {id_col}, round(score, 6)::DOUBLE AS score
    FROM scored
    ORDER BY {order_score} DESC, {tie} ASC
    LIMIT {k}
    """


def bm25_collapse_sql(
    table: str,
    query_terms: list[str],
    group_col: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    tie_sql: str | None = None,
) -> str:
    """DuckDB twin of Bm25Index.collapse_topk (field collapsing): the
    best-scoring doc per ``group_col`` value, top-k groups. Winner per
    group and the global cut both break score ties by the same id the
    engine uses (``tie_sql`` = the internal sha-derived id)."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    tie = "__tie" if tie_sql else id_col
    tie_proj = f", {tie_sql} AS __tie" if tie_sql else ""
    tie_carry = ", __tie" if tie_sql else ""
    tie_group = ", d3.__tie" if tie_sql else ""
    return f"""
    WITH d2 AS (
      SELECT {id_col}, {group_col} AS grp{tie_proj},
             list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),
                         t -> t <> '') AS toks
      FROM {table}
    ), d3 AS (SELECT {id_col}, grp{tie_carry}, toks, len(toks) AS dl FROM d2),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3),
    tf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3)
      WHERE term IN ({terms})
      GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.{id_col}, d3.grp{tie_group},
             sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * d3.dl / stats.avgdl))) AS score
      FROM tf JOIN dfreq USING(term) JOIN d3 USING({id_col}) CROSS JOIN stats
      GROUP BY tf.{id_col}, d3.grp{tie_group}
    ),
    best AS (
      SELECT grp, {id_col}, score, {tie},
             row_number() OVER (
               PARTITION BY grp ORDER BY score DESC, {tie} ASC
             ) AS r
      FROM scored
    )
    SELECT grp AS {group_col}, {id_col}, round(score, 6)::DOUBLE AS score
    FROM best WHERE r = 1
    ORDER BY best.score DESC, {tie} ASC
    LIMIT {k}
    """


def bm25_suggest_sql(
    table: str,
    term: str,
    max_distance: int = 2,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of Bm25Index.suggest / LocalSearcher.suggest: the
    corpus vocabulary (df = number of docs containing the term — exactly
    the index's terms table by construction) filtered to levenshtein <=
    max_distance, ranked (distance ASC, df DESC, term ASC), top k."""
    t = term.replace("'", "''")
    return f"""
    WITH vocab AS (
      SELECT term, count(DISTINCT {id_col})::BIGINT AS df
      FROM (
        SELECT {id_col}, unnest(
          list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),
                      x -> x <> '')) AS term
        FROM {table}
      )
      GROUP BY term
    )
    SELECT term AS suggestion, df,
           levenshtein(term, '{t}')::INTEGER AS distance
    FROM vocab
    WHERE abs(len(term) - len('{t}')) <= {max_distance}
      AND levenshtein(term, '{t}') <= {max_distance}
    ORDER BY distance ASC, df DESC, suggestion ASC
    LIMIT {k}
    """


def bm25_rescore_sql(
    table: str,
    query_terms: list[str],
    boost_sql: str,
    k: int = 10,
    window: int = 100,
    weight: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    tie_sql: str | None = None,
) -> str:
    """DuckDB twin of Bm25Index.topk_rescored: top-``window`` docs by raw
    BM25 (same window cut the engine makes, tie-broken by ``tie_sql``),
    then score + weight * ``boost_sql`` (an expression over the d3 CTE's
    columns — {id_col}, dl, toks) re-ranked to the top k."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    tie = "__tie" if tie_sql else id_col
    tie_proj = f", {tie_sql} AS __tie" if tie_sql else ""
    tie_carry = ", __tie" if tie_sql else ""
    tie_group = ", d3.__tie" if tie_sql else ""
    return f"""
    WITH d2 AS (
      SELECT {id_col}{tie_proj},
             list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),
                         t -> t <> '') AS toks
      FROM {table}
    ), d3 AS (SELECT {id_col}{tie_carry}, toks, len(toks) AS dl FROM d2),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d3),
    tf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(toks) AS term FROM d3)
      WHERE term IN ({terms})
      GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.{id_col}{tie_group},
             sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * d3.dl / stats.avgdl))) AS score
      FROM tf JOIN dfreq USING(term) JOIN d3 USING({id_col}) CROSS JOIN stats
      GROUP BY tf.{id_col}{tie_group}
    ),
    win AS (
      SELECT * FROM scored ORDER BY scored.score DESC, {tie} ASC LIMIT {window}
    ),
    rescored AS (
      SELECT win.{id_col}{", win.__tie" if tie_sql else ""},
             win.score + {weight} * ({boost_sql}) AS score
      FROM win JOIN d3 USING({id_col})
    )
    SELECT {id_col}, round(score, 6)::DOUBLE AS score
    FROM rescored
    ORDER BY rescored.score DESC, {tie} ASC
    LIMIT {k}
    """
