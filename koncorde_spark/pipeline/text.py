"""Text-analysis operators for training-data pipelines.

All hot paths are Catalyst built-ins / higher-order functions (JVM-side,
whole-stage codegen) — no Python in the per-row path. Each operator has a
DuckDB-SQL twin used by the driver's correctness gate; the constants and
token rule are shared so both engines compute identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fulltext.tokenizer import SPLIT_PATTERN

# Frozen stopword lists (lowercase) for the n-gram/stopword language-ID
# heuristic. Deliberately small + embedded as literals so the same lists
# appear verbatim in the DuckDB oracle SQL.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
}


def tokens_col(text_col: str):
    """The canonical tokenizer as a Catalyst expression (JVM-side)."""
    return F.array_remove(F.split(F.lower(F.col(text_col)), SPLIT_PATTERN), "")


def tokens_sql(text_col: str) -> str:
    """Same tokenizer in DuckDB SQL."""
    return (
        f"list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9_]+'),"
        f" t -> t <> '')"
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counting + basic quality ratios (pure Catalyst)."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        toks.alias("__t"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.col(text_col).alias("__x"),
    ).select(
        id_col,
        F.size("__t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__t")).cast("long").alias("n_unique_tokens"),
        "n_chars",
        F.size(F.split("__x", r"\s+")).cast("long").alias("n_ws_tokens"),
    )


def token_stats_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
    SELECT {id_col},
           len({tokens_sql(text_col)})::BIGINT AS n_tokens,
           len(list_distinct({tokens_sql(text_col)}))::BIGINT AS n_unique_tokens,
           length({text_col})::BIGINT AS n_chars,
           len(string_split_regex({text_col}, '\\s+'))::BIGINT AS n_ws_tokens
    FROM {table}
    """


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality metrics: length, punctuation + stopword ratios,
    lexical diversity. All Catalyst expressions."""
    toks = tokens_col(text_col)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    punct = F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9_\s]", ""))
    return (
        df.select(
            F.col(id_col),
            toks.alias("__t"),
            F.length(F.col(text_col)).alias("n_chars"),
            punct.alias("n_punct"),
        )
        .select(
            id_col,
            "n_chars",
            F.size("__t").cast("long").alias("n_tokens"),
            F.round(F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1)), 6).alias(
                "punct_ratio"
            ),
            F.round(
                F.size(F.filter("__t", lambda t: F.array_contains(en_stop, t)))
                / F.greatest(F.size("__t"), F.lit(1)),
                6,
            ).alias("stopword_ratio"),
            F.round(
                F.size(F.array_distinct("__t")) / F.greatest(F.size("__t"), F.lit(1)), 6
            ).alias("lexical_diversity"),
        )
    )


def quality_score_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    stop = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    t = tokens_sql(text_col)
    return f"""
    SELECT {id_col},
           length({text_col})::BIGINT AS n_chars,
           len({t})::BIGINT AS n_tokens,
           round(length(regexp_replace({text_col}, '[a-zA-Z0-9_\\s]', '', 'g'))
                 / greatest(length({text_col}), 1), 6) AS punct_ratio,
           round(len(list_filter({t}, x -> list_contains([{stop}], x)))
                 / greatest(len({t}), 1), 6) AS stopword_ratio,
           round(len(list_distinct({t})) / greatest(len({t}), 1), 6) AS lexical_diversity
    FROM {table}
    """


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: argmax over per-language hit counts.

    Ties break by language code ascending (deterministic). 'und' when no
    list hits. Pure Catalyst higher-order functions.
    """
    toks = tokens_col(text_col)
    base = df.select(F.col(id_col), toks.alias("__t"))

    def _score(lang: str):
        stoplist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter("__t", lambda t: F.array_contains(stoplist, t)))

    scores = [_score(lang).alias(f"score_{lang}") for lang in sorted(STOPWORDS)]
    scored = base.select(id_col, *scores)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{g}") for g in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for g in langs:  # first (alphabetical) language attaining the max wins
        pred = pred.when(F.col(f"score_{g}") == best, F.lit(g))
    return scored.select(
        id_col, *[F.col(f"score_{g}").cast("long").alias(f"score_{g}") for g in langs],
        pred.alias("pred_lang"),
    )


def language_id_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    t = tokens_sql(text_col)
    langs = sorted(STOPWORDS)
    score_exprs = []
    for g in langs:
        stop = ", ".join(f"'{w}'" for w in STOPWORDS[g])
        score_exprs.append(
            f"len(list_filter({t}, x -> list_contains([{stop}], x)))::BIGINT AS score_{g}"
        )
    best = "greatest(" + ", ".join(f"score_{g}" for g in langs) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'und' "
    for g in langs:
        case += f"WHEN score_{g} = {best} THEN '{g}' "
    case += "END"
    return f"""
    WITH s AS (SELECT {id_col}, {', '.join(score_exprs)} FROM {table})
    SELECT {id_col}, {', '.join('score_' + g for g in langs)}, {case} AS pred_lang
    FROM s
    """


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    (The rolling-hash / winnowing variant lives in dedup.simhash — this is
    the cheap exact-normalized fingerprint, identical in both engines.)
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.expr(
            f"cast(conv(substring(md5(trim(regexp_replace(lower({text_col}),"
            f" '\\\\s+', ' '))), 1, 15), 16, 10) as bigint)"
        ).alias("fp_int"),
    )


def fingerprint_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    return f"""
    SELECT {id_col},
           md5({norm}) AS fp_md5,
           ('0x' || substr(md5({norm}), 1, 15))::BIGINT AS fp_int
    FROM {table}
    """
