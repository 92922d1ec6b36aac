"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: dot products via Catalyst higher-order
  functions (zip_with + aggregate) — JVM-side, no UDF — then sort-limit.
  Correct baseline at any scale; O(N·d) scan.
- LSH-bucketed ANN: random-hyperplane signatures (vectorized Arrow UDF)
  → bucket equality pre-filter → exact cosine only within probed buckets.
  The scale path: the bucket join prunes the candidate set by ~2^bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_expr(vec_col: str, q: list[float]):
    qarr = "array(" + ", ".join(f"cast({x!r} as double)" for x in q) + ")"
    return F.expr(
        f"aggregate(zip_with({vec_col}, {qarr}, (x, y) -> cast(x as double) * y),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm_expr(vec_col: str):
    return F.sqrt(
        F.expr(
            f"aggregate(transform({vec_col}, x -> cast(x as double) * cast(x as double)),"
            f" cast(0.0 as double), (acc, v) -> acc + v)"
        )
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k (score desc, id asc)."""
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    scored = df.select(
        F.col(id_col),
        F.round(
            _dot_expr(vec_col, query_vec) / (_norm_expr(vec_col) * F.lit(qn)), 9
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def cosine_topk_sql(
    table: str, query_vec: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> str:
    q = "[" + ", ".join(f"{x!r}::DOUBLE" for x in query_vec) + "]"
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    dot = (
        f"list_aggregate(list_transform(range(1, len({vec_col}) + 1),"
        f" i -> {vec_col}[i]::DOUBLE * ({q})[i]), 'sum')"
    )
    nrm = (
        f"sqrt(list_aggregate(list_transform({vec_col}, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    )
    return f"""
    SELECT {id_col}, round({dot} / ({nrm} * {qn!r}), 9) AS cosine
    FROM {table}
    ORDER BY cosine DESC, {id_col} ASC
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, bits: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_signatures(
    df: DataFrame,
    dim: int,
    bits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Sign-bit bucket per vector (vectorized Arrow UDF, one matmul/batch)."""
    planes = hyperplanes(dim, bits, seed)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(bits)).astype(np.int64)
        return pd.Series(signs @ weights)

    return df.select(F.col(id_col), F.col(vec_col), bucket(F.col(vec_col)).alias("bucket"))


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: probe the query's bucket (+ Hamming-1 neighbors), exact
    cosine within candidates. Recall/latency knob = bits & multiprobe.

    This is the scale path (one float32 matmul per Arrow batch). For the
    oracle-checkable variant with frozen literal hyperplanes, see
    :func:`ann_topk_catalyst`."""
    dim = len(query_vec)
    planes = hyperplanes(dim, bits, seed)
    signs = (planes @ np.asarray(query_vec)) > 0
    weights = (1 << np.arange(bits)).astype(np.int64)
    qbucket = int(signs @ weights)
    probes = [qbucket]
    if multiprobe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(bits)]
    sigs = lsh_signatures(df, dim, bits, seed, vec_col, id_col)
    cand = sigs.where(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# Catalyst-expressed LSH ANN (oracle-checkable: frozen literal hyperplanes)
# ---------------------------------------------------------------------------


def _literal_planes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Hyperplanes rounded to 6 decimals → stable literals embedded
    identically in the Spark plan and the DuckDB SQL twin."""
    return [
        [float(x) for x in np.round(row, 6)]
        for row in hyperplanes(dim, bits, seed)
    ]


def _probes_for(query_vec: list[float], planes: list[list[float]], multiprobe: int) -> list[int]:
    """Query bucket + Hamming-`multiprobe` neighbors, sequential-sum signs
    (computed once driver-side; embedded as literals in both engines)."""
    bits = len(planes)
    qbucket = 0
    for b, plane in enumerate(planes):
        s = 0.0
        for x, y in zip(plane, query_vec):
            s += x * y
        if s > 0:
            qbucket |= 1 << b
    probes = [qbucket]
    if multiprobe >= 1:
        probes += [qbucket ^ (1 << i) for i in range(bits)]
    return probes


def ann_topk_catalyst(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 6,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k entirely in Catalyst: per-row bucket = sign bits of dots
    against frozen literal hyperplanes (sequential aggregate fold — the
    same summation order DuckDB's list_aggregate uses, so buckets are
    bit-identical cross-engine), bucket IN (probes) pre-filter, exact
    cosine among candidates."""
    dim = len(query_vec)
    planes = _literal_planes(dim, bits, seed)
    probes = _probes_for(query_vec, planes, multiprobe_hamming)
    code = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        code = code + F.when(_dot_expr(vec_col, plane) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    cand = df.select(F.col(id_col), F.col(vec_col), code.alias("bucket")).where(
        F.col("bucket").isin(probes)
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def ann_topk_catalyst_sql(
    table: str,
    query_vec: list[float],
    k: int = 10,
    bits: int = 6,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_hamming: int = 1,
) -> str:
    """DuckDB twin of ann_topk_catalyst (same literals, same fold order)."""
    dim = len(query_vec)
    planes = _literal_planes(dim, bits, seed)
    probes = _probes_for(query_vec, planes, multiprobe_hamming)

    def dot_sql(plane: list[float]) -> str:
        p = "[" + ", ".join(f"{x!r}::DOUBLE" for x in plane) + "]"
        return (
            f"list_aggregate(list_transform(range(1, len({vec_col}) + 1),"
            f" i -> {vec_col}[i]::DOUBLE * ({p})[i]), 'sum')"
        )

    code = " + ".join(
        f"(CASE WHEN {dot_sql(plane)} > 0 THEN {1 << b} ELSE 0 END)"
        for b, plane in enumerate(planes)
    )
    q = "[" + ", ".join(f"{x!r}::DOUBLE" for x in query_vec) + "]"
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    dot = (
        f"list_aggregate(list_transform(range(1, len({vec_col}) + 1),"
        f" i -> {vec_col}[i]::DOUBLE * ({q})[i]), 'sum')"
    )
    nrm = (
        f"sqrt(list_aggregate(list_transform({vec_col}, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    )
    return f"""
    SELECT {id_col}, round({dot} / ({nrm} * {qn!r}), 9) AS cosine
    FROM (SELECT {id_col}, {vec_col}, ({code})::BIGINT AS bucket FROM {table})
    WHERE bucket IN ({", ".join(str(p) for p in probes)})
    ORDER BY cosine DESC, {id_col} ASC
    LIMIT {k}
    """
