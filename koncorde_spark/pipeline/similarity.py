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

from ..rounding import round_away


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
        round_away(
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
    code = _bucket_code_expr(planes, vec_col)
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
    code = _bucket_code_sql(planes, vec_col)
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


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate detection
# ---------------------------------------------------------------------------


def _bucket_code_expr(planes: list[list[float]], vec_col: str):
    """Catalyst sign-bit bucket against frozen literal hyperplanes
    (sequential fold — same summation order as DuckDB's list_aggregate,
    so buckets are bit-identical cross-engine)."""
    code = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        code = code + F.when(_dot_expr(vec_col, plane) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return code


def _plane_dot_sql(vec_col: str, plane: list[float]) -> str:
    p = "[" + ", ".join(f"{x!r}::DOUBLE" for x in plane) + "]"
    return (
        f"list_aggregate(list_transform(range(1, len({vec_col}) + 1),"
        f" i -> {vec_col}[i]::DOUBLE * ({p})[i]), 'sum')"
    )


def _bucket_code_sql(planes: list[list[float]], vec_col: str) -> str:
    """DuckDB twin of ``_bucket_code_expr`` (same literals, same fold)."""
    return " + ".join(
        f"(CASE WHEN {_plane_dot_sql(vec_col, plane)} > 0 THEN {1 << b} ELSE 0 END)"
        for b, plane in enumerate(planes)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int = 64,
    bits: int = 6,
    seed: int = 42,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_cap: int = 256,
    materialize: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH bucket → capped within-bucket
    join → exact cosine ≥ threshold. The embedding-space sibling of
    MinHash near-dedup (same bucket-join shape, same star-pattern cap for
    degenerate buckets — a corpus with millions of identical embeddings
    stays O(N) pairs per bucket, not O(N²)).

    ``materialize`` (default) eagerly localCheckpoints the windowed bucket
    stats: they feed both small-bucket join sides and both star-join sides,
    and without the barrier the scan + bucket projection + window shuffle
    re-execute per reference (4× at 100 TB). Pass False for plan
    inspection of the unmaterialized shape.

    Buckets come from the Catalyst literal-hyperplane expression so the
    DuckDB twin reproduces the exact pair set; candidate volume is pruned
    ~2^bits before any cosine is computed. Returns (id_a, id_b, cosine)
    with id_a < id_b, cosine rounded to 9 (cross-engine stable)."""
    from pyspark.sql import Window

    planes = _literal_planes(dim, bits, seed)
    e = df.select(
        F.col(id_col), F.col(vec_col), _bucket_code_expr(planes, vec_col).alias("bucket")
    )
    w = Window.partitionBy("bucket")
    stats = e.withColumn("n", F.count(F.lit(1)).over(w)).withColumn(
        "mid", F.min(id_col).over(w)
    )
    if materialize:
        stats = stats.localCheckpoint(eager=True)
    small = stats.where(F.col("n") <= bucket_cap)
    pairs = (
        small.alias("l")
        .join(
            small.alias("r"),
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{vec_col}").alias("__va"),
            F.col(f"r.{vec_col}").alias("__vb"),
        )
    )
    big = stats.where(F.col("n") > bucket_cap)
    star = (
        big.alias("l")
        .join(
            big.alias("r"),
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") == F.col("r.mid"))
            & (F.col(f"r.{id_col}") != F.col("r.mid")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{vec_col}").alias("__va"),
            F.col(f"r.{vec_col}").alias("__vb"),
        )
    )
    both = pairs.unionByName(star)
    dot = F.expr(
        "aggregate(zip_with(__va, __vb, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )
    cos = round_away(dot / (_norm_expr("__va") * _norm_expr("__vb")), 9)
    return (
        both.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs_sql(
    table: str,
    dim: int = 64,
    bits: int = 6,
    seed: int = 42,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_cap: int = 256,
) -> str:
    """DuckDB twin of embedding_near_dup_pairs (same literal planes, same
    fold order, same bucket cap + star pattern)."""
    planes = _literal_planes(dim, bits, seed)
    code = _bucket_code_sql(planes, vec_col)
    return f"""
    WITH e AS (
      SELECT {id_col}, {vec_col} AS v, ({code})::BIGINT AS bucket FROM {table}
    ),
    stats AS (
      SELECT {id_col}, v, bucket,
             count(*) OVER (PARTITION BY bucket) AS n,
             min({id_col}) OVER (PARTITION BY bucket) AS mid
      FROM e
    ),
    cand AS (
      SELECT l.{id_col} AS id_a, r.{id_col} AS id_b, l.v AS va, r.v AS vb
      FROM stats l JOIN stats r
        ON l.bucket = r.bucket AND l.{id_col} < r.{id_col}
      WHERE l.n <= {bucket_cap}
      UNION ALL
      SELECT l.{id_col}, r.{id_col}, l.v, r.v
      FROM stats l JOIN stats r
        ON l.bucket = r.bucket AND l.{id_col} = r.mid AND r.{id_col} <> r.mid
      WHERE l.n > {bucket_cap}
    )
    SELECT id_a, id_b,
           round(
             list_aggregate(list_transform(range(1, len(va) + 1),
               i -> va[i]::DOUBLE * vb[i]::DOUBLE), 'sum')
             / (sqrt(list_aggregate(list_transform(va, x -> x::DOUBLE * x::DOUBLE), 'sum'))
                * sqrt(list_aggregate(list_transform(vb, x -> x::DOUBLE * x::DOUBLE), 'sum'))),
             9) AS cosine
    FROM cand
    WHERE cosine >= {threshold!r}
    """


def embedding_near_dedup(
    df: DataFrame,
    dim: int = 64,
    bits: int = 6,
    seed: int = 42,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """End-to-end embedding near-dedup: pairs → connected components →
    survivors (smallest id per cluster), mirroring dedup.dedup_near."""
    from .dedup import cluster_pairs

    pairs = embedding_near_dup_pairs(
        df, dim=dim, bits=bits, seed=seed, threshold=threshold,
        vec_col=vec_col, id_col=id_col,
    )
    clusters = cluster_pairs(pairs.select("id_a", "id_b"))
    dupes = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(dupes, id_col, "anti")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> probe top lists -> exact rescore
# ---------------------------------------------------------------------------

IVF_DEFAULT_LISTS = 16


def ivf_random_centroids(dim: int, n_lists: int = IVF_DEFAULT_LISTS, seed: int = 42) -> list[list[float]]:
    """Seeded unit-norm random centroids (data-independent coarse
    quantizer). These make the full IVF machinery (assign → probe →
    exact rescore) deterministic and therefore DuckDB-oracle-checkable;
    ``ivf_train`` below produces better (data-adapted) centroids for the
    recall-tested path."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_lists, dim))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return [[float(x) for x in row] for row in c]


def ivf_train(
    df: DataFrame,
    dim: int,
    n_lists: int = IVF_DEFAULT_LISTS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    iters: int = 10,
    sample_size: int = 10_000,
) -> list[list[float]]:
    """Lloyd's k-means on a DETERMINISTIC driver-side sample (ordered by
    id — `limit` without an order is partition-racy), spherical variant
    (centroids renormalized per iteration, assignment by max dot — the
    right geometry for cosine search). Empty clusters are reseeded
    deterministically from the farthest points. At 100 TB the sample stays
    driver-sized (the standard IVF recipe: train on ~10^5-10^6 vectors,
    assign the full corpus distributively)."""
    pdf = df.select(id_col, vec_col).orderBy(id_col).limit(sample_size).toPandas()
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=n_lists, replace=False)].copy()
    for _ in range(iters):
        sims = X @ cent.T
        assign = sims.argmax(axis=1)
        for j in range(n_lists):
            members = X[assign == j]
            if len(members):
                m = members.sum(axis=0)
                cent[j] = m / max(np.linalg.norm(m), 1e-12)
            else:  # reseed from the globally worst-covered point
                cent[j] = X[sims.max(axis=1).argmin()]
    return [[float(x) for x in row] for row in cent]


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, vec, list_id): nearest-centroid assignment, pure Catalyst.

    The per-centroid dots are projected to a column FIRST (Catalyst does
    no CSE inside expressions — inlining the array twice for
    array_position/array_max would evaluate every dot twice); first-max
    tie-break matches DuckDB's list_position. list_id is 1-based."""
    dots = F.array(*[_dot_expr(vec_col, c) for c in centroids])
    return (
        df.select(F.col(id_col), F.col(vec_col), dots.alias("__dots"))
        .withColumn("list_id", F.expr("array_position(__dots, array_max(__dots))"))
        .drop("__dots")
    )


def ivf_probe_lists(query_vec: list[float], centroids: list[list[float]], nprobe: int) -> list[int]:
    """Top-nprobe centroid indexes (1-based, matching ivf_assign) for a
    query — driver-side, inlined as literals in BOTH engines."""
    q = np.asarray(query_vec, dtype=np.float64)
    sims = np.asarray(centroids, dtype=np.float64) @ q
    order = np.argsort(-sims, kind="stable")[:nprobe]
    return [int(i) + 1 for i in order]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN top-k: assign to coarse lists, probe the nprobe lists
    nearest the query, exact cosine only within them. Candidate volume
    drops ~n_lists/nprobe before any full-precision work — the standard
    billion-vector shape (train driver-side, assign distributively,
    bucket-prune the scan)."""
    if centroids is None:
        centroids = ivf_random_centroids(len(query_vec))
    probes = ivf_probe_lists(query_vec, centroids, nprobe)
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    cand = ivf_assign(df, centroids, vec_col, id_col).where(
        F.col("list_id").isin(probes)
    )
    scored = cand.select(
        F.col(id_col),
        round_away(
            _dot_expr(vec_col, query_vec) / (_norm_expr(vec_col) * F.lit(qn)), 9
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def ivf_topk_sql(
    table: str,
    query_vec: list[float],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of ivf_topk: identical centroid literals, identical
    sequential-fold dots (bit-identical → identical argmax/first-max
    assignment), identical probe set, identical rounded cosine."""
    if centroids is None:
        centroids = ivf_random_centroids(len(query_vec))
    probes = ivf_probe_lists(query_vec, centroids, nprobe)
    dots = ", ".join(_plane_dot_sql(vec_col, c) for c in centroids)
    q = "[" + ", ".join(f"{x!r}::DOUBLE" for x in query_vec) + "]"
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    probe_lit = ", ".join(str(p) for p in probes)
    qdot = (
        f"list_aggregate(list_transform(range(1, len({vec_col}) + 1),"
        f" i -> {vec_col}[i]::DOUBLE * ({q})[i]), 'sum')"
    )
    nrm = (
        f"sqrt(list_aggregate(list_transform({vec_col}, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    )
    return f"""
    WITH assigned AS (
      SELECT {id_col}, {vec_col}, [{dots}] AS dots FROM {table}
    ),
    cand AS (
      SELECT {id_col}, {vec_col}
      FROM assigned
      WHERE list_position(dots, list_max(dots)) IN ({probe_lit})
    )
    SELECT {id_col}, round({qdot} / ({nrm} * {qn!r}), 9) AS cosine
    FROM cand
    ORDER BY cosine DESC, {id_col} ASC
    LIMIT {k}
    """
