"""Distributed inverted-index builder: corpus → sharded postings + manifests.

Architecture (document-partitioned index, the standard at web scale):

- ``doc_id`` = top-63-bits of sha256(repo, path, commit) — stable across
  runs and clusters, so resume and re-index produce byte-identical postings.
- ``shard`` = doc_id % n_shards. Every posting list is split by doc shard,
  which (a) bounds the size of any single (term, shard) merge group — this
  is the **skew control**: hot terms like ``import`` are salted across all
  shards by construction — and (b) lets BM25 top-k run WAND per shard in
  parallel with no cross-shard state (scores are doc-local).
- Stage 1 ``docs``: one mapInPandas pass → (doc_id, shard, dl, content_sha,
  repo, path, commit, lang); global N/avgdl aggregated; parquet
  partitioned by shard.
- Stage 2 ``postings``: mapInPandas tokenize + per-input-partition partial
  postings (term, shard, packed doc/tf/dl arrays) — map-side combine that
  cuts shuffle volume to packed bytes — then ONE shuffle
  (groupBy term, shard) and applyInPandas merge → docID-sorted
  delta+varint postings with 128-entry block-max metadata.
- Stage 3 ``terms``: per-term global df (groupBy term — map-side partial
  aggregation handles the skew) + meta.json.

Every stage writes per-shard manifests with row counts and an
order-independent sha256-lineage digest; ``build_index`` skips stages/shards
whose manifests match, making the build resumable mid-pipeline.

Scale notes (100 TB / 1e12 files): n_shards rises with corpus size
(keep docs-per-shard ≲ 50M); all heavy operators are narrow maps + one
repartition-by-key shuffle; no collect, no driver-side loops.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codecs import delta_decode, delta_encode, varint_decode, varint_encode
from .tokenizer import tokenize_series

K1_DEFAULT = 1.2
B_DEFAULT = 0.75
BLOCK_SIZE = 128


@dataclass(frozen=True)
class IndexConfig:
    n_shards: int = 8
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    block_size: int = BLOCK_SIZE

    def fingerprint(self) -> str:
        return hashlib.sha256(json.dumps(asdict(self), sort_keys=True).encode()).hexdigest()[:16]


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("dl", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("doc_ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("dls", T.BinaryType()),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("df", T.LongType()),
        T.StructField("doc_ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("block_last", T.ArrayType(T.LongType())),
        T.StructField("block_max", T.ArrayType(T.DoubleType())),
    ]
)


def sql_shard_col(n_shards: int):
    """Catalyst expression computing the same shard as :func:`doc_id_of`.

    doc_id = top64(sha256) >> 1 = T60*8 + (hex16 >> 1), where T60 is the
    first 15 hex chars (60 bits, < 2^60 so T60*8 fits a signed bigint).
    Keeps the resume-path shard filter JVM-side so Catalyst can pipeline it
    with the scan instead of round-tripping rows through Python.
    """
    sha = "sha2(concat_ws(char(0), repo, path, commit), 256)"
    t60 = f"cast(conv(substring({sha}, 1, 15), 16, 10) as bigint)"
    h16 = f"cast(conv(substring({sha}, 16, 1), 16, 10) as bigint)"
    return F.expr(f"pmod({t60} * 8 + ({h16} div 2), {n_shards})")


def doc_id_of(repo: str, path: str, commit: str) -> int:
    """Stable 63-bit doc id from identity columns (sha256 prefix)."""
    h = hashlib.sha256(f"{repo}\x00{path}\x00{commit}".encode()).digest()
    return int.from_bytes(h[:8], "big") >> 1


def _doc_ids_series(repo: pd.Series, path: pd.Series, commit: pd.Series) -> np.ndarray:
    return np.fromiter(
        (doc_id_of(r, p, c) for r, p, c in zip(repo, path, commit)),
        dtype=np.int64,
        count=len(repo),
    )


# ---------------------------------------------------------------------------
# stage 1: docs
# ---------------------------------------------------------------------------


def _docs_stage_fn(n_shards: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids = _doc_ids_series(pdf["repo"], pdf["path"], pdf["commit"])
            tokens = tokenize_series(pdf["content"])
            dl = tokens.str.len().fillna(0).to_numpy(dtype=np.int64)
            shas = [hashlib.sha256(c.encode()).hexdigest() for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "shard": (doc_ids % n_shards).astype(np.int32),
                    "dl": dl,
                    "content_sha": shas,
                    "repo": pdf["repo"].to_numpy(),
                    "path": pdf["path"].to_numpy(),
                    "commit": pdf["commit"].to_numpy(),
                    "lang": pdf["lang"].to_numpy(),
                }
            )

    return run


# ---------------------------------------------------------------------------
# stage 2: postings
# ---------------------------------------------------------------------------


def _partials_fn(n_shards: int):
    """Tokenize + per-input-partition partial postings (map-side combine)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids = _doc_ids_series(pdf["repo"], pdf["path"], pdf["commit"])
            shards = (doc_ids % n_shards).astype(np.int32)
            token_lists = tokenize_series(pdf["content"])
            dls = token_lists.str.len().fillna(0).to_numpy(dtype=np.int64)

            # flatten to (term, row) pairs, then tf per (row, term) via
            # np.unique over a combined key — vectorized, no Counter loops
            lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(pdf))
            if lens.sum() == 0:
                continue
            flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in token_lists])
            flat_rows = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
            term_codes, term_uniques = pd.factorize(pd.Series(flat_terms))
            combo = flat_rows * len(term_uniques) + term_codes
            uniq_combo, tf = np.unique(combo, return_counts=True)
            u_rows = (uniq_combo // len(term_uniques)).astype(np.int64)
            u_terms = (uniq_combo % len(term_uniques)).astype(np.int64)

            entry = pd.DataFrame(
                {
                    "tcode": u_terms,
                    "shard": shards[u_rows],
                    "doc_id": doc_ids[u_rows],
                    "tf": tf.astype(np.int64),
                    "dl": dls[u_rows],
                }
            )
            out_rows = []
            for (tcode, shard), grp in entry.groupby(["tcode", "shard"], sort=False):
                order = np.argsort(grp["doc_id"].to_numpy(), kind="stable")
                ids = grp["doc_id"].to_numpy()[order]
                out_rows.append(
                    (
                        term_uniques[tcode],
                        int(shard),
                        len(ids),
                        delta_encode(ids),
                        varint_encode(grp["tf"].to_numpy()[order]),
                        varint_encode(grp["dl"].to_numpy()[order]),
                    )
                )
            yield pd.DataFrame(
                out_rows, columns=["term", "shard", "n", "doc_ids", "tfs", "dls"]
            )

    return run


def _merge_fn(k1: float, b: float, avgdl: float, block_size: int):
    """Merge partials for one (term, shard) group → final posting row."""

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, shard = key
        ids_parts, tf_parts, dl_parts = [], [], []
        for _, row in pdf.iterrows():
            n = int(row["n"])
            ids_parts.append(delta_decode(bytes(row["doc_ids"]), n).astype(np.int64))
            tf_parts.append(varint_decode(bytes(row["tfs"]), n).astype(np.int64))
            dl_parts.append(varint_decode(bytes(row["dls"]), n).astype(np.int64))
        ids = np.concatenate(ids_parts)
        tfs = np.concatenate(tf_parts)
        dls = np.concatenate(dl_parts)
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order], tfs[order], dls[order]

        # per-entry idf-free score part; block max over fixed-size blocks
        norm = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        nblocks = (len(ids) + block_size - 1) // block_size
        block_last = [int(ids[min((i + 1) * block_size, len(ids)) - 1]) for i in range(nblocks)]
        block_max = [
            float(norm[i * block_size : (i + 1) * block_size].max()) for i in range(nblocks)
        ]
        return pd.DataFrame(
            [
                (
                    term,
                    int(shard),
                    len(ids),
                    delta_encode(ids),
                    varint_encode(tfs),
                    block_last,
                    block_max,
                )
            ],
            columns=["term", "shard", "df", "doc_ids", "tfs", "block_last", "block_max"],
        )

    return merge


# ---------------------------------------------------------------------------
# manifests / resume
# ---------------------------------------------------------------------------


def _manifest_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, "_manifests", stage)


def _write_manifests(out_dir: str, stage: str, rows: list[dict], fingerprint: str):
    d = _manifest_dir(out_dir, stage)
    os.makedirs(d, exist_ok=True)
    for r in rows:
        r = dict(r)
        r["config"] = fingerprint
        r["written_at"] = time.time()
        with open(os.path.join(d, f"shard-{r['shard']}.json"), "w") as f:
            json.dump(r, f)


def _read_manifests(out_dir: str, stage: str, fingerprint: str) -> dict[int, dict]:
    d = _manifest_dir(out_dir, stage)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in os.listdir(d):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as f:
            m = json.load(f)
        if m.get("config") == fingerprint:
            out[int(m["shard"])] = m
    return out


def _shard_lineage(docs: DataFrame) -> list[dict]:
    """Per-shard row count + order-independent sha256-lineage digest."""
    rows = (
        docs.groupBy("shard")
        .agg(
            F.count("*").alias("rows"),
            F.sum("dl").alias("tokens"),
            F.expr("bit_xor(xxhash64(content_sha))").alias("lineage_xor"),
        )
        .collect()
    )
    return [
        {
            "shard": int(r["shard"]),
            "rows": int(r["rows"]),
            "tokens": int(r["tokens"]),
            "lineage_xor": int(r["lineage_xor"]),
        }
        for r in rows
    ]


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    config: IndexConfig = IndexConfig(),
    resume: bool = True,
) -> dict:
    """Build (or resume) the index; returns the meta dict.

    ``corpus`` must have columns (repo, path, commit, lang, content) —
    the BASELINE.json input_hint shape (Iceberg table or parquet).
    """
    fp = config.fingerprint()
    metrics: dict[str, float] = {}
    docs_path = os.path.join(out_dir, "docs")
    postings_path = os.path.join(out_dir, "postings")
    terms_path = os.path.join(out_dir, "terms")
    meta_path = os.path.join(out_dir, "meta.json")

    # -- stage 1: docs ----------------------------------------------------
    t0 = time.time()
    docs_manifests = _read_manifests(out_dir, "docs", fp) if resume else {}
    if len(docs_manifests) == config.n_shards:
        docs = spark.read.parquet(docs_path)
    else:
        docs = corpus.mapInPandas(_docs_stage_fn(config.n_shards), schema=DOCS_SCHEMA)
        docs.write.mode("overwrite").partitionBy("shard").parquet(docs_path)
        docs = spark.read.parquet(docs_path)
        lineage = _shard_lineage(docs)
        present = {r["shard"] for r in lineage}
        lineage += [
            {"shard": s, "rows": 0, "tokens": 0, "lineage_xor": 0}
            for s in range(config.n_shards)
            if s not in present
        ]
        _write_manifests(out_dir, "docs", lineage, fp)
    metrics["docs_sec"] = time.time() - t0

    stats = docs.agg(
        F.count("*").alias("N"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["N"]), float(stats["avgdl"] or 1.0)

    # -- stage 2: postings --------------------------------------------------
    t0 = time.time()
    post_manifests = _read_manifests(out_dir, "postings", fp) if resume else {}
    missing = [s for s in range(config.n_shards) if s not in post_manifests]
    if missing:
        src = corpus
        if len(missing) < config.n_shards:
            # resume path: rebuild only the missing shards — recompute the
            # shard from identity columns so the filter prunes early
            missing_arr = F.array(*[F.lit(s) for s in missing])
            src = corpus.where(
                F.array_contains(missing_arr, sql_shard_col(config.n_shards).cast("int"))
            )
        partials = src.mapInPandas(_partials_fn(config.n_shards), schema=PARTIAL_SCHEMA)
        merged = partials.groupBy("term", "shard").applyInPandas(
            _merge_fn(config.k1, config.b, avgdl, config.block_size),
            schema=POSTINGS_SCHEMA,
        )
        writer = merged.write.partitionBy("shard")
        if len(missing) < config.n_shards:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            writer.mode("overwrite").parquet(postings_path)
        else:
            writer.mode("overwrite").parquet(postings_path)
        postings = spark.read.parquet(postings_path)
        pl = (
            postings.groupBy("shard")
            .agg(F.count("*").alias("rows"), F.sum("df").alias("tokens"))
            .collect()
        )
        man = [
            {"shard": int(r["shard"]), "rows": int(r["rows"]), "tokens": int(r["tokens"]),
             "lineage_xor": docs_lineage_xor(out_dir, int(r["shard"]), fp)}
            for r in pl
        ]
        present = {m["shard"] for m in man}
        man += [
            {"shard": s, "rows": 0, "tokens": 0, "lineage_xor": 0}
            for s in range(config.n_shards)
            if s not in present
        ]
        _write_manifests(out_dir, "postings", man, fp)
    metrics["postings_sec"] = time.time() - t0

    # -- stage 3: term stats + meta ---------------------------------------
    t0 = time.time()
    postings = spark.read.parquet(postings_path)
    (
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"))
        .write.mode("overwrite")
        .parquet(terms_path)
    )
    metrics["terms_sec"] = time.time() - t0

    meta = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "k1": config.k1,
        "b": config.b,
        "n_shards": config.n_shards,
        "block_size": config.block_size,
        "config": fp,
        "metrics": metrics,
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def docs_lineage_xor(out_dir: str, shard: int, fp: str) -> int:
    m = _read_manifests(out_dir, "docs", fp).get(shard)
    return int(m["lineage_xor"]) if m else 0


def read_meta(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "meta.json")) as f:
        return json.load(f)
