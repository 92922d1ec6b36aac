"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema mandated by BASELINE.json input_hint:
(repo:string, path:string, commit:string, lang:string, content:string).
Zipf identifier vocabulary + guaranteed hot terms ('import', 'return',
'def', 'function') to exercise skew handling.

Generation is **per-row seeded** (rng derived from seed + row index), so
the distributed generator (mapInPandas over spark.range) produces the
same rows as the pandas generator regardless of partitioning — the
property the resume/byte-identity tests rely on.

Also: an adapter deriving the same shape from the driver's
/root/testdata documents.parquet so driver-gated queries run on the
provided tables rather than synthesized ones.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

_EXTS = ["py", "js", "ts", "go", "java"]
_LANGS = {"py": "python", "js": "javascript", "ts": "typescript", "go": "go", "java": "java"}
_HOT = np.array(["import", "return", "def", "function"], dtype=object)
_EXT_W = np.array([0.4, 0.2, 0.15, 0.15, 0.10])
_VOCAB_SIZE = 10_000


def _vocab_and_cdf() -> tuple[np.ndarray, np.ndarray]:
    vocab = np.array([f"ident_{i:05d}" for i in range(_VOCAB_SIZE)], dtype=object)
    ranks = np.arange(1, _VOCAB_SIZE + 1, dtype=np.float64)
    w = 1.0 / ranks
    return vocab, np.cumsum(w / w.sum())


def _gen_row(i: int, seed: int, vocab: np.ndarray, cdf: np.ndarray) -> tuple:
    rng = np.random.default_rng((seed << 32) ^ i)
    repo = f"org{i % 20}/repo{i % 137}"
    ext = _EXTS[int(rng.choice(5, p=_EXT_W))]
    path = f"src/dir{i % 53}/file_{i}.{ext}"
    commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
    n_tok = int(rng.integers(50, 2001))
    body = vocab[np.searchsorted(cdf, rng.random(n_tok))]
    n_hot = max(1, n_tok // 12)
    hot_pos = rng.choice(n_tok, size=min(n_hot, n_tok), replace=False)
    body[hot_pos] = _HOT[rng.integers(0, len(_HOT), size=len(hot_pos))]
    parts = [" ".join(body[j : j + 12]) for j in range(0, n_tok, 12)]
    return repo, path, commit, _LANGS[ext], "\n".join(parts)


def synthetic_corpus_pandas(n_rows: int = 5000, seed: int = 42) -> pd.DataFrame:
    vocab, cdf = _vocab_and_cdf()
    rows = [_gen_row(i, seed, vocab, cdf) for i in range(n_rows)]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synthetic_corpus_df(spark, n_rows: int = 5000, seed: int = 42, partitions: int = 8):
    """Distributed generator: spark.range → mapInPandas, no driver data."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab, cdf = _vocab_and_cdf()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = [_gen_row(int(i), seed, vocab, cdf) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(gen, schema=schema)


REQUIRED_COLUMNS = ("repo", "path", "commit", "lang", "content")


def load_corpus(spark, source: str):
    """Load the input_hint corpus from any supported source.

    - ``table:<name>`` or ``iceberg:<name>`` → ``spark.read.table`` (the
      Iceberg path: Spark reads Iceberg through its catalog integration,
      e.g. ``iceberg:prod.code.files``; also covers Hive/temp tables);
    - a bare catalog-qualified name (dots, no slashes) → same;
    - anything else → parquet path.

    Validates the BASELINE.json input_hint schema
    (repo, path, commit, lang, content) before returning.
    """
    if source.startswith(("table:", "iceberg:")):
        df = spark.read.table(source.split(":", 1)[1])
    elif "." in source and "/" not in source and not source.endswith(".parquet"):
        df = spark.read.table(source)
    else:
        df = spark.read.parquet(source)
    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus source {source!r} is missing required columns {missing}; "
            f"expected {list(REQUIRED_COLUMNS)} (BASELINE.json input_hint)"
        )
    return df.select(*REQUIRED_COLUMNS)


def corpus_from_documents(spark, sf_dir: str):
    """Adapter: driver documents.parquet → input_hint corpus shape."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("testdata/"), F.col("source")).alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.col("text"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
