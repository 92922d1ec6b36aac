"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema mandated by BASELINE.json input_hint:
(repo:string, path:string, commit:string, lang:string, content:string).
Seed 42; Zipf identifier vocabulary + guaranteed hot terms ('import',
'return', 'def', 'function') to exercise skew handling.

Also: an adapter deriving the same shape from the driver's
/root/testdata documents.parquet so driver-gated queries run on the
provided tables rather than synthesized ones.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_EXTS = ["py", "js", "ts", "go", "java"]
_LANGS = {"py": "python", "js": "javascript", "ts": "typescript", "go": "go", "java": "java"}
_HOT = ["import", "return", "def", "function"]


def synthetic_corpus_pandas(n_rows: int = 5000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"ident_{i:05d}" for i in range(10_000)], dtype=object)
    # Zipf weights over the vocab
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf_w = 1.0 / ranks
    zipf_w /= zipf_w.sum()

    repos = []
    paths = []
    commits = []
    langs = []
    contents = []
    # skewed language mix: py 40%
    ext_w = np.array([0.4, 0.2, 0.15, 0.15, 0.10])
    for i in range(n_rows):
        repo = f"org{i % 20}/repo{i % 137}"
        ext = _EXTS[rng.choice(5, p=ext_w)]
        path = f"src/dir{i % 53}/file_{i}.{ext}"
        commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
        n_tok = int(rng.integers(50, 2001))
        body = rng.choice(vocab, size=n_tok, p=zipf_w)
        # inject hot terms at high frequency (~8% of tokens)
        n_hot = max(1, n_tok // 12)
        hot_pos = rng.choice(n_tok, size=min(n_hot, n_tok), replace=False)
        body[hot_pos] = rng.choice(np.array(_HOT, dtype=object), size=len(hot_pos))
        # newline every ~12 tokens
        parts = []
        for j in range(0, n_tok, 12):
            parts.append(" ".join(body[j : j + 12]))
        content = "\n".join(parts)
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(_LANGS[ext])
        contents.append(content)

    return pd.DataFrame(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs, "content": contents}
    )


def synthetic_corpus_df(spark, n_rows: int = 5000, seed: int = 42, partitions: int = 8):
    pdf = synthetic_corpus_pandas(n_rows, seed)
    return spark.createDataFrame(pdf).repartition(partitions)


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
