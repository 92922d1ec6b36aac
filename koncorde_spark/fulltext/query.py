"""BM25 top-k query execution over the sharded postings index.

Plan shape (document-partitioned search, scales to any corpus size):

    postings scan, PushedFilters: term IN (query terms)   ← pruned scan
      → groupBy(shard) applyInPandas(per-shard block-max WAND top-k)
      → global top-k: orderBy(score desc, doc_id asc) limit k  ← tiny

Per-shard WAND needs no cross-shard state (BM25 scores are doc-local given
global N/avgdl/df, which ride in as broadcast literals), so the heavy stage
parallelizes by shard with no shuffle of postings bytes beyond the
term-pruned scan itself.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codecs import delta_decode, varint_decode
from .indexer import read_meta
from .tokenizer import tokenize_text
from .wand import TermPostings, bm25_idf, topk_block_max_wand

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


class Bm25Index:
    """Handle to a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = read_meta(index_dir)
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.terms = spark.read.parquet(os.path.join(index_dir, "terms")).cache()
        self.docs = spark.read.parquet(os.path.join(index_dir, "docs"))
        # per-shard packed doc lengths: one row per shard, cached — avoids
        # reshuffling the docs table on every query
        self.dlpack = spark.read.parquet(os.path.join(index_dir, "dlpack")).cache()
        # term → df lookup, pulled to the driver once when the vocabulary
        # is small enough (a dict probe replaces one Spark job per query);
        # None = not yet decided, False = too large, stay distributed
        self._terms_local: dict | None | bool = None

    # vocabularies up to this size are cached driver-side (~tens of MB);
    # beyond it df lookups stay distributed (the 10^12-file regime)
    TERMS_LOCAL_MAX = 5_000_000

    def _df_for(self, q_terms: list[str]) -> dict[str, int]:
        if self._terms_local is None:
            # n_terms is carried in meta.json by the index build; fall back
            # to one count() job for indexes built before it was recorded
            n_terms = self.meta.get("n_terms")
            if n_terms is None:
                n_terms = self.terms.count()
            if n_terms <= self.TERMS_LOCAL_MAX:
                pdf = self.terms.toPandas()
                self._terms_local = dict(
                    zip(pdf["term"].tolist(), pdf["df"].astype(int).tolist())
                )
            else:
                self._terms_local = False
        if self._terms_local is not False:
            tl = self._terms_local
            return {t: tl[t] for t in q_terms if t in tl}
        rows = self.terms.where(F.col("term").isin(q_terms)).collect()
        return {r["term"]: int(r["df"]) for r in rows}

    def topk(self, query: str, k: int = 10) -> DataFrame:
        """Top-k (doc_id, score) for a free-text query, rank-deterministic."""
        q_terms = sorted(set(tokenize_text(query)))
        if not q_terms:
            return self.spark.createDataFrame([], TOPK_SCHEMA)

        meta = self.meta
        n_docs, avgdl = meta["n_docs"], meta["avgdl"]
        k1, b, block_size = meta["k1"], meta["b"], meta["block_size"]

        # global df per query term (driver-side dict probe for small
        # vocabularies; a tiny distributed lookup otherwise)
        dfs = self._df_for(q_terms)
        idf_map = {t: float(bm25_idf(n_docs, df)) for t, df in dfs.items()}
        if not idf_map:
            return self.spark.createDataFrame([], TOPK_SCHEMA)

        relevant = self.postings.where(F.col("term").isin(list(idf_map)))

        k1_, b_, bs_, avgdl_ = k1, b, block_size, avgdl
        idf_map_b = idf_map
        k_ = k

        def cogrouped(post_pdf: pd.DataFrame, pack_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(post_pdf) == 0 or len(pack_pdf) == 0:
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
            prow = pack_pdf.iloc[0]
            n_pack = int(prow["n"])
            dl_ids = delta_decode(bytes(prow["doc_ids"]), n_pack).astype(np.int64)
            dl_vals = varint_decode(bytes(prow["dls"]), n_pack).astype(np.float64)

            tps: list[TermPostings] = []
            for _, row in post_pdf.iterrows():
                n = int(row["df"])
                ids = delta_decode(bytes(row["doc_ids"]), n).astype(np.int64)
                tfs = varint_decode(bytes(row["tfs"]), n).astype(np.float64)
                dls = dl_vals[np.searchsorted(dl_ids, ids)]
                idf = idf_map_b[row["term"]]
                tfpart = tfs * (k1_ + 1.0) / (tfs + k1_ * (1.0 - b_ + b_ * dls / avgdl_))
                tps.append(
                    TermPostings(
                        doc_ids=ids,
                        scores=idf * tfpart,
                        block_last=np.asarray(row["block_last"], dtype=np.int64),
                        block_ub=idf * np.asarray(row["block_max"], dtype=np.float64),
                        block_size=bs_,
                    )
                )
            ids, scores = topk_block_max_wand(tps, k_)
            return pd.DataFrame({"doc_id": ids, "score": scores})

        per_shard_topk = (
            relevant.groupBy("shard")
            .cogroup(self.dlpack.groupBy("shard"))
            .applyInPandas(lambda pl, pr: cogrouped(pl, pr), schema=TOPK_SCHEMA)
        )
        return per_shard_topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
