"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as ``binary`` columns next to a typed
metadata struct. The Spark-side plumbing — schema, partition sizing, UDF
signature, Arrow batch shape — is real and tested; the actual decode step
is STUBBED (this container has no image/audio libraries): by default
``feature_extract`` computes a deterministic fake feature vector from the
bytes' sha256, and ``decode=True`` raises NotImplementedError at the point
where a real decoder (PIL/libav) would plug in.

Scale notes: media bytes dominate row size — feature extraction uses
mapInPandas so Arrow streams batches without materializing the whole
partition; at 100 TB, set spark.sql.files.maxPartitionBytes low (64-128MB)
for media tables so a batch of rows fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("bytes", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 32

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media_df(spark, n_rows: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 256)))
        meta = {
            "width": int(rng.integers(16, 4096)) if kind == "image" else None,
            "height": int(rng.integers(16, 4096)) if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": int(rng.integers(1, 1000)) if kind == "video" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from the driver documents table:
    the text's UTF-8 bytes stand in for media payloads so the mapInPandas
    feature plumbing (sha/byte-length lineage) has a DuckDB-reproducible
    oracle; kind cycles image/audio/video by doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("bytes"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.col("n_chars") % 100 + 1).cast("int").alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def media_features_sql(table: str) -> str:
    """DuckDB twin of feature_extract(media_from_documents(...)) on the
    lineage columns (features stay a declared decode stub)."""
    return f"""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           sha256(text) AS content_sha,
           octet_length(encode(text))::BIGINT AS n_bytes
    FROM {table}
    """


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded vector."""
    h = hashlib.sha256(payload).digest()
    vals = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (vals.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def feature_extract(media: DataFrame, decode: bool = False) -> DataFrame:
    """Extract per-media feature vectors via mapInPandas over Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode:
            raise NotImplementedError(
                "real media decode requires PIL/libav — not available in this "
                "container; plug the decoder in here"
            )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # null media bytes ≡ b'' (same contract as null text content
            # elsewhere — a nullable binary column must not kill the job)
            blobs = [b"" if b is None else bytes(b) for b in pdf["bytes"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content_sha": [hashlib.sha256(b).hexdigest() for b in blobs],
                    "n_bytes": [len(b) for b in blobs],
                    "features": [_fake_features(b).tolist() for b in blobs],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index (decode stubbed — emits frame indexes + lineage, not pixels)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_idx"),
            F.sha2(F.col("bytes"), 256).alias("content_sha"),
        )
    )
