"""Multimodal columns: opaque binary media + typed metadata + REAL decode.

Images/audio/video are carried as ``binary`` columns next to a typed
metadata struct. Decode is real, with no external dependencies
(``media_codecs``: PNG/BMP/PPM images, PCM WAV audio, Y4M video — PIL is
used as an import-guarded fallback for formats outside that matrix when
present). ``feature_extract(decode=True)`` computes features from actual
pixels/samples/frames; bytes outside the supported matrix raise a typed
``UnsupportedMediaError`` naming the sniffed magic — never a silent fake.
``decode=False`` (default) computes lineage-only features (sha256-seeded)
for pipelines that only need dedup/provenance columns; that path is what
the DuckDB driver oracle checks (media_features), since SQL cannot decode
pixels.

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
    """Deterministic media table of REAL decodable payloads (PNG / PCM-WAV /
    Y4M via media_codecs encoders) matching MEDIA_SCHEMA — so end-to-end
    tests exercise the actual decoders, not just the plumbing."""
    from . import media_codecs as mc

    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.integers(4, 48)), int(rng.integers(4, 48))
            payload = mc.encode_png(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            meta = {"width": w, "height": h, "sample_rate": None, "n_frames": None,
                    "mime": "image/png"}
        elif kind == "audio":
            n = int(rng.integers(64, 2048))
            payload = mc.encode_wav(rng.uniform(-0.8, 0.8, n), 16000)
            meta = {"width": None, "height": None, "sample_rate": 16000,
                    "n_frames": None, "mime": "audio/wav"}
        else:
            nf = int(rng.integers(1, 12))
            frames = [rng.integers(0, 256, (16, 24), dtype=np.uint8) for _ in range(nf)]
            payload = mc.encode_y4m(frames)
            meta = {"width": 24, "height": 16, "sample_rate": None,
                    "n_frames": nf, "mime": "video/x-yuv4mpeg"}
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
    """Deterministic lineage-only vector: sha256-seeded (decode=False path)."""
    h = hashlib.sha256(payload).digest()
    vals = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (vals.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def _decoded_features(blob: bytes) -> np.ndarray:
    """Real features from decoded media. Fixed FEATURE_DIM layout, leading
    tag = modality (1 image / 2 audio / 3 video); zero-padded tail.

    - image: [1, w, h, c, luma mean, luma std, 16-bin luma histogram
      (density), per-channel means (≤4)]
    - audio: [2, sample_rate, n_samples, n_channels, rms, zero-crossing
      rate, 16 mean |rFFT| band magnitudes]
    - video: [3, w, h, n_frames, luma mean/std over all frames, mean luma
      of up to 16 evenly-sampled frames]
    """
    from . import media_codecs as mc

    out = np.zeros(FEATURE_DIM, dtype=np.float64)
    kind = mc.sniff(blob)  # raises UnsupportedMediaError outside the matrix
    if kind in ("png", "bmp", "ppm", "pgm"):
        arr = mc.decode_image(blob)
        lum = mc.luma(arr)
        hist = np.histogram(lum, bins=16, range=(0.0, 256.0))[0]
        hist = hist / max(lum.size, 1)
        ch_means = arr.reshape(-1, arr.shape[2]).mean(axis=0)
        vals = [1, arr.shape[1], arr.shape[0], arr.shape[2], lum.mean(), lum.std()]
        out[: len(vals)] = vals
        out[6:22] = hist
        out[22 : 22 + len(ch_means)] = ch_means[:4]
    elif kind == "wav":
        sr, x = mc.decode_wav(blob)
        mono = x.mean(axis=1)
        zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
        vals = [2, sr, x.shape[0], x.shape[1], float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0, zcr]
        out[: len(vals)] = vals
        if len(mono):
            mag = np.abs(np.fft.rfft(mono))
            bands = np.array_split(mag, 16)
            out[6:22] = [b.mean() if len(b) else 0.0 for b in bands]
    elif kind == "y4m":
        w, h, frames = mc.decode_y4m(blob)
        stack = np.stack(frames).astype(np.float64) if frames else np.zeros((0, h, w))
        vals = [3, w, h, len(frames), stack.mean() if len(frames) else 0.0, stack.std() if len(frames) else 0.0]
        out[: len(vals)] = vals
        if len(frames):
            idx = np.linspace(0, len(frames) - 1, min(16, len(frames))).astype(int)
            means = stack[idx].mean(axis=(1, 2))
            out[6 : 6 + len(means)] = means
    return out.astype(np.float32)


def feature_extract(media: DataFrame, decode: bool = False) -> DataFrame:
    """Per-media feature vectors via mapInPandas over Arrow batches.

    ``decode=True``: REAL decode (media_codecs matrix; raises
    UnsupportedMediaError for bytes outside it — empty payloads included).
    ``decode=False``: lineage-only features (sha/byte-length provenance),
    the SQL-oracle-checkable path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        featurize = _decoded_features if decode else _fake_features
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
                    "features": [featurize(b).tolist() for b in blobs],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling on metadata: one output row per sampled frame
    index plus content lineage (no decode — pure Catalyst explode)."""
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


def frame_sample_sql(table: str, every_n: int = 10) -> str:
    """DuckDB twin of frame_sample(media_from_documents(...)): the same
    per-video frame-index explosion + content lineage (sha256 of the
    text-derived payload), SQL-side via range unnest."""
    return f"""
    SELECT doc_id AS media_id,
           unnest(range(0, (n_chars % 100 + 1)::BIGINT, {every_n})) AS frame_idx,
           sha256(text) AS content_sha
    FROM {table}
    WHERE doc_id % 3 = 2
    """


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("luma_mean", T.FloatType()),
        T.StructField("luma_std", T.FloatType()),
    ]
)


def frame_sample_decoded(media: DataFrame, every_n: int = 10) -> DataFrame:
    """REAL video frame sampling: decode Y4M payloads and emit one row per
    sampled frame with actual luma statistics (mapInPandas over Arrow
    batches; non-video rows are filtered out up front)."""
    from . import media_codecs as mc

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means, stds = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                blob = b"" if blob is None else bytes(blob)
                _w, _h, frames = mc.decode_y4m(blob)
                for fi in range(0, len(frames), every_n):
                    lum = frames[fi].astype(np.float64)
                    ids.append(mid)
                    idxs.append(fi)
                    means.append(lum.mean())
                    stds.append(lum.std())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "luma_mean": means, "luma_std": stds}
            )

    return media.where(F.col("kind") == "video").select("media_id", "bytes").mapInPandas(
        run, schema=FRAME_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# image perceptual hashing (near-duplicate images)
# ---------------------------------------------------------------------------

# 10 x 6 block grid -> 60-bit average hash: deliberately 60 bits so image
# hashes slot directly into the text SimHash pairing machinery
# (dedup.simhash_candidate_pairs bands 60 bits into 4 x 15-bit chunks)
AHASH_GRID = (10, 6)  # (cols, rows)


def _ahash_from_luma(lum: "np.ndarray", grid=AHASH_GRID) -> int:
    """60-bit average hash of one luma plane: block-mean downsample to
    cols x rows (integer area averaging via reduceat — deterministic, no
    resampling kernel), then bit i = block_i > mean(blocks). Bit order is
    row-major from the top-left, bit 59 first (msb)."""
    cols, rows = grid
    h, w = lum.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    # images smaller than the grid: repeat pixels up to grid size so every
    # block covers >= 1 source pixel (nearest-neighbour upscale — exact,
    # deterministic, and hash-stable under further exact upscales)
    if h < rows:
        lum = np.repeat(lum, -(-rows // h), axis=0)
        h = lum.shape[0]
    if w < cols:
        lum = np.repeat(lum, -(-cols // w), axis=1)
        w = lum.shape[1]
    row_idx = (np.arange(rows, dtype=np.int64) * h) // rows
    col_idx = (np.arange(cols, dtype=np.int64) * w) // cols
    # area sums per band: reduceat over rows then columns
    rs = np.add.reduceat(lum.astype(np.float64), row_idx, axis=0)
    blocks = np.add.reduceat(rs, col_idx, axis=1)
    # per-block pixel counts (uneven splits at the tail)
    rh = np.diff(np.append(row_idx, h)).astype(np.float64)
    cw = np.diff(np.append(col_idx, w)).astype(np.float64)
    blocks = blocks / (rh[:, None] * cw[None, :])
    return _bits_to_int((blocks > blocks.mean()).ravel())


def image_ahash(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Per-image 60-bit perceptual average-hash over the DECODED luma
    plane: (id, simhash, width, height). The output column is named
    ``simhash`` on purpose — downstream near-dup candidate pairing is
    exactly dedup.simhash_candidate_pairs (60-bit banding + Hamming
    verify), so images reuse the text near-dup machinery end to end.

    One narrow mapInPandas (decode stays in the worker, Arrow-batched);
    non-image payloads raise UnsupportedMediaError per the codec matrix —
    filter ``kind == 'image'`` first."""
    from . import media_codecs as mc

    schema = T.StructType(
        [
            media.schema[id_col],
            T.StructField("simhash", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf["bytes"]):
                arr = mc.decode_image(bytes(blob))
                lum = mc.luma(arr)
                rows.append(
                    (
                        mid,
                        _ahash_from_luma(lum),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "simhash", "width", "height"]
            )

    return media.select(id_col, "bytes").mapInPandas(run, schema=schema)


def image_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate image pairs — media_near_dup_pairs(kind='image')."""
    return media_near_dup_pairs(media, "image", max_hamming, id_col)


def _bits_to_int(bits: "np.ndarray") -> int:
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def _audio_fingerprint(samples: "np.ndarray") -> int:
    """60-bit audio fingerprint: mix to mono, split into 60 equal time
    windows, bit i = window RMS energy > mean energy (a coarse
    Haitsma-Kalker-style energy envelope — robust to resampling and
    gain, cheap and deterministic). Shorter-than-60-sample clips repeat
    each sample in place (np.repeat — the same nearest-neighbour rule as
    tiny images, so a clip and its exact k× upsample fingerprint
    identically)."""
    mono = samples.mean(axis=1).astype(np.float64)
    n = mono.shape[0]
    if n < 1:
        raise ValueError("empty audio")
    if n < 60:
        mono = np.repeat(mono, -(-60 // n))
        n = mono.shape[0]
    idx = (np.arange(60, dtype=np.int64) * n) // 60
    sq = np.add.reduceat(mono * mono, idx)
    cnt = np.diff(np.append(idx, n)).astype(np.float64)
    energy = sq / cnt
    return _bits_to_int(energy > energy.mean())


def audio_fingerprint(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Per-clip 60-bit energy-envelope fingerprint over DECODED samples:
    (id, simhash, sample_rate, n_samples). Same pairing contract as
    image_ahash — the column is named ``simhash`` so near-dup candidate
    generation is dedup.simhash_candidate_pairs unchanged."""
    from . import media_codecs as mc

    schema = T.StructType(
        [
            media.schema[id_col],
            T.StructField("simhash", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf["bytes"]):
                rate, samples = mc.decode_wav(bytes(blob))
                rows.append(
                    (mid, _audio_fingerprint(samples),
                     int(rate), int(samples.shape[0]))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "simhash", "sample_rate", "n_samples"]
            )

    return media.select(id_col, "bytes").mapInPandas(run, schema=schema)


def video_phash(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Per-video 60-bit perceptual hash: decode, average the luma planes
    over time, spatial 10x6 block-mean ahash of the mean frame (the same
    kernel as image_ahash) — robust to frame-rate changes and small
    temporal edits, cheap at any length. (id, simhash, width, height,
    n_frames)."""
    from . import media_codecs as mc

    schema = T.StructType(
        [
            media.schema[id_col],
            T.StructField("simhash", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf["bytes"]):
                w, h, frames = mc.decode_y4m(bytes(blob))
                if not frames:
                    raise ValueError("empty video (no frames)")
                # running accumulator: one frame-sized float64 buffer
                # instead of materializing the whole clip as float64
                acc = np.zeros((h, w), dtype=np.float64)
                for f in frames:
                    acc += f
                mean_luma = acc / len(frames)
                rows.append(
                    (mid, _ahash_from_luma(mean_luma), int(w), int(h),
                     int(len(frames)))
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "simhash", "width", "height", "n_frames"],
            )

    return media.select(id_col, "bytes").mapInPandas(run, schema=schema)


def media_near_dup_pairs(
    media: DataFrame,
    kind: str,
    max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate pairs WITHIN one modality ('image' / 'audio' /
    'video'): decode → 60-bit perceptual hash → the shared SimHash
    banding + Hamming verify. Cross-modality hashes are not comparable
    by construction, so the caller filters its media table to one kind."""
    from .dedup import simhash_candidate_pairs

    hasher = {
        "image": image_ahash,
        "audio": audio_fingerprint,
        "video": video_phash,
    }.get(kind)
    if hasher is None:
        raise ValueError(f"kind must be image|audio|video, got {kind!r}")
    return simhash_candidate_pairs(
        hasher(media, id_col), id_col=id_col, max_hamming=max_hamming
    )
