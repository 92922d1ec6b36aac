"""media_codecs unit tests: round-trips, PNG filter coverage, sniffing.

The PNG encoder only emits filter-0 scanlines, so the Sub/Up/Average/
Paeth unfilter paths are exercised by FORWARD-FILTERING known pixels
with the spec's reference equations (RFC 2083 §6) and asserting the
decoder reconstructs the original exactly.
"""

import struct
import zlib

import numpy as np
import pytest

from koncorde_spark.pipeline import media_codecs as mc


class TestRoundTrips:
    @pytest.mark.parametrize("c", [1, 2, 3, 4])
    def test_png(self, c):
        rng = np.random.default_rng(c)
        a = rng.integers(0, 256, (13, 17, c), dtype=np.uint8)
        assert (mc.decode_png(mc.encode_png(a)) == a).all()

    def test_png_gray_2d_input(self):
        g = np.arange(45, dtype=np.uint8).reshape(5, 9)
        assert (mc.decode_png(mc.encode_png(g))[:, :, 0] == g).all()

    def test_bmp_odd_width_padding(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
        assert (mc.decode_bmp(mc.encode_bmp(a)) == a).all()

    @pytest.mark.parametrize("c", [1, 3])
    def test_ppm_pgm(self, c):
        rng = np.random.default_rng(c)
        a = rng.integers(0, 256, (6, 8, c), dtype=np.uint8)
        assert (mc.decode_ppm(mc.encode_ppm(a)) == a).all()

    def test_wav_mono_and_stereo(self):
        x = (np.sin(np.linspace(0, 40, 1600)) * 0.5).astype(np.float32)
        sr, y = mc.decode_wav(mc.encode_wav(x, 8000))
        assert sr == 8000 and y.shape == (1600, 1)
        assert np.abs(y[:, 0] - x).max() < 1e-3
        sr, y2 = mc.decode_wav(mc.encode_wav(np.stack([x, -x], 1), 44100))
        assert sr == 44100 and y2.shape == (1600, 2)

    def test_y4m_frames(self):
        rng = np.random.default_rng(2)
        frames = [rng.integers(0, 256, (12, 16), dtype=np.uint8) for _ in range(4)]
        w, h, got = mc.decode_y4m(mc.encode_y4m(frames))
        assert (w, h, len(got)) == (16, 12, 4)
        assert all((a == b).all() for a, b in zip(frames, got))


def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter `arr` per the PNG spec with the given per-row filter
    types and assemble a valid PNG (test-side reference implementation)."""
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    a32 = arr.astype(np.int32)
    stride = w * c
    flat = a32.reshape(h, stride)
    raw = bytearray()
    for y, f in enumerate(filters):
        row = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(c, dtype=np.int32), row[:-c]])
        ul = np.concatenate([np.zeros(c, dtype=np.int32), prev[:-c]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = (row - left) & 0xFF
        elif f == 2:
            enc = (row - prev) & 0xFF
        elif f == 3:
            enc = (row - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = (row - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


class TestPngFilters:
    @pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("c", [1, 3, 4])
    def test_single_filter_type(self, f, c):
        rng = np.random.default_rng(f * 10 + c)
        arr = rng.integers(0, 256, (7, 9, c), dtype=np.uint8)
        data = _png_with_filters(arr, [f] * 7)
        assert (mc.decode_png(data) == arr).all()

    def test_mixed_filters(self):
        rng = np.random.default_rng(9)
        arr = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
        data = _png_with_filters(arr, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
        assert (mc.decode_png(data) == arr).all()


class TestContracts:
    def test_sniff_rejects_unknown(self):
        with pytest.raises(mc.UnsupportedMediaError, match="unsupported media magic"):
            mc.sniff(b"\xff\xd8\xff\xe0jpeg")

    def test_sniff_rejects_empty(self):
        with pytest.raises(mc.UnsupportedMediaError):
            mc.sniff(b"")

    def test_png_variant_outside_matrix(self):
        # 16-bit depth header
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

        def chunk(ctype, payload):
            crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
            return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

        data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
            b"IDAT", zlib.compress(b"\x00" * 26)
        ) + chunk(b"IEND", b"")
        with pytest.raises(mc.UnsupportedMediaError, match="outside matrix"):
            mc.decode_png(data)

    def test_resize_nearest(self):
        arr = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
        out = mc.resize_nearest(arr, 8, 4)
        assert out.shape == (4, 8, 3)
        assert (out[0, 0] == arr[0, 0]).all() and (out[-1, -1] == arr[-1, -1]).all()

    def test_luma_bt601(self):
        arr = np.zeros((1, 1, 3), dtype=np.uint8)
        arr[0, 0] = [255, 0, 0]
        assert abs(mc.luma(arr)[0, 0] - 0.299 * 255) < 1e-9


class TestY4mColorspaceVariants:
    """C420jpeg / C420mpeg2 / C420paldv are 4:2:0 siting variants with
    identical frame byte counts — they must decode (ADVICE r3: the old
    suffix-rstrip never matched them); 4-plane C444alpha must stay
    rejected (a prefix match on '444' would mis-size its frames)."""

    @staticmethod
    def _y4m_with_colorspace(cs: str, frames, chroma_ratio: float) -> bytes:
        h, w = frames[0].shape
        out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{cs}\n".encode()]
        extra = int(w * h * chroma_ratio) - w * h  # chroma filler bytes
        for fr in frames:
            out.append(b"FRAME\n" + fr.tobytes() + b"\x80" * extra)
        return b"".join(out)

    def test_420_siting_variants_decode(self):
        rng = np.random.default_rng(7)
        frames = [rng.integers(0, 256, (8, 12), dtype=np.uint8) for _ in range(3)]
        for cs in ("420", "420jpeg", "420mpeg2", "420paldv"):
            data = self._y4m_with_colorspace(cs, frames, 3 / 2)
            w, h, got = mc.decode_y4m(data)
            assert (w, h, len(got)) == (12, 8, 3), cs
            assert all((a == b).all() for a, b in zip(frames, got)), cs

    def test_444alpha_rejected(self):
        rng = np.random.default_rng(8)
        frames = [rng.integers(0, 256, (8, 12), dtype=np.uint8)]
        data = self._y4m_with_colorspace("444alpha", frames, 4.0)
        with pytest.raises(mc.UnsupportedMediaError):
            mc.decode_y4m(data)


@pytest.mark.spark
class TestImageAhash:
    def _img(self, rng, w=40, h=30):
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def test_hash_properties(self, spark):
        from koncorde_spark.pipeline import media_codecs as mc
        from koncorde_spark.pipeline.multimodal import (
            _ahash_from_luma,
            image_ahash,
            image_near_dup_pairs,
        )
        import pandas as pd

        rng = np.random.default_rng(8)
        base = self._img(rng)
        noisy = base.copy()
        noisy[0, 0] = 255 - noisy[0, 0]  # one-pixel change
        other = self._img(rng)
        rows = [
            (0, bytearray(mc.encode_png(base))),
            (1, bytearray(mc.encode_png(base))),   # exact dup of 0
            (2, bytearray(mc.encode_png(noisy))),  # near dup of 0
            (3, bytearray(mc.encode_png(other))),
        ]
        import pyspark.sql.types as T

        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "bytes"]),
            schema=T.StructType(
                [
                    T.StructField("media_id", T.LongType()),
                    T.StructField("bytes", T.BinaryType()),
                ]
            ),
        )
        hashes = {
            int(r["media_id"]): int(r["simhash"])
            for r in image_ahash(df).collect()
        }
        assert hashes[0] == hashes[1]  # identical pixels, identical hash
        assert 0 <= hashes[0] < (1 << 60)
        ham_near = bin(hashes[0] ^ hashes[2]).count("1")
        ham_far = bin(hashes[0] ^ hashes[3]).count("1")
        assert ham_near <= 2  # one-pixel change barely moves block means
        assert ham_far > 10   # unrelated random image is far
        # spark path equals the direct kernel on the same luma
        assert hashes[0] == _ahash_from_luma(mc.luma(base))

        pairs = {
            (int(r["id_a"]), int(r["id_b"]))
            for r in image_near_dup_pairs(df, max_hamming=3).collect()
        }
        assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
        assert not any(3 in p for p in pairs)

    def test_uneven_grid_division(self):
        from koncorde_spark.pipeline.multimodal import _ahash_from_luma

        # 7x13 does not divide 10x6 evenly — block splitting must still
        # cover every pixel exactly once (area sums / true block sizes)
        rng = np.random.default_rng(3)
        lum = rng.uniform(0, 255, (13, 7))
        h1 = _ahash_from_luma(lum)
        assert 0 <= h1 < (1 << 60)
        # deterministic
        assert h1 == _ahash_from_luma(lum.copy())


@pytest.mark.spark
class TestAudioVideoPhash:
    def test_audio_fingerprint_properties(self, spark):
        from koncorde_spark.pipeline import media_codecs as mc
        from koncorde_spark.pipeline.multimodal import (
            audio_fingerprint,
            media_near_dup_pairs,
        )
        import pandas as pd
        import pyspark.sql.types as T

        rng = np.random.default_rng(4)
        base = rng.uniform(-0.8, 0.8, 4000)
        noisy = base + rng.normal(0, 0.01, 4000)  # tiny noise
        other = rng.uniform(-0.8, 0.8, 4000)
        rows = [
            (0, bytearray(mc.encode_wav(base, 16000))),
            (1, bytearray(mc.encode_wav(base, 16000))),
            (2, bytearray(mc.encode_wav(noisy, 16000))),
            (3, bytearray(mc.encode_wav(other, 16000))),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "bytes"]),
            schema=T.StructType(
                [
                    T.StructField("media_id", T.LongType()),
                    T.StructField("bytes", T.BinaryType()),
                ]
            ),
        )
        h = {
            int(r["media_id"]): int(r["simhash"])
            for r in audio_fingerprint(df).collect()
        }
        assert h[0] == h[1]
        assert bin(h[0] ^ h[2]).count("1") <= 3   # envelope barely moves
        assert bin(h[0] ^ h[3]).count("1") > 8    # unrelated is far
        pairs = {
            (int(r["id_a"]), int(r["id_b"]))
            for r in media_near_dup_pairs(df, "audio", max_hamming=3).collect()
        }
        assert (0, 1) in pairs and (0, 2) in pairs
        assert not any(3 in p for p in pairs)

    def test_video_phash_properties(self, spark):
        from koncorde_spark.pipeline import media_codecs as mc
        from koncorde_spark.pipeline.multimodal import video_phash
        import pandas as pd
        import pyspark.sql.types as T

        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, (24, 32), dtype=np.uint8) for _ in range(6)]
        # doubled frame rate: every frame repeated -> same time-mean luma
        doubled = [f for f in frames for _ in (0, 1)]
        other = [rng.integers(0, 256, (24, 32), dtype=np.uint8) for _ in range(6)]
        rows = [
            (0, bytearray(mc.encode_y4m(frames))),
            (1, bytearray(mc.encode_y4m(doubled))),
            (2, bytearray(mc.encode_y4m(other))),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "bytes"]),
            schema=T.StructType(
                [
                    T.StructField("media_id", T.LongType()),
                    T.StructField("bytes", T.BinaryType()),
                ]
            ),
        )
        h = {
            int(r["media_id"]): (int(r["simhash"]), int(r["n_frames"]))
            for r in video_phash(df).collect()
        }
        assert h[0][0] == h[1][0]      # frame-rate invariance
        assert h[0][1] == 6 and h[1][1] == 12
        assert bin(h[0][0] ^ h[2][0]).count("1") > 8

    def test_media_near_dup_rejects_unknown_kind(self, spark):
        from koncorde_spark.pipeline.multimodal import media_near_dup_pairs

        with pytest.raises(ValueError):
            media_near_dup_pairs(None, "text")
