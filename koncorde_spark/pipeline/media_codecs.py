"""Real media codecs with zero external dependencies (stdlib + numpy).

The container has no PIL/libav, so instead of stubbing decode the engine
ships its own decoders for a documented format matrix:

- image: PNG (8-bit gray / gray+alpha / RGB / RGBA, non-interlaced;
  zlib inflate + Sub/Up/Average/Paeth unfilter), BMP (24-bit uncompressed
  bottom-up), PPM/PGM (binary P6/P5, maxval 255)
- audio: WAV (PCM 8/16-bit, stdlib ``wave``)
- video: YUV4MPEG2 (y4m, 4:2:0 / 4:4:4 / mono — raw frames, the standard
  uncompressed interchange format)

Anything else raises ``UnsupportedMediaError`` naming the sniffed magic —
never a silent fake. Encoders for the same formats exist so tests and the
synthetic media table exercise decode end-to-end with known pixel/sample
values. If PIL is importable it is used as a fallback for formats outside
the native matrix (JPEG etc.) — import-guarded, never required.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


class UnsupportedMediaError(ValueError):
    """Raised when bytes are not in the supported decode matrix."""


# ---------------------------------------------------------------------------
# sniffing
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff(data: bytes) -> str:
    """Return the container format of ``data``: png|bmp|ppm|pgm|wav|y4m.

    Raises UnsupportedMediaError (with a hex prefix of the magic) for
    anything outside the matrix.
    """
    if data.startswith(_PNG_MAGIC):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"P6"):
        return "ppm"
    if data.startswith(b"P5"):
        return "pgm"
    if data.startswith(b"RIFF") and data[8:12] == b"WAVE":
        return "wav"
    if data.startswith(b"YUV4MPEG2"):
        return "y4m"
    raise UnsupportedMediaError(
        f"unsupported media magic {data[:8].hex() or '<empty>'!s}; supported: "
        "png, bmp(24), ppm/pgm, wav(pcm), y4m"
    )


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8. 8-bit, non-interlaced only (the overwhelming
    majority of real PNGs); palette/16-bit/interlaced raise."""
    if not data.startswith(_PNG_MAGIC):
        raise UnsupportedMediaError("not a PNG")
    pos, idat, ihdr = len(_PNG_MAGIC), [], None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise UnsupportedMediaError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0 or comp != 0 or filt != 0:
        raise UnsupportedMediaError(
            f"PNG variant outside matrix (depth={depth} color={color} interlace={interlace})"
        )
    c = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise UnsupportedMediaError("PNG scanline payload size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = arr[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        line = arr[y, 1:].astype(np.int32)
        f = filters[y]
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            res = line
        elif f == 2:  # Up
            res = (line + prev) & 0xFF
        elif f == 1:  # Sub: res[x] = line[x] + res[x-c] — a running sum per
            # channel; uint8 cumsum wraps mod 256, exactly the spec
            res = (
                arr[y, 1:].reshape(w, c).cumsum(axis=0, dtype=np.uint8)
                .reshape(stride).astype(np.int32)
            )
        else:
            # Sub / Average / Paeth need the in-progress row: per-pixel scan,
            # vectorized over channels (c-wide steps)
            res = np.zeros(stride, dtype=np.int32)
            for x in range(0, stride, c):
                left = res[x - c : x] if x else np.zeros(c, dtype=np.int32)
                up = prev[x : x + c]
                ul = prev[x - c : x] if x else np.zeros(c, dtype=np.int32)
                seg = line[x : x + c]
                if f == 3:  # Average
                    res[x : x + c] = (seg + ((left + up) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    p = left + up - ul
                    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
                    res[x : x + c] = (seg + pred) & 0xFF
                else:
                    raise UnsupportedMediaError(f"PNG filter {f}")
        out[y] = res.astype(np.uint8)
    return out.reshape(h, w, c)


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, C) or (H, W) uint8 -> PNG bytes (filter 0 rows)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed) and PPM/PGM
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    if not data.startswith(b"BM"):
        raise UnsupportedMediaError("not a BMP")
    off = struct.unpack("<I", data[10:14])[0]
    _hsize, w, h = struct.unpack("<Iii", data[14:26])  # h sign = row order
    _planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(f"BMP variant outside matrix (bpp={bpp})")
    height, width = abs(h), w
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(data[off : off + stride * height], dtype=np.uint8).reshape(
        height, stride
    )[:, : width * 3].reshape(height, width, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return rgb[::-1] if h > 0 else rgb  # bottom-up unless height negative


def encode_bmp(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    bgr = arr[::-1, :, ::-1]  # bottom-up, RGB -> BGR
    body = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def _ppm_header(data: bytes) -> tuple[int, int, int, int]:
    """Parse P5/P6 header; returns (width, height, maxval, payload offset)."""
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    return fields[0], fields[1], fields[2], pos + 1  # single whitespace after maxval


def decode_ppm(data: bytes) -> np.ndarray:
    kind = sniff(data)
    if kind not in ("ppm", "pgm"):
        raise UnsupportedMediaError("not a PPM/PGM")
    w, h, maxval, off = _ppm_header(data)
    if maxval != 255:
        raise UnsupportedMediaError(f"PPM maxval {maxval} outside matrix")
    c = 3 if kind == "ppm" else 1
    return np.frombuffer(data[off : off + w * h * c], dtype=np.uint8).reshape(h, w, c)


def encode_ppm(arr: np.ndarray) -> bytes:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """Any supported image container -> (H, W, C) uint8."""
    kind = sniff(data)
    if kind == "png":
        return decode_png(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind in ("ppm", "pgm"):
        return decode_ppm(data)
    if _pil_available():
        import PIL.Image

        arr = np.asarray(PIL.Image.open(io.BytesIO(data)))
        return arr[:, :, None] if arr.ndim == 2 else arr
    raise UnsupportedMediaError(f"{kind} is not an image format")


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# WAV audio
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV -> (sample_rate, (n_samples, n_channels) float32 in [-1, 1])."""
    if sniff(data) != "wav":
        raise UnsupportedMediaError("not a WAV")
    with wave.open(io.BytesIO(data), "rb") as f:
        sr, nch, sw = f.getframerate(), f.getnchannels(), f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise UnsupportedMediaError(f"WAV sample width {sw} outside matrix")
    return sr, x.reshape(-1, nch)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, ch) float in [-1, 1] -> 16-bit PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Y4M video
# ---------------------------------------------------------------------------

_Y4M_SUBSAMPLING = {"420": 3 / 2, "444": 3.0, "mono": 1.0}


def decode_y4m(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """YUV4MPEG2 -> (width, height, [per-frame (H, W) uint8 luma planes])."""
    if sniff(data) != "y4m":
        raise UnsupportedMediaError("not a Y4M")
    nl = data.index(b"\n")
    w = h = None
    colorspace = "420"
    for tok in data[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            # C420jpeg / C420mpeg2 / C420paldv are all 4:2:0 layouts with
            # identical frame sizes — map the siting variants explicitly
            # (a suffix rstrip can never strip 'jpeg'/'mpeg2'/'paldv', and
            # a bare prefix match would wrongly accept C444alpha's 4-plane
            # frames as 3-plane C444)
            cs = t[1:]
            if cs in ("420jpeg", "420mpeg2", "420paldv"):
                cs = "420"
            colorspace = cs
    if w is None or h is None:
        raise UnsupportedMediaError("Y4M header missing W/H")
    if colorspace not in _Y4M_SUBSAMPLING:
        raise UnsupportedMediaError(f"Y4M colorspace {colorspace} outside matrix")
    frame_bytes = int(w * h * _Y4M_SUBSAMPLING[colorspace])
    frames, pos = [], nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise UnsupportedMediaError("Y4M frame marker missing")
        start = fnl + 1
        luma = np.frombuffer(data[start : start + w * h], dtype=np.uint8).reshape(h, w)
        frames.append(luma)
        pos = start + frame_bytes
    return w, h, frames


def encode_y4m(frames: list[np.ndarray]) -> bytes:
    """[(H, W) uint8 luma] -> Y4M bytes (mono colorspace, 25 fps)."""
    h, w = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode()]
    for fr in frames:
        out.append(b"FRAME\n" + fr.tobytes())
    return b"".join(out)


# ---------------------------------------------------------------------------
# transforms over decoded arrays
# ---------------------------------------------------------------------------


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) image — pure numpy indexing."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[ys][:, xs]


def luma(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> (H, W) float luma (BT.601 for RGB, passthrough gray)."""
    if arr.shape[2] == 1:
        return arr[:, :, 0].astype(np.float64)
    if arr.shape[2] == 2:  # gray + alpha
        return arr[:, :, 0].astype(np.float64)
    r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
    return 0.299 * r + 0.587 * g + 0.114 * b
