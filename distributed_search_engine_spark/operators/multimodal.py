"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schema, Arrow batch shape,
mapInPandas signatures, partition-friendly layout. The codec layer is
stubbed for this container (no PIL/ffmpeg/soundfile baked in): a
deterministic fake binary format (`pack_fake_media` / `_decode_fake`)
stands in for real decoders, and `decode_real` raises NotImplementedError
with the library it would use. Swapping the stub for PIL/ffmpeg changes
only the per-batch decode function — the DataFrame plumbing is unchanged.

Layout rationale at 100 TB: media bytes live in their own column so parquet
column pruning skips them unless a stage needs pixels; metadata is a typed
struct usable in filters (e.g. width >= 64) that push down to the scan.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, kind string, data binary, "
    "meta struct<width: int, height: int, sample_rate: int, n_frames: int, codec: string>"
)

_MAGIC = b"FAKE"


def pack_fake_media(kind: str, seed: int, width: int = 8, height: int = 8, n_frames: int = 1) -> bytes:
    """Deterministic fake blob: 4-byte magic + header + seeded byte payload."""
    rng = np.random.default_rng(seed)
    if kind == "image":
        payload = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    elif kind == "audio":
        payload = rng.integers(0, 256, size=width * 16, dtype=np.uint8).tobytes()
    else:  # video: n_frames consecutive fake images
        payload = rng.integers(0, 256, size=width * height * n_frames, dtype=np.uint8).tobytes()
    header = struct.pack("<4sIII", _MAGIC, width, height, n_frames)
    return header + payload


def _decode_fake(data: bytes) -> tuple[np.ndarray, int, int, int]:
    magic, w, h, nf = struct.unpack("<4sIII", data[:16])
    if magic != _MAGIC:
        raise ValueError("not a fake-media blob")
    px = np.frombuffer(data[16:], dtype=np.uint8)
    return px, w, h, nf


# ---------------------------------------------------------------------------
# real codecs (pure numpy, no external libs): PPM P6 images and RIFF/WAV
# PCM16 audio — actual standard binary formats parsed byte-for-byte, so at
# least one non-stub media path runs end-to-end in this container.
# JPEG/MP3/MP4 remain the PIL/soundfile/pyav seam (PNG is native below).
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = pixels.shape
    assert c == 3
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_ppm(data: bytes) -> tuple[np.ndarray, int, int]:
    """Binary PPM (P6) -> ((h, w, 3) uint8, width, height). Tolerates
    arbitrary whitespace and '#' comments in the header, per the spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens, i, n = [], 2, len(data)
    while len(tokens) < 3:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3), w, h


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP (BITMAPINFOHEADER,
    BGR byte order, bottom-up rows, rows padded to 4 bytes)."""
    h, w, c = pixels.shape
    assert c == 3
    row_raw = w * 3
    pad = (-row_raw) % 4
    bgr = np.ascontiguousarray(pixels[::-1, :, ::-1], dtype=np.uint8)  # bottom-up, BGR
    if pad:
        rows = np.zeros((h, row_raw + pad), dtype=np.uint8)
        rows[:, :row_raw] = bgr.reshape(h, row_raw)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    off = 14 + 40
    hdr = (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return hdr + body


def decode_bmp(data: bytes) -> tuple[np.ndarray, int, int]:
    """Uncompressed 24-bit BMP -> ((h, w, 3) uint8 RGB, width, height).
    Handles both bottom-up (positive height) and top-down (negative
    height) row order and 4-byte row padding."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack("<I", data[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", data[14:26])
    planes, bpp, compression = struct.unpack("<HHI", data[26:34])
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BITMAPINFOHEADER BMPs")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1]), w, h  # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 samples -> RIFF/WAVE PCM16."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE PCM16 -> (int16 samples (n, channels), sample_rate,
    channels). Walks the chunk list (fmt may be followed by LIST etc.)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(data)
    sample_rate = channels = bits = None
    samples = None
    while i + 8 <= n:
        cid = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt, channels, sample_rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if samples is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    return samples.reshape(-1, channels), sample_rate, channels


def decode_real(data: bytes, kind: str):
    """Real-format decode: returns (flat value array, width, height,
    n_frames) like _decode_fake, so the feature extractors are
    format-agnostic. PPM P6 and WAV PCM16 are decoded in pure numpy;
    compressed formats still need PIL (image), soundfile/librosa (audio) or
    pyav/ffmpeg (video), which this container does not ship."""
    if kind == "image" and data[:8] == _PNG_SIG:
        px, w, h = decode_png(data)
        return px.reshape(-1), w, h, 1
    if kind == "image" and data[:2] == b"P6":
        px, w, h = decode_ppm(data)
        return px.reshape(-1), w, h, 1
    if kind == "image" and data[:2] == b"BM":
        px, w, h = decode_bmp(data)
        return px.reshape(-1), w, h, 1
    if kind == "image" and data[:2] == b"\xff\xd8":
        px, w, h = decode_jpeg(data)
        return px.reshape(-1), w, h, 1
    if kind == "audio" and data[:4] == b"RIFF":
        s, rate, ch = decode_wav(data)
        return s.reshape(-1), int(rate), ch, 1
    raise NotImplementedError(
        f"unsupported {kind} container: PNG/JPEG/PPM/BMP images and PCM16 "
        "WAV audio decode natively (stdlib zlib + numpy); MP3/MP4 still "
        "need soundfile/pyav, which this container does not ship"
    )


def _decode_any(data: bytes, kind: str):
    """Dispatch on magic: fake blobs, then the real codecs."""
    if data[:4] == _MAGIC:
        return _decode_fake(data)
    return decode_real(data, kind)


def make_synthetic_media(spark: SparkSession, n: int = 30) -> DataFrame:
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h, nf = 8 + (i % 3) * 4, 8, 1 if kind != "video" else 4
        rows.append(
            (
                f"m{i:04d}",
                kind,
                bytearray(pack_fake_media(kind, seed=i, width=w, height=h, n_frames=nf)),
                (w, h, 16000 if kind == "audio" else 0, nf, "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FEATURE_SCHEMA = (
    "doc_id string, kind string, n_bytes int, feat_mean double, feat_std double, "
    "histogram array<double>"
)


def extract_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """Per-item features via mapInPandas (Arrow batches of binary blobs):
    mean/std/8-bin histogram over decoded bytes. The batch loop is the
    exact shape a PIL/librosa feature extractor would use."""

    def _extract(batch_iter):
        for pdf in batch_iter:
            out = {
                "doc_id": [], "kind": [], "n_bytes": [],
                "feat_mean": [], "feat_std": [], "histogram": [],
            }
            for doc_id, kind, data in zip(pdf["doc_id"], pdf["kind"], pdf["data"]):
                px, w, h, nf = _decode_any(bytes(data), kind)
                rng = (-32768, 32768) if px.dtype == np.int16 else (0, 256)
                hist, _ = np.histogram(px, bins=n_bins, range=rng)
                out["doc_id"].append(doc_id)
                out["kind"].append(kind)
                out["n_bytes"].append(len(data))
                out["feat_mean"].append(float(px.mean()))
                out["feat_std"].append(float(px.std()))
                out["histogram"].append((hist / max(1, len(px))).tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Nearest-neighbor resize of image rows -> new blob + updated meta.
    Non-image rows pass through untouched."""

    def _resize(batch_iter):
        for pdf in batch_iter:
            datas, metas = [], []
            for kind, data, meta in zip(pdf["kind"], pdf["data"], pdf["meta"]):
                if kind != "image":
                    datas.append(bytes(data))
                    metas.append(meta)
                    continue
                px, w, h, nf = _decode_fake(bytes(data))
                img = px[: w * h].reshape(h, w)
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                small = img[np.ix_(ys, xs)]
                blob = struct.pack("<4sIII", _MAGIC, out_w, out_h, 1) + small.tobytes()
                datas.append(blob)
                m = dict(meta)
                m["width"], m["height"] = out_w, out_h
                metas.append(m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "data": datas,
                    "meta": metas,
                }
            )

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """(doc_id, frame_idx, frame binary) for video rows: every k-th frame.
    1->N explode via mapInPandas — the frame-sampling shape for ffmpeg."""
    out_schema = "doc_id string, frame_idx int, frame binary"

    def _sample(batch_iter):
        for pdf in batch_iter:
            ids, idxs, frames = [], [], []
            for doc_id, kind, data in zip(pdf["doc_id"], pdf["kind"], pdf["data"]):
                if kind != "video":
                    continue
                px, w, h, nf = _decode_fake(bytes(data))
                frame_sz = w * h
                for fi in range(0, nf, every_k):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(px[fi * frame_sz : (fi + 1) * frame_sz].tobytes())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.where(F.col("kind") == "video").mapInPandas(_sample, schema=out_schema)


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, non-interlaced): a REAL compressed format decoded with
# nothing but stdlib zlib + numpy — the seam-closer for compressed images.
# The encoder deliberately emits a DIFFERENT scanline filter per row
# (None/Sub/Up/Average/Paeth cycling) so the decoder's generic
# unfiltering of all five predictor types is exercised by every
# round-trip test, not just the trivial filter-0 path.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG (bit depth 8, color type 2, filters
    cycling 0..4 per row)."""
    import zlib

    h, w, c = pixels.shape
    assert c == 3
    px = np.ascontiguousarray(pixels, dtype=np.uint8).astype(np.int16)
    bpp = 3
    out = bytearray()
    prior = np.zeros(w * bpp, dtype=np.int16)
    for r in range(h):
        raw = px[r].reshape(-1)
        f = r % 5
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), raw[:-bpp]])
        if f == 0:
            filt = raw
        elif f == 1:
            filt = raw - left
        elif f == 2:
            filt = raw - prior
        elif f == 3:
            filt = raw - (left + prior) // 2
        else:
            pl = np.concatenate([np.zeros(bpp, dtype=np.int16), prior[:-bpp]])
            pred = np.array(
                [_paeth(int(a), int(b), int(cc)) for a, b, cc in zip(left, prior, pl)],
                dtype=np.int16,
            )
            filt = raw - pred
        out.append(f)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[np.ndarray, int, int]:
    """PNG (8-bit RGB, color type 2, non-interlaced) -> ((h, w, 3) uint8,
    width, height). Generic unfiltering of all five scanline predictors;
    chunk CRCs verified; multiple IDATs concatenated per the spec."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, n = 8, len(data)
    w = h = None
    idat = bytearray()
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        if i + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        body = data[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", data[i + 8 + length : i + 12 + length])
        if (zlib.crc32(ctype + body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, ctypecol, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctypecol, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit RGB non-interlaced PNGs are supported"
                )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        i += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:
            rec = (line + prior) % 256
        else:
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                elif f == 4:
                    pred = _paeth(int(left), int(up), int(ul))
                else:
                    raise ValueError(f"unknown PNG filter {f}")
                rec[x] = (line[x] + pred) % 256
        out[r] = rec.astype(np.uint8)
        prior = rec
    return out.reshape(h, w, 3), w, h


# ---------------------------------------------------------------------------
# Baseline-sequential JPEG codec (ITU-T T.81 / JFIF), pure numpy + stdlib.
# Closes the last common compressed-image seam without PIL: the encoder
# writes 4:4:4 baseline JPEGs with the Annex-K example quantization and
# Huffman tables; the decoder handles baseline sequential scans with
# 4:4:4 / 4:2:2 / 4:2:0 sampling, restart intervals, and byte stuffing.
# Reference behavior parity target: the reference pipeline treats media
# as opaque blobs + metadata; the decode path here feeds the same
# extract_features/resize operators as PNG/PPM/BMP.
# ---------------------------------------------------------------------------

# Annex K.1/K.2 example quantization tables (quality ~50), zigzag order
_JPEG_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_JPEG_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag scan order: _JPEG_ZZ[i] = raster index of the i-th zigzag entry.
# T.81 Figure 5: the scan starts (0,0) -> (0,1) -> (1,0), i.e. ODD
# anti-diagonals (r+c odd) walk top-right -> bottom-left (ascending r)
# and EVEN anti-diagonals walk bottom-left -> top-right (descending r,
# ascending c). Sorting odd diagonals by c instead transposes the table
# (internal round-trips still pass because encoder+decoder share it, but
# interop with any external baseline JPEG breaks) — locked by the
# spec-table equality test in tests/test_multimodal.py.
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_JPEG_ZZ = _zigzag_order()

# Annex K.3 example Huffman tables: (bits[1..16], huffval)
_JPEG_HT = {
    ("dc", 0): (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    ),
    ("dc", 1): (
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)),
    ),
    ("ac", 0): (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
            0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
            0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
            0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
            0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
            0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
            0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
            0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
            0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
            0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
            0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
            0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
            0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ],
    ),
    ("ac", 1): (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
            0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
            0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
            0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
            0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
            0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
            0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
            0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
            0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
            0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
            0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ],
    ),
}


def _huff_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order per T.81 Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DCT_M = np.array([
    [
        (np.sqrt(1.0 / 8) if u == 0 else np.sqrt(2.0 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, Annex-K
    tables). Edge blocks are padded by edge replication."""
    px = np.asarray(pixels, dtype=np.float64)
    h, w = px.shape[:2]
    # RGB -> YCbCr (BT.601 full range, the JFIF convention)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [y, cb, cr]
    qts = [_JPEG_QT_LUMA, _JPEG_QT_CHROMA, _JPEG_QT_CHROMA]
    tsel = [0, 1, 1]

    bw = _BitWriter()
    dc_codes = {t: _huff_codes(*_JPEG_HT[("dc", t)]) for t in (0, 1)}
    ac_codes = {t: _huff_codes(*_JPEG_HT[("ac", t)]) for t in (0, 1)}
    pred = [0, 0, 0]
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = [
        np.pad(p, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge") for p in planes
    ]
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(3):
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _DCT_M @ block @ _DCT_M.T
                zz = coef.reshape(-1)[_JPEG_ZZ]
                # tables are stored raster-order; quantize in zigzag space
                q = (_JPEG_QT_CHROMA if ci else _JPEG_QT_LUMA)[_JPEG_ZZ]
                qz = np.round(zz / q).astype(np.int64)
                t = tsel[ci]
                # DC
                diff = int(qz[0]) - pred[ci]
                pred[ci] = int(qz[0])
                size, bits = _magnitude(diff)
                c, ln = dc_codes[t][size]
                bw.write(c, ln)
                if size:
                    bw.write(bits, size)
                # AC with run-length + ZRL/EOB
                run = 0
                for i in range(1, 64):
                    v = int(qz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[t][0xF0]
                        bw.write(c, ln)
                        run -= 16
                    size, bits = _magnitude(v)
                    c, ln = ac_codes[t][(run << 4) | size]
                    bw.write(c, ln)
                    bw.write(bits, size)
                    run = 0
                if run:
                    c, ln = ac_codes[t][0x00]  # EOB
                    bw.write(c, ln)
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0/JFIF: version 1.1, density units 0, 1x1 density, no thumbnail
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    for tid, qt in ((0, _JPEG_QT_LUMA), (1, _JPEG_QT_CHROMA)):
        # DQT entries are written in zigzag order per T.81 B.2.4.1
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(v) for v in qt[_JPEG_ZZ]
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, t in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, t])  # 4:4:4
    for (kind, tid), (bits, vals) in _JPEG_HT.items():
        tc = 0 if kind == "dc" else 1
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes(
            [(tc << 4) | tid]
        ) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, t in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, (t << 4) | t])
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    # marker: rewind and feed 1-bits (spec: pad at segment end)
                    self.pos -= 1
                    byte = 0xFF  # consumed as padding
                    self.acc = (self.acc << 8) | byte
                    self.nbits += 8
                    return
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 1  # pad
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop buffered bits and skip a restart marker if present."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            nxt = self.data[self.pos + 1]
            if 0xD0 <= nxt <= 0xD7:
                self.pos += 2
                return
            break


def _huff_decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: "_BitReader", table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[np.ndarray, int, int]:
    """Baseline-sequential JFIF -> ((h, w, 3) uint8 RGB, width, height).
    Supports 1- or 3-component scans, sampling factors 1-2 (4:4:4, 4:2:2,
    4:2:0), restart intervals, byte stuffing. Progressive/arithmetic
    modes raise ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i, n = 2, len(data)
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = None
    restart = 0
    scan_comps: list[dict] = []
    scan_start = None
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[i + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    body[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int32)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                j += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline-sequential JPEG is supported")
        elif marker == 0xDD:
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = body[1 + c * 2 : 3 + c * 2]
                comp = next(x for x in comps if x["id"] == cid)
                scan_comps.append(
                    {**comp, "dc": tt >> 4, "ac": tt & 0x0F}
                )
            scan_start = i + 2 + seglen
            break
        i += 2 + seglen
    if scan_start is None or h is None:
        raise ValueError("missing SOF/SOS")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in scan_comps
    ]
    br = _BitReader(data[scan_start:])
    pred = [0] * len(scan_comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.align_to_marker()
                pred = [0] * len(scan_comps)
            for ci, c in enumerate(scan_comps):
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        dct = huff[(0, c["dc"])]
                        act = huff[(1, c["ac"])]
                        size = _read_symbol(br, dct)
                        diff = _extend(br.read_bits(size), size)
                        pred[ci] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, act)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(rs & 0x0F), rs & 0x0F)
                            k += 1
                        # DQT bytes are zigzag-ordered: dequantize in
                        # zigzag space, then scatter to raster positions
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_JPEG_ZZ] = zz * qt[c["tq"]]
                        block = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + 128.0
                        py = (my * c["v"] + vy) * 8
                        pxx = (mx * c["h"] + vx) * 8
                        planes[ci][py : py + 8, pxx : pxx + 8] = block
            mcu_count += 1

    # upsample subsampled planes to full res, crop, color-convert
    full = []
    for ci, c in enumerate(scan_comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        ych = np.clip(full[0], 0, 255)
        rgb = np.stack([ych] * 3, axis=-1)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), w, h


# ---------------------------------------------------------------------------
# Audio spectral features (the librosa-shaped analysis pipeline, numpy-only)
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = (
    "doc_id string, sample_rate int, n_samples int, duration_sec double, "
    "rms double, zcr double, spectral_centroid double, "
    "spectral_rolloff double, dominant_hz double, band_energy array<double>"
)


def _audio_samples(data: bytes) -> tuple[np.ndarray, int]:
    """Blob -> (mono float64 samples in [-1, 1), sample_rate). Real WAV
    rows decode through the RIFF codec (multi-channel averaged to mono);
    fake blobs map their byte payload to int16 at the fake 16 kHz meta
    rate so the plumbing is testable without a codec."""
    if data[:4] == _MAGIC:
        px, _, _, _ = _decode_fake(data)
        s = (px.astype(np.float64) - 128.0) * 256.0
        return s / 32768.0, 16000
    samples, sr, _ch = decode_wav(data)
    return samples.astype(np.float64).mean(axis=1) / 32768.0, sr


def audio_spectral_features(
    media: DataFrame, n_fft: int = 512, hop: int = 256, n_bands: int = 8
) -> DataFrame:
    """Frame-based spectral features for every ``kind == 'audio'`` row —
    the feature-extraction stage of an audio training-data pipeline
    (silence / bandwidth / tone filtering), as one Arrow-batched
    mapInPandas over the binary column. All math is numpy (Hann window +
    rfft), no external audio library:

    - rms, zcr: whole-signal level and zero-crossing rate (crossings per
      sample; a pure f Hz tone gives ~2f/sr)
    - spectral_centroid / spectral_rolloff (85%): Hz, from the
      frame-averaged magnitude spectrum
    - dominant_hz: peak non-DC bin of the averaged spectrum
    - band_energy: energy fraction per equal-width frequency band
      (n_bands entries summing to ~1) — the coarse mel-filterbank shape

    Scale shape: pure map over ~row-sized blobs (no shuffle, no state);
    partitioning and batch sizing are governed by the source layout, and
    a signal shorter than n_fft falls back to one zero-padded frame.
    Feature values are deterministic float64 -> rounded 6dp."""

    def _features(batch_iter):
        for pdf in batch_iter:
            out = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "duration_sec": [], "rms": [], "zcr": [],
                "spectral_centroid": [], "spectral_rolloff": [],
                "dominant_hz": [], "band_energy": [],
            }
            win = np.hanning(n_fft)
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                x, sr = _audio_samples(bytes(data))
                n = len(x)
                if n == 0:
                    continue
                rms = float(np.sqrt(np.mean(x * x)))
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                if n < n_fft:
                    frames = np.zeros((1, n_fft))
                    frames[0, :n] = x
                else:
                    starts = np.arange(0, n - n_fft + 1, hop)
                    frames = np.stack([x[s : s + n_fft] for s in starts])
                mag = np.abs(np.fft.rfft(frames * win, axis=1)).mean(axis=0)
                freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
                tot = float(mag.sum())
                centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                cum = np.cumsum(mag)
                roll_i = int(np.searchsorted(cum, 0.85 * tot)) if tot > 0 else 0
                rolloff = float(freqs[min(roll_i, len(freqs) - 1)])
                dom = float(freqs[1 + int(np.argmax(mag[1:]))]) if len(mag) > 1 else 0.0
                e = mag * mag
                bands = np.array_split(e, n_bands)
                etot = float(e.sum())
                be = [float(b.sum() / etot) if etot > 0 else 0.0 for b in bands]
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
                out["duration_sec"].append(round(n / sr, 6))
                out["rms"].append(round(rms, 6))
                out["zcr"].append(round(zcr, 6))
                out["spectral_centroid"].append(round(centroid, 6))
                out["spectral_rolloff"].append(round(rolloff, 6))
                out["dominant_hz"].append(round(dom, 6))
                out["band_energy"].append([round(v, 6) for v in be])
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "audio").mapInPandas(
        _features, schema=AUDIO_FEATURE_SCHEMA
    )
