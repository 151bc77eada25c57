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
    if kind == "audio" and data[:4] == b"RIFF":
        s, rate, ch = decode_wav(data)
        return s.reshape(-1), int(rate), ch, 1
    raise NotImplementedError(
        f"unsupported {kind} container: PNG/PPM/BMP images and PCM16 WAV "
        "audio decode natively (stdlib zlib + numpy); JPEG/MP3/MP4 still "
        "need PIL/soundfile/pyav, which this container does not ship"
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
