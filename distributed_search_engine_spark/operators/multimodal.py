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


def decode_real(data: bytes, kind: str):
    """The real-decoder seam. In production this dispatches to PIL
    (image), soundfile/librosa (audio), or pyav/ffmpeg (video) — none of
    which are available in this container."""
    raise NotImplementedError(
        f"real {kind} decode requires PIL/soundfile/pyav; this container "
        "ships the deterministic fake codec only (pack_fake_media)"
    )


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
                px, w, h, nf = _decode_fake(bytes(data))
                hist, _ = np.histogram(px, bins=n_bins, range=(0, 256))
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
