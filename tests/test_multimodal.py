"""Multimodal plumbing: schema, Arrow batch shape, deterministic features."""

import numpy as np
import pytest

from distributed_search_engine_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.make_synthetic_media(spark, n=30)


def test_schema_and_metadata_pruning(spark, media):
    assert dict(media.dtypes)["data"] == "binary"
    # metadata filters work without touching pixel bytes
    wide = media.where("meta.width >= 12").select("doc_id", "meta.width")
    assert wide.count() > 0


def test_features_deterministic(spark, media):
    feats = {r["doc_id"]: r for r in M.extract_features(media).collect()}
    assert len(feats) == 30
    # recompute one row's features directly from the fake codec
    px, w, h, nf = M._decode_fake(M.pack_fake_media("image", seed=0, width=8, height=8))
    r = feats["m0000"]
    assert abs(r["feat_mean"] - float(px.mean())) < 1e-9
    assert abs(sum(r["histogram"]) - 1.0) < 1e-9
    assert len(r["histogram"]) == 8


def test_resize(spark, media):
    out = M.resize_images(media, out_w=4, out_h=4)
    imgs = out.where("kind = 'image'").collect()
    for r in imgs:
        px, w, h, nf = M._decode_fake(bytes(r["data"]))
        assert (w, h) == (4, 4)
        assert len(px) == 16
        assert r["meta"]["width"] == 4
    # non-image rows untouched
    a_in = {r["doc_id"]: bytes(r["data"]) for r in media.where("kind='audio'").collect()}
    a_out = {r["doc_id"]: bytes(r["data"]) for r in out.where("kind='audio'").collect()}
    assert a_in == a_out


def test_frame_sampling(spark, media):
    frames = M.sample_frames(media, every_k=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # videos have 4 frames -> sampled [0, 2]
    for idxs in by_doc.values():
        assert sorted(idxs) == [0, 2]
    # frame bytes match the source payload slice
    vid = [r for r in media.where("kind='video'").collect()][0]
    px, w, h, nf = M._decode_fake(bytes(vid["data"]))
    f0 = [r for r in frames if r["doc_id"] == vid["doc_id"] and r["frame_idx"] == 0][0]
    assert bytes(f0["frame"]) == px[: w * h].tobytes()


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError, match="PIL|soundfile|pyav"):
        M.decode_real(b"x", "image")


# ---------------------------------------------------------------------------
# real codecs: PPM P6 + RIFF/WAV PCM16 (pure numpy, actual formats)
# ---------------------------------------------------------------------------

def test_ppm_roundtrip_and_header_comments():
    from distributed_search_engine_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    blob = encode_ppm(img)
    assert blob[:2] == b"P6"
    out, w, h = decode_ppm(blob)
    assert (w, h) == (7, 5) and np.array_equal(out, img)
    # spec: comments + arbitrary whitespace in header
    weird = b"P6 # a comment\n 7\t5 # more\n255\n" + img.tobytes()
    out2, w2, h2 = decode_ppm(weird)
    assert (w2, h2) == (7, 5) and np.array_equal(out2, img)


def test_wav_roundtrip():
    from distributed_search_engine_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32767, size=800, dtype=np.int16)
    blob = encode_wav(s, sample_rate=8000)
    out, rate, ch = decode_wav(blob)
    assert rate == 8000 and ch == 1
    assert np.array_equal(out.reshape(-1), s)


def test_extract_features_over_real_formats(spark):
    """End-to-end: real PPM/WAV blobs flow through the same mapInPandas
    feature extractor as the fake codec (magic dispatch)."""
    from distributed_search_engine_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_ppm,
        encode_wav,
        extract_features,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    wav = rng.integers(-2000, 2000, size=1600, dtype=np.int16)
    rows = [
        ("p1", "image", bytearray(encode_ppm(img)), (8, 8, 0, 1, "ppm")),
        ("w1", "audio", bytearray(encode_wav(wav, 16000)), (0, 0, 16000, 1, "wav")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["doc_id"]: r.asDict() for r in extract_features(media).collect()}
    assert feats["p1"]["feat_mean"] == pytest.approx(float(img.mean()))
    assert feats["w1"]["feat_mean"] == pytest.approx(float(wav.mean()))
    assert abs(sum(feats["p1"]["histogram"]) - 1.0) < 1e-9


def test_compressed_formats_still_raise(spark):
    from distributed_search_engine_spark.operators.multimodal import decode_real

    # MP3/MP4 remain the documented seam (PNG and JPEG decode natively)
    with pytest.raises(NotImplementedError):
        decode_real(b"ID3\x04\x00....", "audio")
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00\x00\x00\x20ftypisom....", "video")
    # a JPEG/PNG signature followed by garbage is malformed, not a seam
    with pytest.raises(ValueError):
        decode_real(b"\xff\xd8\xff\xe0....", "image")
    with pytest.raises(ValueError):
        decode_real(b"\x89PNG\r\n\x1a\n....", "image")


def test_bmp_roundtrip_padding_and_row_order():
    """24-bit BMP codec: byte-exact roundtrip at widths that do and do not
    need 4-byte row padding, plus a hand-built top-down (negative height)
    variant."""
    import struct

    import numpy as np

    from distributed_search_engine_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(3)
    for w in (4, 5, 6, 7):  # strides 12, 16(pad 1), 20(pad 2), 24(pad 3)... 15->16, 18->20, 21->24
        img = rng.integers(0, 256, size=(3, w, 3), dtype=np.uint8)
        blob = encode_bmp(img)
        out, ww, hh = decode_bmp(blob)
        assert (ww, hh) == (w, 3)
        assert np.array_equal(out, img)
    # top-down: flip the height sign and the row order in the body
    img = rng.integers(0, 256, size=(2, 4, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp(img))
    h = struct.unpack("<i", blob[22:26])[0]
    blob[22:26] = struct.pack("<i", -h)
    off = struct.unpack("<I", blob[10:14])[0]
    stride = 4 * 3
    body = bytes(blob[off:])
    rows = [body[i * stride:(i + 1) * stride] for i in range(2)]
    blob[off:] = b"".join(reversed(rows))
    out, ww, hh = decode_bmp(bytes(blob))
    assert np.array_equal(out, img)


def test_extract_features_from_bmp_blob(spark):
    """The mapInPandas feature extractor consumes a real BMP through the
    magic dispatch, same as PPM."""
    import numpy as np

    from distributed_search_engine_spark.operators.multimodal import (
        encode_bmp,
        extract_features,
    )

    img = np.full((4, 6, 3), 100, dtype=np.uint8)
    df = spark.createDataFrame(
        [("b1", "image", bytearray(encode_bmp(img)))],
        "doc_id string, kind string, data binary",
    )
    row = extract_features(df).collect()[0]
    assert row["feat_mean"] == 100.0 and row["feat_std"] == 0.0


def test_png_roundtrip_all_filters(spark):
    # the encoder cycles filter types 0..4 per row: any >=5-row image
    # exercises every predictor in one round-trip
    import numpy as np

    from distributed_search_engine_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 4), (9, 7), (16, 16)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back, ww, hh = decode_png(encode_png(px))
        assert (back == px).all() and (ww, hh) == (w, h)


def test_png_crc_verified(spark):
    import numpy as np

    from distributed_search_engine_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    data = bytearray(
        encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    )
    data[40] ^= 0xFF  # corrupt inside a chunk body
    import pytest as _pytest

    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_flows_through_feature_pipeline(spark):
    # a PNG row goes through the SAME mapInPandas feature extractor as
    # every other format (dispatch on magic in _decode_any)
    import numpy as np

    from distributed_search_engine_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        extract_features,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [("png1", "image", bytearray(encode_png(px)), (8, 8, None, 1, "png"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(media).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == "png1"
    assert abs(r["feat_mean"] - float(px.reshape(-1).mean())) < 1e-6


def test_jpeg_roundtrip_smooth_and_uniform():
    """Baseline JPEG codec (T.81, Annex-K tables): a smooth gradient is
    near-lossless (quantization error only), a uniform field is within
    +/-1, and padded edge blocks crop back to the exact source dims."""
    import numpy as np

    from distributed_search_engine_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            xx * 255 / (w - 1),
            yy * 255 / (h - 1),
            (xx + yy) * 255 / (w + h - 2),
        ],
        axis=-1,
    ).astype(np.uint8)
    data = encode_jpeg(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec, dw, dh = decode_jpeg(data)
    assert (dw, dh) == (w, h) and dec.shape == (h, w, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 16

    uni = np.full((8, 8, 3), [200, 64, 120], dtype=np.uint8)
    udec, _, _ = decode_jpeg(encode_jpeg(uni))
    assert np.abs(udec.astype(int) - uni.astype(int)).max() <= 1

    # non-multiple-of-8 dims exercise edge-replication padding + crop
    odd = np.full((17, 13, 3), 99, dtype=np.uint8)
    odec, ow, oh = decode_jpeg(encode_jpeg(odd))
    assert (ow, oh) == (13, 17) and odec.shape == (17, 13, 3)


def test_jpeg_zigzag_matches_t81_spec_table():
    """Interop lock: _zigzag_order() must equal the published ITU-T T.81
    zigzag sequence exactly. The encoder and decoder SHARE the table, so
    internal round-trips cannot catch a transposed table — any deviation
    here silently garbles every externally-produced baseline JPEG (and
    makes our output garble in external decoders). The 64 raster indices
    below are the canonical spec sequence (T.81 Figure 5 / libjpeg
    jpeg_natural_order)."""
    from distributed_search_engine_spark.operators.multimodal import _zigzag_order

    t81 = [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert _zigzag_order().tolist() == t81


def test_jpeg_flows_through_feature_pipeline(spark):
    import numpy as np

    from distributed_search_engine_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_jpeg,
        extract_features,
    )

    # smooth image so decoded stats track the source closely
    yy, xx = np.mgrid[0:16, 0:16]
    px = np.stack([xx * 16, yy * 16, (xx + yy) * 8], axis=-1).astype(np.uint8)
    rows = [("jp1", "image", bytearray(encode_jpeg(px)), (16, 16, None, 1, "jpeg"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(media).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == "jp1"
    assert abs(r["feat_mean"] - float(px.reshape(-1).mean())) < 4.0


# ---------------------------------------------------------------------------
# audio spectral features (numpy rfft pipeline over WAV binary columns)
# ---------------------------------------------------------------------------


def test_audio_spectral_features_sine(spark):
    """A pure 1 kHz tone at 16 kHz: dominant bin lands on 1000 Hz (bin
    width 31.25 Hz at n_fft=512), zcr ~ 2f/sr, centroid near the tone,
    band_energy concentrates in the band holding 1 kHz."""
    import numpy as np

    from distributed_search_engine_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_spectral_features,
        encode_wav,
    )

    sr, f = 16000, 1000.0
    t = np.arange(sr) / sr  # 1 second
    tone = (0.5 * np.sin(2 * np.pi * f * t) * 32767).astype(np.int16)
    quiet = np.zeros(sr, dtype=np.int16)
    rows = [
        ("tone", "audio", bytearray(encode_wav(tone, sr)), (0, 0, sr, 1, "wav")),
        ("silence", "audio", bytearray(encode_wav(quiet, sr)), (0, 0, sr, 1, "wav")),
        ("img", "image", bytearray(b"\x00" * 8), (2, 2, 0, 1, "raw")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["doc_id"]: r for r in audio_spectral_features(media).collect()}
    assert set(out) == {"tone", "silence"}  # image row filtered out

    r = out["tone"]
    assert r["sample_rate"] == sr and r["n_samples"] == sr
    assert abs(r["duration_sec"] - 1.0) < 1e-9
    assert abs(r["rms"] - 0.5 / 2**0.5) < 0.01  # sine rms = A/sqrt(2)
    assert abs(r["zcr"] - 2 * f / sr) < 0.01
    assert abs(r["dominant_hz"] - f) < 16000 / 512 + 1e-9  # within one bin
    assert abs(r["spectral_centroid"] - f) < 150  # window leakage spreads it
    # 8 bands over 0..8 kHz -> 1 kHz sits in band 1 ([1, 2) kHz);
    # Hann leakage puts some mass in band 0
    be = r["band_energy"]
    assert len(be) == 8 and abs(sum(be) - 1.0) < 1e-6
    assert be[0] + be[1] > 0.95 and max(be) in (be[0], be[1])

    s = out["silence"]
    assert s["rms"] == 0.0 and s["zcr"] == 0.0
    assert s["spectral_centroid"] == 0.0 and s["dominant_hz"] >= 0.0


def test_audio_spectral_features_short_and_fake(spark):
    """Signals shorter than n_fft zero-pad to one frame; fake blobs run
    through the same path at the fake 16 kHz rate."""
    import numpy as np

    from distributed_search_engine_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_spectral_features,
        encode_wav,
        pack_fake_media,
    )

    short = (np.ones(100) * 1000).astype(np.int16)
    rows = [
        ("short", "audio", bytearray(encode_wav(short, 8000)), (0, 0, 8000, 1, "wav")),
        ("fake", "audio", bytearray(pack_fake_media("audio", seed=3)), (0, 0, 16000, 1, "fake")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["doc_id"]: r for r in audio_spectral_features(media).collect()}
    assert out["short"]["n_samples"] == 100
    assert out["short"]["rms"] > 0
    assert out["fake"]["sample_rate"] == 16000
    assert len(out["fake"]["band_energy"]) == 8
