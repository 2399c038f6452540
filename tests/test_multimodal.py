"""Multimodal binary-column plumbing (datapipe/multimodal.py).

The codec stack (PIL/librosa/ffmpeg) is absent in this container, so
decode is a deterministic stub — these tests pin the Spark-side
mechanics: schemas, the NotImplementedError gate, mapInPandas batch
behavior, and stub determinism. Oracle parity for the four registry
queries runs in test_oracle_parity.py.
"""

from __future__ import annotations

import pytest

from relational_query_engine_sql_spark.datapipe.multimodal import (
    _HAS_CODECS,
    attach_media,
    decode_media,
    extract_features,
    resize_images,
    sample_frames,
)
from relational_query_engine_sql_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    return attach_media(docs).cache()


def test_media_schema(media):
    d = dict(media.dtypes)
    assert d["payload"] == "binary"
    assert d["media_type"] == "string"
    assert d["meta"].startswith("struct<width:int,height:int,n_frames:int")


def test_payload_is_utf8_text(spark, sf_small, media):
    docs = load_table(spark, sf_small, "documents")
    joined = media.join(docs, "doc_id").select(
        "payload", "text", "n_chars"
    )
    row = joined.first()
    assert bytes(row["payload"]).decode("utf-8") == row["text"]


def test_decode_gate_without_codecs(media):
    if _HAS_CODECS:
        pytest.skip("codec stack present; gate not reachable")
    with pytest.raises(NotImplementedError):
        decode_media(media, fake=False)


def test_decode_stub_deterministic(media):
    a = decode_media(media, fake=True).orderBy("doc_id").collect()
    b = decode_media(media, fake=True).orderBy("doc_id").collect()
    assert a == b
    # n_bytes equals actual payload length
    lens = {
        r["doc_id"]: len(bytes(r["payload"]))
        for r in media.select("doc_id", "payload").collect()
    }
    for r in a:
        assert r["n_bytes"] == lens[r["doc_id"]]
        assert 0.0 <= r["mean_byte"] <= 255.0


def test_frame_sampling_counts(media):
    frames = sample_frames(media, every_n=24)
    rows = frames.groupBy("doc_id", "n_frames").count().collect()
    assert rows, "no video rows sampled"
    for r in rows:
        # sequence(0, n_frames-1, 24) has ceil(n_frames/24) elements
        assert r["count"] == -(-r["n_frames"] // 24)


def test_resize_images_only_and_bounded(media):
    out = resize_images(media, 64, 64)
    assert dict(out.dtypes)["payload"] == "binary"
    rows = out.collect()
    assert all(r["width"] == 64 and r["height"] == 64 for r in rows)
    n_images = media.filter("media_type = 'image'").count()
    assert len(rows) == n_images
    orig = {
        r["doc_id"]: len(bytes(r["payload"]))
        for r in media.select("doc_id", "payload").collect()
    }
    for r in rows:
        assert 1 <= len(bytes(r["payload"])) <= orig[r["doc_id"]]


def test_feature_histogram_sums(media):
    counts = extract_features(media, dim=8, normalize=False).collect()
    lens = {
        r["doc_id"]: len(bytes(r["payload"]))
        for r in media.select("doc_id", "payload").collect()
    }
    for r in counts:
        assert len(r["feature"]) == 8
        assert sum(r["feature"]) == lens[r["doc_id"]]
    normed = extract_features(media, dim=8, normalize=True).first()
    assert abs(sum(normed["feature"]) - 1.0) < 1e-4


def test_bmp_roundtrip():
    from relational_query_engine_sql_spark.datapipe.multimodal import (
        _decode_bmp,
        encode_bmp,
        sniff_codec,
    )

    payload = encode_bmp(5, 3, 200)
    assert sniff_codec(payload) == "bmp"
    w, h, n, mean = _decode_bmp(payload)
    assert (w, h, n) == (5, 3, 15)
    assert mean == 200.0


def test_wav_roundtrip():
    from relational_query_engine_sql_spark.datapipe.multimodal import (
        _decode_wav,
        encode_wav,
        sniff_codec,
    )

    payload = encode_wav(120, 8000, 77)
    assert sniff_codec(payload) == "wav"
    rate, n, mean = _decode_wav(payload)
    assert (rate, n) == (8000, 120)
    assert mean == 77.0


def test_decode_media_codec_rejects_opaque(spark):
    import pytest as _pytest

    from relational_query_engine_sql_spark.datapipe.multimodal import (
        decode_media_codec,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"not a container"))], "doc_id long, payload binary"
    )
    with _pytest.raises(Exception, match="NotImplementedError|BMP"):
        decode_media_codec(media).collect()


def test_png_roundtrip():
    from relational_query_engine_sql_spark.datapipe.multimodal import (
        _decode_png,
        encode_png,
        sniff_codec,
    )

    payload = encode_png(9, 4, 123)
    assert sniff_codec(payload) == "png"
    w, h, n, mean = _decode_png(payload)
    assert (w, h, n) == (9, 4, 36)
    assert mean == 123.0


def test_png_unfilters_all_filter_types():
    """Hand-filter a known RGB image with Sub/Up/Average/Paeth rows and
    check the decoder's unfiltering recovers the exact pixel mean."""
    import struct
    import zlib

    from relational_query_engine_sql_spark.datapipe.multimodal import (
        _decode_png,
        _png_chunk,
    )

    width, height, bpp = 5, 4, 3
    stride = width * bpp
    img = [
        bytes((r * 37 + i * 11) % 256 for i in range(stride))
        for r in range(height)
    ]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = b""
    prev = bytes(stride)
    for r, (ftype) in enumerate([1, 2, 3, 4]):
        line = img[r]
        if ftype == 1:
            f = bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:
            f = bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:
            f = bytes(
                (line[i] - ((line[i - bpp] if i >= bpp else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        else:
            f = bytes(
                (
                    line[i]
                    - paeth(
                        line[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        raw += bytes([ftype]) + f
        prev = line

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    w, h, n, mean = _decode_png(payload)
    assert (w, h, n) == (width, height, width * height)
    want = sum(sum(row) for row in img) / (width * height * bpp)
    assert abs(mean - want) < 1e-6
