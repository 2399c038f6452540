"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference surface (the reference is text/numeric-only; SURVEY.md
§7). The pattern a 100 TB training-data pipeline needs:

* media rows = ``(id, media_type, payload binary, meta struct)`` — the
  payload is opaque to Spark; everything the *planner* needs (type,
  dimensions, duration) lives in the typed ``meta`` struct so filters
  and partition pruning never touch the bytes,
* decode / resize / feature-extract run as Arrow-batched
  ``mapInPandas`` — one Python worker per partition, whole column
  batches, never row-at-a-time,
* frame sampling is pure column algebra (``sequence`` + ``explode``) —
  no Python at all for the fan-out step.

The actual codec calls (PIL/librosa/ffmpeg) are NOT in this container,
so decoding is STUBBED: ``decode_media`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic stand-in derives
"pixels" from the payload bytes. The Spark-side plumbing — schemas,
batch shapes, UDF signatures, partitioning — is real and tested; a
deployment swaps ``_fake_decode`` for the codec and nothing else moves.

Since the driver testdata has no binary tables, :func:`attach_media`
manufactures the media frame deterministically from the ``documents``
table (payload = UTF-8 bytes of ``text``; metadata = arithmetic on
``doc_id``) — every derived column is reproducible in the DuckDB
oracle, which is what makes the metadata-level queries hash-checkable.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # codec stack absent in this container — plumbing still testable
    from PIL import Image  # noqa: F401

    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False

_MEDIA_TYPES = ["image", "audio", "video"]


def attach_media(docs: DataFrame) -> DataFrame:
    """documents → media frame with a binary payload and typed metadata.

    Deterministic: media_type cycles by doc_id; width/height/n_frames/
    sample_rate are doc_id arithmetic; payload is the UTF-8 encoding of
    the text. All JVM-side column expressions — zero Python.
    """
    mt = F.element_at(
        F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 16 * 64 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 9 * 64 + 64).cast("int").alias("height"),
            (F.col("doc_id") % 240 + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
            ((F.col("doc_id") % 240 + 1) / 24.0).alias("duration_s"),
        ).alias("meta"),
    )


def media_catalog(media: DataFrame) -> DataFrame:
    """Per-type catalog rollup — planner-level metadata only; the scan
    prunes the payload column entirely (check ReadSchema)."""
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            # integer-scaled emission (micro-width units), the r10
            # migration off LEGACY_RAW_DOUBLE. Exactness bound: the
            # scaled product SUM(width) * 1e6 is exactly representable
            # only while SUM(width) <= 2^53/1e6 ≈ 9.0e9 (plenty at any
            # test SF; beyond it the division is still deterministic
            # cross-engine, merely not exact-integer)
            F.floor(
                F.sum("meta.width") * F.lit(1000000.0)
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("avg_width_e6"),
            F.round(
                F.sum(F.col("meta.duration_s").cast("decimal(27,6)")), 4
            )
            .cast("double")
            .alias("total_duration_s"),
        )
    )


def sample_frames(media: DataFrame, every_n: int = 24) -> DataFrame:
    """Video rows → one row per sampled frame index (0, n, 2n, …).

    Pure ``sequence``+``explode`` fan-out: distributes with the rows,
    no Python, no shuffle (explode is a map-side operation).
    """
    vids = media.filter(F.col("media_type") == "video")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
        "meta.n_frames",
    )


# --------------------------------------------------------------------------
# Arrow-batched decode / resize / feature-extract (mapInPandas).
# --------------------------------------------------------------------------
_DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "mean_byte double"
)


def _trunc6(x: float) -> float:
    """Truncate to 6 decimals. Truncation (not round()) because Python
    rounds half-to-even while SQL engines round half-away-from-zero —
    floor(x*1e6)/1e6 is bit-identical in both, keeping the stub
    oracle-checkable."""
    import math

    return math.floor(x * 1e6) / 1e6


def _fake_decode(payload: bytes) -> tuple[int, float]:
    """Deterministic stand-in for a codec: 'decoding' reports byte
    length and mean byte value. Replace with PIL/librosa in deployment."""
    n = len(payload)
    return n, _trunc6(sum(payload) / n) if n else 0.0


# --------------------------------------------------------------------------
# Real pure-Python codecs: BMP (struct header walk), PNG (zlib
# inflate + scanline unfiltering), and WAV (stdlib wave module). These
# need no PIL/librosa/ffmpeg — they are the non-fake decode path;
# formats beyond BMP/PNG/WAV still gate on the codec stack.
# --------------------------------------------------------------------------


def sniff_codec(payload: bytes) -> str | None:
    """Magic-byte container sniff: 'bmp' | 'wav' | 'png' | 'jpeg' |
    None."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


def _decode_jpeg_pil(payload: bytes) -> tuple[int, int, int, float]:
    """JPEG via PIL when the codec stack is present (optional-dependency
    probe): (width, height, n_pixels, mean luminance byte) — the same
    shape the stdlib codecs report. Callers gate on ``_HAS_CODECS``."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L")
    w, h = img.size
    data = list(img.getdata())
    n = w * h
    return w, h, n, _trunc6(sum(data) / n) if n else 0.0


def encode_bmp(width: int, height: int, value: int) -> bytes:
    """Minimal valid 24bpp bottom-up BI_RGB bitmap filled with one byte
    value (deterministic test/pipeline payloads)."""
    import struct

    row = bytes([value % 256]) * (width * 3)
    pad = b"\x00" * ((4 - (width * 3) % 4) % 4)
    pixels = (row + pad) * height
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return header + dib + pixels


def encode_bmp_pattern(
    width: int, height: int, base: int, jitter_at: int | None = None
) -> bytes:
    """24bpp grayscale BMP with a base-dependent test pattern:
    luminance at image index idx (top-down, row-major) is
    ``(base * (idx + 7)) % 256`` — distinct bases produce distinct
    pixel layouts (an additive ramp would make every average-hash
    identical, since ahash is shift-invariant). ``jitter_at`` adds 128
    to one pixel — a 'corrupted re-encode' that perturbs the
    perceptual hash by a few bits without changing the image class."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    rows = []
    # file stores rows bottom-up
    for y in reversed(range(height)):
        row = bytearray()
        for x in range(width):
            idx = y * width + x
            v = (base * (idx + 7) + (128 if idx == jitter_at else 0)) % 256
            row += bytes((v, v, v))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pixels = b"".join(rows)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return header + dib + pixels


def decode_bmp_gray(payload: bytes) -> list[int]:
    """Parse a 24bpp BMP into a top-down row-major luminance list
    (first channel byte; the pattern encoder writes equal channels).
    Real header walk — geometry, bottom-up order, and stride padding
    all come off the container, not trusted metadata."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"only 24bpp BMP supported, got {bpp}")
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    out: list[int] = []
    for y in range(height):
        r = height - 1 - y  # file row for image row y (bottom-up)
        row = payload[offset + r * stride : offset + r * stride + width * 3]
        out.extend(row[0::3])
    return out


def encode_video_bmp_frames(frame_bases: list[int]) -> bytes:
    """'Video' as a concatenation of 8×8 pattern-BMP frames — each
    frame is a complete, self-describing BMP container, so decoding
    means walking real headers (the declared file-size field at byte
    offset 2), not slicing at assumed strides."""
    return b"".join(encode_bmp_pattern(8, 8, b) for b in frame_bases)


def split_video_frames(payload: bytes) -> list[bytes]:
    """Walk concatenated BMP containers off their declared sizes."""
    import struct

    frames: list[bytes] = []
    off = 0
    while off < len(payload):
        if payload[off : off + 2] != b"BM":
            raise ValueError(f"bad frame magic at offset {off}")
        (size,) = struct.unpack_from("<I", payload, off + 2)
        frames.append(payload[off : off + size])
        off += size
    return frames


_SCENE_SCHEMA = (
    "doc_id long, n_frames int, n_cuts int, first_cut_frame int"
)


def video_scene_cuts(media: DataFrame, threshold: float = 8.0) -> DataFrame:
    """Scene-cut detection: decode every frame (real BMP parse), take
    mean luminance per frame, flag frame f as a cut when
    |mean_f − mean_{f−1}| > threshold. Arrow-batched mapInPandas —
    frame-parallel within a payload batch, no shuffle; emits one
    bounded row per video however many frames it holds (the 100 TB
    video-pipeline shape: features out, pixels never shuffled)."""
    import pandas as pd

    def batches(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in pdfs:
            out = {
                "doc_id": [],
                "n_frames": [],
                "n_cuts": [],
                "first_cut_frame": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                means = []
                for fr in split_video_frames(bytes(payload)):
                    px = decode_bmp_gray(fr)
                    means.append(sum(px) / len(px))
                cuts = [
                    f
                    for f in range(1, len(means))
                    if abs(means[f] - means[f - 1]) > threshold
                ]
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(len(means))
                out["n_cuts"].append(len(cuts))
                out["first_cut_frame"].append(cuts[0] if cuts else -1)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=_SCENE_SCHEMA)


_AHASH_SCHEMA = "doc_id long, ahash long"


def image_ahash(media: DataFrame) -> DataFrame:
    """Average-hash perceptual signature of decoded images: bit i set
    iff pixel i is brighter than the image mean (bits 0..62 — 63 bits
    keep the signature a positive SQL BIGINT). Identical images hash
    identically; near-identical ones differ in few bits. Arrow-batched
    mapInPandas over the real BMP decode — payload-parallel, no
    shuffle; the downstream dup-grouping is one hash-key groupBy."""
    import pandas as pd

    def batches(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in pdfs:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_bmp_gray(bytes(payload))
                mean = sum(px) / len(px)
                h = 0
                for i, p in enumerate(px[:63]):
                    if p > mean:
                        h |= 1 << i
                ids.append(int(doc_id))
                hashes.append(h)
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    return media.mapInPandas(batches, schema=_AHASH_SCHEMA)


def _decode_bmp(payload: bytes) -> tuple[int, int, int, float]:
    """Parse a 24bpp BI_RGB bitmap: (width, height, n_pixels,
    mean_pixel_byte). Walks rows off the real header geometry and skips
    stride padding — not a trusted-metadata shortcut."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"only 24bpp BMP supported, got {bpp}")
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    total = 0
    for r in range(height):
        row = payload[offset + r * stride : offset + r * stride + width * 3]
        total += sum(row)
    n_pixels = width * height
    mean = _trunc6(total / (n_pixels * 3)) if n_pixels else 0.0
    return width, height, n_pixels, mean


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, value: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG filled with one byte value —
    stdlib only (zlib deflate + crc32)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes([value % 256]) * width for _ in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filters 0-4 (None/Sub/Up/Average/Paeth)."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += line
        prev = line
    return out


def _decode_png(payload: bytes) -> tuple[int, int, int, float]:
    """Parse a PNG (8-bit grayscale or truecolor, no interlace):
    (width, height, n_pixels, mean_channel_byte). Real chunk walk +
    zlib inflate + scanline unfiltering — not a metadata shortcut."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bpp = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            if ctype == 0:
                bpp = 1
            elif ctype == 2:
                bpp = 3
            else:
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or bpp is None:
        raise ValueError("PNG missing IHDR")
    pixels = _png_unfilter(zlib.decompress(idat), width, height, bpp)
    n_pixels = width * height
    mean = _trunc6(sum(pixels) / (n_pixels * bpp)) if n_pixels else 0.0
    return width, height, n_pixels, mean


def encode_wav(n_frames: int, sample_rate: int, value: int) -> bytes:
    """Minimal mono 8-bit PCM WAV filled with one sample value."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(bytes([value % 256]) * n_frames)
    return buf.getvalue()


def encode_wav_ramp(n_frames: int, sample_rate: int, base: int) -> bytes:
    """Mono 8-bit PCM WAV with a deterministic ramp waveform:
    sample[i] = (base + i) % 256 — a non-constant signal so loudness /
    peak / silence statistics are non-trivial yet closed-form (the
    oracle restates them from (base, n_frames) arithmetic)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(bytes((base + i) % 256 for i in range(n_frames)))
    return buf.getvalue()


_AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_samples long, rms double, peak int, "
    "silence_ratio double"
)


def audio_features(media: DataFrame, silence_band: int = 8) -> DataFrame:
    """Loudness analysis of 8-bit PCM WAV payloads: RMS amplitude
    around the 128 midpoint, peak |deviation|, and the fraction of
    samples inside the ±``silence_band`` dead zone.

    Arrow-batched ``mapInPandas`` — the decode is a real container
    parse (stdlib wave), the statistics are exact integer sums folded
    in Python ints (no float accumulation), and only the final
    division/sqrt are IEEE double ops, so a SQL oracle computing the
    same arithmetic reproduces the doubles bit-exactly. Scales like
    every codec op here: payload-parallel, no shuffle, output rows ≪
    payload bytes."""
    import io
    import math
    import wave

    import pandas as pd

    def batches(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in pdfs:
            out: dict[str, list] = {
                "doc_id": [],
                "n_samples": [],
                "rms": [],
                "peak": [],
                "silence_ratio": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    if w.getsampwidth() != 1:
                        raise ValueError("only 8-bit PCM supported")
                    frames = w.readframes(w.getnframes())
                n = len(frames)
                sq = 0
                peak = 0
                quiet = 0
                for s in frames:
                    dev = s - 128
                    sq += dev * dev
                    if abs(dev) > peak:
                        peak = abs(dev)
                    if abs(dev) < silence_band:
                        quiet += 1
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(n)
                out["rms"].append(math.sqrt(sq / n) if n else 0.0)
                out["peak"].append(peak)
                out["silence_ratio"].append(quiet / n if n else 0.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=_AUDIO_FEATURES_SCHEMA)


def _decode_wav(payload: bytes) -> tuple[int, int, float]:
    """Parse a WAV container (stdlib wave): (sample_rate, n_samples,
    mean_sample) for mono 8-bit PCM."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 1:
            raise ValueError("only 8-bit PCM supported")
        rate = w.getframerate()
        n = w.getnframes() * w.getnchannels()
        frames = w.readframes(w.getnframes())
    mean = _trunc6(sum(frames) / n) if n else 0.0
    return rate, n, mean


_DECODED_CODEC_SCHEMA = (
    "doc_id long, codec string, width int, height int, sample_rate int, "
    "n_samples long, mean_val double"
)


def decode_media_codec(media: DataFrame) -> DataFrame:
    """REAL decode via the pure-Python BMP/WAV codecs — no fake path.

    Arrow-batched ``mapInPandas``; each payload is sniffed by magic
    bytes and parsed off its actual container structure. Opaque
    payloads raise (a training pipeline would dead-letter them; here
    loud failure keeps the correctness contract honest). Images report
    (width, height, n_pixels, mean pixel byte); audio reports
    (sample_rate, n_samples, mean sample value).
    """

    def batches(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                codec = sniff_codec(p)
                if codec == "bmp":
                    w, h, n, mean = _decode_bmp(p)
                    rows.append((doc_id, "bmp", w, h, None, n, mean))
                elif codec == "png":
                    w, h, n, mean = _decode_png(p)
                    rows.append((doc_id, "png", w, h, None, n, mean))
                elif codec == "wav":
                    rate, n, mean = _decode_wav(p)
                    rows.append((doc_id, "wav", None, None, rate, n, mean))
                elif codec == "jpeg" and _HAS_CODECS:
                    w, h, n, mean = _decode_jpeg_pil(p)
                    rows.append((doc_id, "jpeg", w, h, None, n, mean))
                else:
                    raise NotImplementedError(
                        "payload needs the PIL/librosa/ffmpeg codec "
                        "stack (absent here); BMP/PNG/WAV decode with "
                        "the stdlib codecs, JPEG additionally when PIL "
                        "is importable"
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "codec", "width", "height", "sample_rate",
                    "n_samples", "mean_val",
                ],
            )

    return media.mapInPandas(batches, schema=_DECODED_CODEC_SCHEMA)


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads via Arrow-batched ``mapInPandas``.

    BMP/WAV payloads decode for real with no external dependency —
    see :func:`decode_media_codec`. This entry point covers arbitrary
    media types, which need the codec stack (PIL/librosa/ffmpeg) this
    container doesn't ship — pass ``fake=True`` to run the
    deterministic stand-in through the identical plumbing.
    """
    if not fake and not _HAS_CODECS:
        raise NotImplementedError(
            "media codecs (PIL/librosa/ffmpeg) not installed; "
            "use decode_media_codec() for real BMP/WAV parsing or "
            "decode_media(media, fake=True) for the stub path"
        )

    def batches(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in pdfs:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": decoded.map(lambda t: t[0]),
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "mean_byte": decoded.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(batches, schema=_DECODED_SCHEMA)


_RESIZED_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int"
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' image payloads (stub: proportional byte truncation —
    a real deployment calls Image.resize here; batch shape, schema,
    and partition behavior are identical)."""

    def batches(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in pdfs:
            imgs = pdf[pdf["media_type"] == "image"]
            scale = [
                min(
                    1.0,
                    (width * height)
                    / max(1, m["width"] * m["height"]),
                )
                for m in imgs["meta"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": imgs["doc_id"],
                    "media_type": imgs["media_type"],
                    "payload": [
                        p[: max(1, int(len(p) * s))]
                        for p, s in zip(imgs["payload"], scale)
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(batches, schema=_RESIZED_SCHEMA)


_FEATURE_SCHEMA = "doc_id long, feature array<double>"
_COUNT_SCHEMA = "doc_id long, feature array<long>"


def extract_features(
    media: DataFrame, dim: int = 8, normalize: bool = True
) -> DataFrame:
    """Byte-histogram feature vector per payload (the stand-in for a
    vision/audio encoder). ``dim`` buckets over byte values 0..255;
    L1-normalized by default, raw counts with ``normalize=False``
    (integer counts hash-match an SQL oracle exactly — no float
    rounding-mode concerns)."""

    def batches(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        import numpy as np

        for pdf in pdfs:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr // (256 // dim), minlength=dim)[:dim]
                if normalize:
                    total = hist.sum() or 1
                    feats.append([_trunc6(v) for v in hist / total])
                else:
                    feats.append(hist.tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media.mapInPandas(
        batches, schema=_FEATURE_SCHEMA if normalize else _COUNT_SCHEMA
    )
