"""Multimodal-column queries (beyond-reference, SURVEY.md §7).

The media frame is manufactured deterministically from ``documents``
(datapipe.multimodal.attach_media: payload = UTF-8 bytes of text,
metadata = doc_id arithmetic), so even the Arrow-batched mapInPandas
operators are DuckDB-oracle-checkable: the oracle recomputes the same
quantities from the text column (pure-ASCII in the driver data, so
``unicode(char) == byte``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe.multimodal import (
    attach_media,
    decode_media,
    decode_media_codec,
    encode_bmp,
    encode_wav,
    extract_features,
    media_catalog,
    sample_frames,
)
from ..sources import load_table
from .registry import query


@query(
    "mm_media_catalog",
    survey="beyond:multimodal-catalog",
    oracle="""
    WITH media AS (
        SELECT doc_id,
               ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)]
                   AS media_type,
               octet_length(encode(text)) AS n_bytes,
               (doc_id % 16) * 64 + 64 AS width,
               (doc_id % 240 + 1) / 24.0 AS duration_s
        FROM documents
    )
    SELECT media_type,
           COUNT(*) AS n,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(FLOOR(SUM(width) * 1000000.0 / COUNT(*) + 0.5)
                AS BIGINT) AS avg_width_e6,
           CAST(ROUND(SUM(CAST(duration_s AS DECIMAL(27,6))), 4)
                AS DOUBLE) AS total_duration_s
    FROM media
    GROUP BY media_type
    """,
)
def mm_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return media_catalog(attach_media(docs))


@query(
    "mm_frame_sample",
    survey="beyond:multimodal-frames",
    oracle="""
    SELECT doc_id,
           UNNEST(generate_series(0, CAST(doc_id % 240 AS BIGINT), 24))
               AS frame_idx,
           doc_id % 240 + 1 AS n_frames
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_media(docs), every_n=24)


@query(
    "mm_decode_stub",
    survey="beyond:multimodal-decode",
    oracle="""
    SELECT doc_id,
           ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)]
               AS media_type,
           octet_length(encode(text)) AS n_bytes,
           CAST((doc_id % 16) * 64 + 64 AS INT) AS width,
           CAST((doc_id % 9) * 64 + 64 AS INT) AS height,
           FLOOR(list_avg(list_transform(string_split(text, ''),
                                         x -> unicode(x))) * 1000000)
               / 1000000 AS mean_byte
    FROM documents
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(attach_media(docs), fake=True)


# --------------------------------------------------------------------------
# REAL codec decode — no fake path, no PIL/ffmpeg: payloads are genuine
# BMP (even doc_id) and WAV (odd doc_id) containers built from doc_id
# arithmetic, then parsed off their actual header/pixel/sample
# structure by the pure-Python codecs. Because the encoded content is
# a deterministic function of doc_id, the DuckDB oracle can state the
# decoded geometry and mean values exactly.
# --------------------------------------------------------------------------
@query(
    "mm_decode_real",
    survey="beyond:multimodal-decode-real",
    priority=46,
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav'
                ELSE 'png' END AS codec,
           CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 16 + 1 AS INT)
                WHEN doc_id % 3 = 2 THEN CAST(doc_id % 13 + 1 AS INT)
           END AS width,
           CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 9 + 1 AS INT)
                WHEN doc_id % 3 = 2 THEN CAST(doc_id % 7 + 1 AS INT)
           END AS height,
           CASE WHEN doc_id % 3 = 1 THEN CAST(8000 AS INT) END
               AS sample_rate,
           CASE doc_id % 3
                WHEN 0 THEN CAST((doc_id % 16 + 1) * (doc_id % 9 + 1)
                                 AS BIGINT)
                WHEN 1 THEN CAST(doc_id % 240 + 1 AS BIGINT)
                ELSE CAST((doc_id % 13 + 1) * (doc_id % 7 + 1) AS BIGINT)
           END AS n_samples,
           CAST(CASE doc_id % 3 WHEN 0 THEN doc_id % 256
                     WHEN 1 THEN doc_id % 128
                     ELSE doc_id % 200 END AS DOUBLE) AS mean_val
    FROM documents
    """,
)
def mm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..datapipe.multimodal import encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def make_payloads(pdfs):
        for pdf in pdfs:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 3 == 0:
                    payloads.append(
                        encode_bmp(d % 16 + 1, d % 9 + 1, d % 256)
                    )
                elif d % 3 == 1:
                    payloads.append(encode_wav(d % 240 + 1, 8000, d % 128))
                else:
                    payloads.append(
                        encode_png(d % 13 + 1, d % 7 + 1, d % 200)
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(make_payloads, schema="doc_id long, payload binary")
    return decode_media_codec(media)


@query(
    "mm_byte_histogram",
    survey="beyond:multimodal-features",
    oracle="""
    WITH chars AS (
        SELECT doc_id,
               UNNEST(list_transform(string_split(text, ''),
                                     x -> unicode(x) // 32)) AS b
        FROM documents
    ),
    counts AS (
        SELECT doc_id, b, COUNT(*) AS c FROM chars GROUP BY doc_id, b
    ),
    grid AS (
        SELECT doc_id, UNNEST(generate_series(0, 7)) AS bucket
        FROM documents
    )
    SELECT grid.doc_id,
           CAST(grid.bucket AS INT) AS bucket,
           CAST(COALESCE(counts.c, 0) AS BIGINT) AS n_bytes
    FROM grid
    LEFT JOIN counts
      ON counts.doc_id = grid.doc_id AND counts.b = grid.bucket
    """,
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_media(docs), dim=8, normalize=False)
    return feats.select(
        "doc_id", F.posexplode("feature").alias("bucket", "n_bytes")
    )


@query(
    "mm_resize_images",
    survey="beyond:multimodal-resize",
    priority=60,
    oracle="""
    SELECT doc_id,
           'image' AS media_type,
           64 AS width,
           64 AS height,
           GREATEST(1, CAST(FLOOR(
               octet_length(encode(text)) *
               LEAST(1.0, 4096.0 / ((doc_id % 16 * 64 + 64)
                                    * (doc_id % 9 * 64 + 64)))
           ) AS BIGINT)) AS n_bytes
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched image resize plumbing (stub: proportional byte
    truncation — datapipe/multimodal.py:resize_images documents the
    real-codec swap point). The oracle recomputes the truncated
    payload length from the deterministic media synthesis, so the
    batch shape, scale arithmetic, and schema are all hash-checked."""
    from ..datapipe.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_images(attach_media(docs), 64, 64)
    return resized.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.octet_length("payload").alias("n_bytes"),
    )


# --------------------------------------------------------------------------
# Audio loudness analysis over a REAL WAV decode: ramp waveforms are
# non-constant, so RMS / peak / silence stats are non-trivial, yet the
# encoded signal is closed-form in doc_id — the oracle restates the
# exact integer arithmetic and the doubles match bit-for-bit (integer
# sums fold exactly; only the final division/sqrt are IEEE ops).
# --------------------------------------------------------------------------
@query(
    "mm_audio_features",
    survey="beyond:multimodal-audio-features",
    priority=60,
    oracle="""
    WITH g AS (
        SELECT doc_id,
               CAST(doc_id % 300 + 20 AS BIGINT) AS n,
               CAST(doc_id % 256 AS BIGINT) AS base
        FROM documents
    ),
    s AS (
        SELECT g.doc_id, g.n, ((g.base + t.i) % 256) - 128 AS dev
        FROM g, LATERAL (
            SELECT UNNEST(generate_series(0, g.n - 1)) AS i
        ) t
    )
    SELECT doc_id, n AS n_samples,
           SQRT(SUM(dev * dev) * 1.0 / n) AS rms,
           CAST(MAX(ABS(dev)) AS INT) AS peak,
           COUNT(*) FILTER (ABS(dev) < 8) * 1.0 / n AS silence_ratio
    FROM s GROUP BY doc_id, n
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode a deterministic ramp WAV per document, then run the real
    loudness pipeline: container parse (stdlib wave) → RMS around the
    8-bit midpoint, peak deviation, silence-band ratio. Both stages
    are Arrow-batched mapInPandas with no shuffle between them — the
    100 TB shape for audio feature extraction (payload-parallel,
    output rows ≪ payload bytes)."""
    import pandas as pd

    from ..datapipe.multimodal import audio_features, encode_wav_ramp

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def make_payloads(pdfs):
        for pdf in pdfs:
            payloads = [
                encode_wav_ramp(int(d) % 300 + 20, 8000, int(d) % 256)
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.mapInPandas(
        make_payloads, schema="doc_id long, payload binary"
    )
    return audio_features(media)


# --------------------------------------------------------------------------
# Perceptual-hash image dedup: real BMP decode → average-hash → group.
# The canonical image near-dup pipeline (exact-bit dedup misses
# re-encodes; ahash groups perceptually identical content). Payloads
# are pattern BMPs whose pixels are closed-form in doc_id, so the
# oracle reproduces the decoded luminance, the mean threshold, and the
# 63-bit signature exactly.
# --------------------------------------------------------------------------
@query(
    "mm_image_ahash_dedup",
    survey="beyond:multimodal-image-dedup",
    priority=60,
    oracle="""
    WITH px AS (
        SELECT doc_id, t.i,
               (doc_id % 32) * (t.i + 7) % 256 AS p
        FROM documents, LATERAL (
            SELECT UNNEST(generate_series(0, 63)) AS i
        ) t
    ),
    m AS (SELECT doc_id, SUM(p) * 1.0 / 64 AS mean FROM px GROUP BY 1),
    h AS (
        SELECT px.doc_id,
               CAST(SUM(CASE WHEN px.i < 63 AND px.p > m.mean
                        THEN (CAST(1 AS BIGINT) << CAST(px.i AS INT))
                        ELSE 0 END) AS BIGINT) AS ahash
        FROM px JOIN m USING (doc_id) GROUP BY px.doc_id
    )
    SELECT ahash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
    FROM h GROUP BY ahash
    """,
)
def mm_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document gets an 8×8 pattern BMP (32 distinct pattern
    classes via doc_id % 32); the pipeline decodes the real container,
    computes the average-hash signature, and groups perceptual
    duplicates, electing the lowest doc_id as canonical. Decode+hash
    is one Arrow-batched pass with no shuffle; the dup grouping
    shuffles only (hash → count) pairs."""
    import pandas as pd

    from ..datapipe.multimodal import encode_bmp_pattern, image_ahash

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def make_payloads(pdfs):
        for pdf in pdfs:
            payloads = [
                encode_bmp_pattern(8, 8, int(d) % 32)
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.mapInPandas(
        make_payloads, schema="doc_id long, payload binary"
    )
    sigs = image_ahash(media)
    joined = sigs.join(docs, "doc_id")
    return joined.groupBy("ahash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    )


# --------------------------------------------------------------------------
# Banded Hamming near-dup over perceptual hashes — the bitvector
# analog of MinHash-LSH: 4 bands of ~16 bits generate candidates via
# equi-joins, exact popcount verifies. With threshold d ≤ 3 < #bands,
# the pigeonhole principle makes banding LOSSLESS (any pair within
# distance 3 must agree on at least one full band), so the Spark
# candidate-generation path returns exactly the oracle's all-pairs
# answer — proven, not sampled.
# --------------------------------------------------------------------------
_HAMMING_MAX = 3
_N_BANDS = 4

_AHASH_CTE = """
    WITH px AS (
        SELECT doc_id, t.i,
               ((doc_id % 32) * (t.i + 7)
                + CASE WHEN doc_id % 2 = 1 AND t.i = doc_id % 5 + 8
                       THEN 128 ELSE 0 END) % 256 AS p
        FROM documents, LATERAL (
            SELECT UNNEST(generate_series(0, 63)) AS i
        ) t
    ),
    m AS (SELECT doc_id, SUM(p) * 1.0 / 64 AS mean FROM px GROUP BY 1),
    h AS (
        SELECT px.doc_id,
               CAST(SUM(CASE WHEN px.i < 63 AND px.p > m.mean
                        THEN (CAST(1 AS BIGINT) << CAST(px.i AS INT))
                        ELSE 0 END) AS BIGINT) AS ahash
        FROM px JOIN m USING (doc_id) GROUP BY px.doc_id
    )
"""


@query(
    "dedup_ahash_hamming",
    survey="beyond:multimodal-neardup-hamming",
    priority=60,
    oracle=_AHASH_CTE
    + f"""
    , sigs AS (SELECT ahash, COUNT(*) AS n FROM h GROUP BY ahash)
    SELECT a.ahash AS h1, b.ahash AS h2,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming_d,
           a.n AS n1, b.n AS n2
    FROM sigs a JOIN sigs b ON a.ahash < b.ahash
    WHERE bit_count(xor(a.ahash, b.ahash)) <= {_HAMMING_MAX}
    """,
)
def dedup_ahash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical image classes: signature pairs within Hamming
    distance {d}. Candidates come from {b} band-bucket equi-joins over
    16-bit slices (never an all-pairs crossJoin — at 100 TB the
    signature table is billions of rows and banding keeps candidate
    volume proportional to true collisions); the exact popcount filter
    then removes band-collision false positives. d < #bands makes the
    recall exact by pigeonhole."""
    import functools

    import pandas as pd

    from ..datapipe.multimodal import encode_bmp_pattern, image_ahash

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def make_payloads(pdfs):
        for pdf in pdfs:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_bmp_pattern(
                            8,
                            8,
                            int(d) % 32,
                            # odd docs carry a one-pixel corruption —
                            # the near-identical re-encode the Hamming
                            # join exists to catch
                            jitter_at=(int(d) % 5 + 8)
                            if int(d) % 2 == 1
                            else None,
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    media = docs.mapInPandas(
        make_payloads, schema="doc_id long, payload binary"
    )
    sigs = (
        image_ahash(media)
        .groupBy("ahash")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def band(col: F.Column, b: int) -> F.Column:
        return F.shiftright(col, b * 16).bitwiseAND(F.lit(0xFFFF))

    a = sigs.select(
        F.col("ahash").alias("h1"), F.col("n").alias("n1")
    )
    b_side = sigs.select(
        F.col("ahash").alias("h2"), F.col("n").alias("n2")
    )
    cands = [
        a.join(
            b_side,
            (band(F.col("h1"), i) == band(F.col("h2"), i))
            & (F.col("h1") < F.col("h2")),
        )
        for i in range(_N_BANDS)
    ]
    cand = functools.reduce(lambda x, y: x.unionByName(y), cands).distinct()
    d = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cand.filter(d <= _HAMMING_MAX).select(
        "h1", "h2", d.cast("int").alias("hamming_d"), "n1", "n2"
    )


# --------------------------------------------------------------------------
# Video scene-cut detection over REAL frame containers: each video is
# a concatenation of complete BMP frames walked off their declared
# header sizes; scene change = mean-luminance jump between adjacent
# frames. Frame content is closed-form in (doc_id, frame), so the
# oracle restates per-frame means and the LAG-delta cut rule exactly
# (sums of ints are exact; /64 is a power-of-two division, exact).
# --------------------------------------------------------------------------
@query(
    "mm_video_scene_cuts",
    survey="beyond:multimodal-video-scenes",
    priority=60,
    oracle="""
    WITH vids AS (
        SELECT doc_id, CAST(doc_id % 6 + 4 AS INT) AS n
        FROM documents
    ),
    frames AS (
        SELECT v.doc_id, v.n, f.f,
               (v.doc_id % 32
                + CASE WHEN f.f >= v.n // 2 THEN 16 ELSE 0 END) % 32
                   AS base
        FROM vids v, LATERAL (
            SELECT UNNEST(generate_series(0, v.n - 1)) AS f
        ) f
    ),
    means AS (
        SELECT fr.doc_id, fr.n, fr.f,
               SUM((fr.base * (t.i + 7)) % 256) * 1.0 / 64 AS m
        FROM frames fr, LATERAL (
            SELECT UNNEST(generate_series(0, 63)) AS i
        ) t
        GROUP BY fr.doc_id, fr.n, fr.f
    ),
    deltas AS (
        SELECT doc_id, n, f,
               ABS(m - LAG(m) OVER (
                   PARTITION BY doc_id ORDER BY f)) AS d
        FROM means
    )
    SELECT doc_id, CAST(MAX(n) AS INT) AS n_frames,
           CAST(COUNT(*) FILTER (d > 8.0) AS INT) AS n_cuts,
           CAST(COALESCE(MIN(f) FILTER (d > 8.0), -1) AS INT)
               AS first_cut_frame
    FROM deltas GROUP BY doc_id
    """,
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document becomes a 4-9 frame 'video' (concatenated BMP
    containers) whose pattern shifts halfway through; the pipeline
    walks the real frame headers, computes per-frame mean luminance,
    and reports cut count + first cut. Whether the halfway shift
    registers as a cut depends on the two patterns' actual means — so
    outcomes vary across docs and the oracle row is discriminating,
    not constant."""
    import pandas as pd

    from ..datapipe.multimodal import (
        encode_video_bmp_frames,
        video_scene_cuts,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def make_payloads(pdfs):
        for pdf in pdfs:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = d % 6 + 4
                bases = [
                    (d % 32 + (16 if f >= n // 2 else 0)) % 32
                    for f in range(n)
                ]
                payloads.append(encode_video_bmp_frames(bases))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.mapInPandas(
        make_payloads, schema="doc_id long, payload binary"
    )
    return video_scene_cuts(media)
