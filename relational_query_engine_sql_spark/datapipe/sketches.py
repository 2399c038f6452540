"""Deterministic streaming sketches: Count-Min and K-Minimum-Values.

At 100 TB exact per-key state stops fitting anywhere: sketches are the
bounded-memory substitute, and they are Spark-native by construction —
every sketch cell is an associative aggregate, so the partial sketch
builds map-side in each task and the shuffle moves only the fixed-size
cell table (1 024 cells for the CMS below) no matter how many input
rows exist. That is the purest form of the map-side-combine story.

Both sketches are pure functions of the data: hashes come from md5 on
the key's decimal string, buckets are HEX SUBSTRINGS of that digest
(two hex chars = 256 buckets), never engine-private hash functions —
so the DuckDB oracle reproduces the sketch bit-for-bit and the driver
can hash-compare it like any exact query. Spark's own sketch surface
(``approx_count_distinct``) stays registered rows-only precisely
because its HLL registers are engine-private; these operators are the
portable, auditable alternative.

Estimation guarantees (pinned in tests/test_sketches.py):
- CMS: estimate ≥ true count always; overshoot bounded by the
  classical e·N/w with probability 1-(1/2)^depth.
- KMV: the k-th smallest hash's fraction of the hash space estimates
  distinct count as (k-1)/frac(h_k); merging two sketches = merge-sort
  + take-k, proving the sketch is distributive over unions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 256  # buckets per row: one 2-hex-char slice of the digest


def _key_hash(key: Column) -> Column:
    return F.md5(key.cast("string"))


def cms_build(df: DataFrame, key: str) -> DataFrame:
    """Count-Min sketch of the frequency of ``key``: one row per
    (hash-row, bucket) cell with the total count landing there.

    The output is at most CMS_DEPTH × CMS_WIDTH rows regardless of
    input size — the whole sketch broadcasts.
    """
    rows = F.explode(
        F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))
    ).alias("i")
    cells = df.select(_key_hash(F.col(key)).alias("h")).select(
        "h", rows
    )
    return (
        cells.select(
            "i",
            F.expr("substring(h, 1 + 2*i, 2)").alias("bucket"),
        )
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(keys: DataFrame, sketch: DataFrame, key: str) -> DataFrame:
    """Point-frequency estimates: min over the key's cell in each hash
    row. ``sketch`` is tiny (≤1 024 rows) so the lookup is a broadcast
    join; the min collapses the CMS_DEPTH matches per key."""
    k = keys.select(
        F.col(key), _key_hash(F.col(key)).alias("h")
    ).distinct()
    joined = k.join(
        F.broadcast(sketch),
        F.expr("bucket = substring(h, 1 + 2*i, 2)"),
    )
    return joined.groupBy(key).agg(F.min("cnt").alias("cms_est"))


def kmv_sketch(df: DataFrame, key: str, k: int = 64) -> DataFrame:
    """K-minimum-values distinct sketch: the k lexicographically
    smallest md5 digests of the distinct keys. ``orderBy().limit()``
    plans as TakeOrderedAndProject — per-partition partial top-k, no
    global sort — so the sketch build is one pass + one tiny exchange.
    """
    return (
        df.select(_key_hash(F.col(key)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(hashes: list[str], k: int) -> float:
    """Driver-side estimate from a collected KMV sketch: distinct ≈
    (k-1) / fraction(h_k). Exposed for tests and interactive use; the
    registered query returns the sketch itself (exactly comparable),
    not the float."""
    if len(hashes) < k:
        return float(len(hashes))  # sketch saw every distinct key
    frac = int(hashes[k - 1][:15], 16) / float(16**15)
    return (k - 1) / frac
