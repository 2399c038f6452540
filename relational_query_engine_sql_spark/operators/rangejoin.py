"""Banded (bucketed) range join: points ⋈ intervals without equi-keys.

A pure range predicate (``start <= t < end``) gives Catalyst no
equi-key, so a naive join plans as BroadcastNestedLoopJoin — quadratic
work, the classic 100 TB range-join killer. The standard rewrite bands
time into fixed buckets: every interval is exploded to the buckets it
overlaps, every point maps to exactly one bucket, and the join becomes
a hash equi-join on the bucket id with the exact range predicate as a
residual filter. Work drops from |points|×|intervals| to
|points| + Σ interval_span/band, and the exchange is a plain hash
shuffle that AQE can size and skew-split.

Each point falls in exactly one band and an interval emits each of its
bands once, so a (point, interval) pair can meet in at most one band —
no post-join dedup is needed.

Band width is a throughput knob: too narrow explodes intervals, too
wide inflates the residual filter's candidate set. A good default is
the median interval length (each interval lands in ~2 bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    band_seconds: int,
) -> DataFrame:
    """Join each point to every interval with start <= point < end.

    ``point_ts``/``start_ts``/``end_ts`` are timestamp columns. The
    output carries all columns from both sides. Inner join only: an
    outer variant through the exploded side would emit one null row
    per band for an unmatched interval — for LEFT JOIN semantics,
    aggregate this inner result and join it back to the original
    (un-exploded) interval table.
    """

    def bucket(col: Column) -> Column:
        return F.floor(F.unix_timestamp(col) / F.lit(band_seconds))

    exploded = intervals.withColumn(
        "__band",
        F.explode(
            F.sequence(bucket(F.col(start_ts)), bucket(F.col(end_ts)))
        ),
    )
    pts = points.withColumn("__band", bucket(F.col(point_ts)))
    cond = (
        (exploded["__band"] == pts["__band"])
        & (pts[point_ts] >= exploded[start_ts])
        & (pts[point_ts] < exploded[end_ts])
    )
    joined = exploded.join(pts, cond, "inner")
    return joined.drop("__band")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    band_seconds: int,
) -> DataFrame:
    """Interval × interval overlap join (``l_start < r_end AND
    r_start < l_end``) as a banded hash equi-join.

    Harder than the point-in-range case: BOTH sides explode to their
    covered bands, so an overlapping pair can meet in every band the
    overlap spans. Instead of a post-join ``distinct`` (an extra
    full-output shuffle), each pair is emitted exactly once by the
    first-shared-band residual: the pair only survives in the band
    where the LATER interval starts (``band ==
    greatest(bucket(l_start), bucket(r_start))``) — that band is
    shared whenever the intervals overlap, and it is unique. Work is
    |bands(L)| + |bands(R)| explode rows plus one keyed shuffle; the
    overlap predicate itself never sees a non-candidate pair.

    Bands are computed on whole seconds (``unix_timestamp``); the
    residual compares the raw timestamp columns, so sub-second
    precision only influences candidate banding, never correctness.
    """

    def bucket(col: str, side: DataFrame) -> Column:
        return F.floor(F.unix_timestamp(side[col]) / F.lit(band_seconds))

    le = left.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(l_start)) / band_seconds),
                F.floor(F.unix_timestamp(F.col(l_end)) / band_seconds),
            )
        ),
    )
    ri = right.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(r_start)) / band_seconds),
                F.floor(F.unix_timestamp(F.col(r_end)) / band_seconds),
            )
        ),
    )
    cond = (
        (le["__band"] == ri["__band"])
        & (le[l_start] < ri[r_end])
        & (ri[r_start] < le[l_end])
        & (
            le["__band"]
            == F.greatest(bucket(l_start, le), bucket(r_start, ri))
        )
    )
    return le.join(ri, cond, "inner").drop("__band")
