"""Time-series utilities beyond the reference's own surface.

The reference charts daily closes and implicitly assumes a dense
series (``/root/reference/src/routes/chart.js`` feeds query rows
straight to the chart API); real OHLCV has holidays and halts, and a
per-entity activity series is mostly holes. ``gap_fill`` densifies:
scaffold every (key, day) slot in the observed range, then carry the
last observation forward.

Scale shape: the scaffold is keys × days — generated with
``sequence``/``explode`` (no driver loop), joined once, then a single
partitioned window. State per key is one value; the fill never
shuffles more than the scaffold itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def gap_fill(
    daily: DataFrame,
    key: str,
    time_col: str = "d",
    value_col: str = "v",
) -> DataFrame:
    """Forward-fill ``value_col`` over a dense daily scaffold.

    ``daily``: one row per observed (key, day). Output: one row per
    (key, day) for EVERY day in [global min, global max], with
    ``filled`` = last observed value at or before that day (null before
    a key's first observation).
    """
    bounds = daily.agg(
        F.min(time_col).alias("_lo"), F.max(time_col).alias("_hi")
    )
    scaffold = (
        daily.select(key)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"))
            ).alias(time_col),
        )
    )
    w = (
        W.partitionBy(key)
        .orderBy(time_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        scaffold.join(daily, [key, time_col], "left")
        .withColumn("filled", F.last(value_col, ignorenulls=True).over(w))
        .select(key, time_col, "filled")
    )


def downsample_ohlc(
    events: DataFrame,
    key: str,
    time_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """OHLC downsampling: per (key, time bucket) — open = value at the
    earliest tick, close = at the latest, high/low = extremes.

    One shuffle on (key, bucket); open/close use ``min_by``/``max_by``
    over a struct of (time, tiebreak) so simultaneous ticks resolve
    deterministically. This is the map-side-combinable formulation —
    no window, no sort — so at 100 TB it is a plain partial-aggregate
    tree, the cheapest possible shape for bar-building over a tick
    firehose.
    """
    b = F.date_trunc(bucket, F.col(time_col)).alias("bucket")
    order = F.struct(F.col(time_col), F.col(tiebreak))
    return events.groupBy(F.col(key), b).agg(
        F.min_by(value_col, order).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, order).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
