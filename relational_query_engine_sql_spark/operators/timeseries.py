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
