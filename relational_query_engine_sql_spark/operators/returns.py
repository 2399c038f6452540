"""Window-based return series (SURVEY.md §2.5 W1/W2).

The reference computes daily simple returns with
``LAG(close) OVER (PARTITION BY symbol ORDER BY timestamp)``
(``/root/reference/src/routes/portfolio.js:396-400,453-458``) and always
filters the first-row NULL (``portfolio.js:376,405,412,472``).

These helpers are generic over (key, time, value) so they serve both
the domain ``stocks`` table and the driver's ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def daily_close_panel(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Collapse an event-level series to a (key, day) panel using the
    daily mean — the analog of a daily close. Output columns:
    (key, d, close). Partial aggregation is map-side; one shuffle on
    (key, d)."""
    return (
        df.groupBy(F.col(key), F.to_date(F.col(ts_col)).alias("d"))
        .agg(F.avg(value_col).alias("close"))
    )


def returns_panel(
    panel: DataFrame,
    key: str | None,
    time_col: str = "d",
    close_col: str = "close",
    keep_null: bool = False,
) -> DataFrame:
    """Daily simple return r_t = (close_t - close_{t-1}) / close_{t-1}.

    ``key=None`` gives the reference's unpartitioned W1 form
    (single-symbol slice, portfolio.js:367-372); otherwise the
    partitioned W2 form. The first row per key has NULL return and is
    dropped unless ``keep_null`` (mirrors the reference's explicit
    ``WHERE r IS NOT NULL``, F7).
    """
    w = (
        W.partitionBy(key).orderBy(time_col)
        if key is not None
        else W.orderBy(time_col)
    )
    prev = F.lag(close_col, 1).over(w)
    out = panel.withColumn("r", (F.col(close_col) - prev) / prev)
    if not keep_null:
        out = out.filter(F.col("r").isNotNull())
    return out
