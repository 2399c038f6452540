"""As-of / latest-per-key operators.

The reference implements "latest price per symbol" as an N+1 loop —
one ``ORDER BY timestamp DESC LIMIT 1`` query per key
(``/root/reference/src/routes/portfolio.js:289-302``,
``src/routes/holdings.js:46-65``, ``src/routes/trading.js:22-35``).
That's 2·N process round-trips on a web stack and would be N driver
round-trips on Spark. The set-based rewrite here is one window + one
join: a single shuffle on the key, fully distributed, and the window
is rank-based so only one row per key survives the exchange.

At 100 TB: ``latest_per_key`` shuffles the fact table once on ``keys``.
If the fact table is already bucketed/partitioned by the key, the
exchange is elided. AQE handles skewed keys (one hot symbol) by
splitting the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
    as_of: object | None = None,
) -> DataFrame:
    """Most recent row per key group, optionally as-of a cutoff.

    Equivalent to the reference's per-key
    ``WHERE symbol=$1 AND timestamp::date <= CURRENT_DATE
    ORDER BY timestamp DESC LIMIT 1`` loop, set-based.
    """
    if as_of is not None:
        df = df.filter(F.col(order_col) <= F.lit(as_of))
    order = [F.col(order_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """General as-of join: for each left row, the closest right row at or
    before (``backward``) / at or after (``forward``) its timestamp,
    matching on equi-keys ``on``.

    Spark has no native as-of join; this composes built-ins:
    union both sides tagged by origin, one window sorted by
    (key, time) carries the most recent right-row values forward with
    ``last(..., ignorenulls=True)`` — a single shuffle on the key, no
    range-explosion, no pandas. Scales as a plain window over
    (keys, time).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    rcols = [c for c in right.columns if c not in on and c != right_time]
    # Tag and align the two sides on a common schema.
    lt = left.withColumn("__t", F.col(left_time)).withColumn("__src", F.lit(1))
    for c in rcols:
        lt = lt.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    rt = right.withColumn("__t", F.col(right_time)).withColumn("__src", F.lit(0))
    rt = rt.select(
        *on,
        "__t",
        "__src",
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    )
    lcols = [c for c in left.columns]
    lt = lt.select(*on, "__t", "__src", *[f"{c}{suffix}" for c in rcols],
                   *[c for c in lcols if c not in on])
    rt = rt.select(
        *on, "__t", "__src", *[f"{c}{suffix}" for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
    )
    unioned = lt.unionByName(rt)

    if direction == "backward":
        # right rows (__src=0) sort before left rows at equal time so an
        # exact-time match is visible to the left row.
        w = (
            W.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__src").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        filled = unioned.select(
            *on, "__t", "__src",
            *[c for c in lcols if c not in on],
            *[
                F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in rcols
            ],
        )
    else:
        w = (
            W.partitionBy(*on)
            .orderBy(F.col("__t").desc(), F.col("__src").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        filled = unioned.select(
            *on, "__t", "__src",
            *[c for c in lcols if c not in on],
            *[
                F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in rcols
            ],
        )

    return filled.filter(F.col("__src") == 1).drop("__t", "__src")
