"""Batch-equivalent entries for the streaming operators
(SURVEY.md §2.9 / §7): tumbling-window aggregation and sessionization.

The streaming variants (watermark, session_window, stateful op) run in
tests/test_streaming.py with a memory sink; these registry entries pin
the same semantics to a DuckDB oracle in batch mode — for a 1-hour
tumbling window, ``window(ts).start`` ≡ ``date_trunc('hour', ts)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..streaming.events import sessionize_batch, tumbling_aggregate
from .registry import query


@query(
    "stream_tumbling_hourly",
    survey="streaming:tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_aggregate(ev, window="1 hour")


@query(
    "sessionization",
    survey="streaming:session",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts)
                         - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                        > 1800000000
                    THEN 1 ELSE 0 END AS newsess
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(newsess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) + 1 AS session_id
        FROM marked
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_minutes=30)
