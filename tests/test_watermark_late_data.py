"""Watermark semantics under real micro-batch sequencing: rows arriving
after the watermark has passed their window must be DROPPED, not
aggregated — the property that bounds streaming state (SCALE.md).

Micro-batch boundaries are forced by running three sequential
availableNow passes over a shared checkpoint (watermark state persists
across restarts; the file sink supports checkpoint recovery, the
memory sink does not). Source files are written as single parquet
FILES — the file-stream source ignores subdirectories, so a
Spark-writer directory would silently contribute zero rows.

- run 1: events in hours 0..10 → watermark commits at 08:15
- run 2: a LATE event at 03:30 (below watermark) + on-time 11:15
- run 3: on-time 12:15, flushing finalized windows

Expected: every finalized hour has exactly its run-1 count (the late
row was dropped — hour 3 would show 2 otherwise), and windows past the
final watermark never finalize.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import types as T

from relational_query_engine_sql_spark.streaming.events import (
    tumbling_aggregate,
)

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _write_file(path: str, rows: list[tuple]) -> None:
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(path, index=False)


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    src = tmp_path / "stream_src"
    os.makedirs(src)
    out = str(tmp_path / "sink")
    ck = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(_SCHEMA).parquet(str(src))
        agg = tumbling_aggregate(stream, window="1 hour", watermark="2 hours")
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    d = "2024-01-01"
    _write_file(
        str(src / "b1.parquet"),
        [
            (i, f"{d} {h:02d}:15:00", 1, "click", 1.0, "{}")
            for i, h in enumerate(range(0, 11))
        ],
    )
    run_once()
    _write_file(
        str(src / "b2.parquet"),
        [
            (100, f"{d} 03:30:00", 1, "click", 1.0, "{}"),  # LATE
            (101, f"{d} 11:15:00", 1, "click", 1.0, "{}"),  # on time
        ],
    )
    run_once()
    _write_file(
        str(src / "b3.parquet"), [(200, f"{d} 12:15:00", 1, "click", 1.0, "{}")]
    )
    run_once()

    res = spark.read.schema(
        "window_start timestamp, event_type string, n long, total_value double"
    ).parquet(out)
    got = {r["window_start"].hour: r["n"] for r in res.collect()}
    # the late 03:30 row was dropped: hour 3 keeps its run-1 count
    assert got.get(3) == 1, got
    assert all(n == 1 for n in got.values()), got
    # final watermark is 10:15 (12:15 − 2h): hours 10+ never finalize
    assert set(got) <= set(range(0, 10)), got
    assert len(got) >= 8, got


def test_outer_join_emits_null_match_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: an unattributed purchase must
    emit with null click columns — but only after the click-side
    watermark passes its join window. Driven across real micro-batch
    boundaries via sequential availableNow passes over a shared
    checkpoint."""
    from relational_query_engine_sql_spark.streaming.events import (
        purchase_click_attribution,
    )

    src = tmp_path / "attr_src"
    os.makedirs(src)
    out = str(tmp_path / "attr_sink")
    ck = str(tmp_path / "attr_ckpt")

    def run_once():
        stream = spark.readStream.schema(_SCHEMA).parquet(str(src))
        joined = purchase_click_attribution(
            stream, max_gap="1 hour", watermark="1 hour", how="left_outer"
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    d = "2024-01-01"
    # batch 1: user 2 has click→purchase (match); user 1 purchase only.
    _write_file(
        str(src / "b1.parquet"),
        [
            (1, f"{d} 01:00:00", 1, "purchase", 10.0, "{}"),
            (2, f"{d} 00:30:00", 2, "click", 0.0, "{}"),
            (3, f"{d} 01:00:00", 2, "purchase", 20.0, "{}"),
        ],
    )
    run_once()
    # batches 2-3 advance the watermark past user 1's join window.
    # CRITICAL: this is a self-join of one source split by filters, so
    # the global watermark is the MIN across both branch watermark
    # operators — each branch only advances on events it actually
    # sees, so later batches must contain BOTH clicks and purchases
    # (a click-only batch leaves the purchase branch at its old
    # watermark and the null row never emits).
    _write_file(
        str(src / "b2.parquet"),
        [
            (4, f"{d} 05:00:00", 99, "click", 0.0, "{}"),
            (5, f"{d} 05:00:00", 98, "purchase", 1.0, "{}"),
        ],
    )
    run_once()
    _write_file(
        str(src / "b3.parquet"),
        [
            (6, f"{d} 07:00:00", 99, "click", 0.0, "{}"),
            (7, f"{d} 07:00:00", 98, "purchase", 1.0, "{}"),
        ],
    )
    run_once()

    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert (3, 2) in got  # attributed purchase
    assert (1, None) in got  # provable absence, emitted post-watermark
