"""Structured Streaming operators over the events table.

The reference has no streaming (SURVEY.md §2.9); its closest surfaces
are the append-only Transaction ledger and incremental daily Stocks
appends. This module is the §7 additive milestone: the same event
analytics the batch plans compute, expressed as streams with
watermarks, windowed aggregation, session windows, and a custom
stateful operator.

Every streaming transformation here also runs in batch mode (pass a
batch DataFrame) — the watermark is a no-op in batch — which is how the
tests pin stream results to the batch oracle.

Scale notes: watermark + append mode bounds state; session windows use
Spark's native state store; the stateful operator keys state by
user_id so it shards across executors.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _events_raw_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """The events parquet's ``ts`` physical type has varied across
    driver data generations — TIMESTAMP(NANOS) (readable only as long
    via ``nanosAsLong``) or TIMESTAMP(MICROS) (reads as
    TIMESTAMP_NTZ). File-source streaming needs an explicit schema, so
    sniff the footer with a batch read (metadata-only, no scan)."""
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file-source streaming —
    each file is one micro-batch; production swaps in Kafka without
    touching the transforms)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = _events_raw_schema(spark, sf_dir)
    df = (
        spark.readStream.schema(raw)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(raw["ts"].dataType, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))


def tumbling_aggregate(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data
    watermark. Works on streams and batch frames alike."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(27,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each event is
    joined to a static dimension row (user → customer attributes),
    then aggregated per (window, segment). Works on streams and batch
    frames alike.

    Stream-static joins are stateless on the stream side — the static
    dim is broadcast to every task and each micro-batch joins
    map-side, so no join state accumulates (unlike stream-stream
    joins, which buffer watermark-bounded state). This is THE shape
    for enriching a 100 TB/day event stream with reference data: the
    dim is re-broadcast per micro-batch, so slowly-changing dims pick
    up updates between batches. The aggregation state is bounded by
    the watermark exactly as in tumbling_aggregate.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    joined = src.join(
        F.broadcast(dim), src.user_id == dim.c_custkey, "inner"
    )
    return (
        joined.groupBy(F.window("ts", window).alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(27,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (overlapping windows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def sessionized_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows per user: a session closes after ``gap``
    of inactivity."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization via lag + running sum (the classic
    window-function rewrite; DuckDB-oracle-checkable). Session ids are
    1-based per user in time order. Output: (user_id, session_id,
    n_events, session_start, session_end)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    marked = events.withColumn(
        "_new",
        F.when(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
            > gap_us,
            1,
        )
        .otherwise(0),
    )
    wed = marked.withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0)) + 1,
    )
    return wed.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


EVENTS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def ingest_stream_to_table(events, table, checkpoint_dir: str):
    """Stream → keyed table ingestion via foreachBatch.

    Effectively-once without a transactional sink: the checkpoint gives
    at-least-once batch delivery, and the table's key-based
    ``insert_ignore`` (ON CONFLICT DO NOTHING semantics on event_id)
    makes redelivery a no-op — the classic idempotent-sink pattern.
    Returns the started query; callers await termination.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.insert_ignore(batch_df)

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ingest_stream_exactly_once(
    events, table, checkpoint_dir: str, app_id: str = "ingest"
):
    """Stream → txnlog table with TRANSACTIONAL idempotence (Delta's
    streaming-sink mechanic): each micro-batch's data files and its
    ``txn (app_id, batch_id)`` marker land in one atomic commit, so a
    replayed batch — checkpoint loss, crash between sink write and
    checkpoint commit, a second pipeline run over the same source — is
    skipped wholesale by :meth:`TxnLogTable.append_once`. Stronger
    than the insert_ignore pattern above: idempotence holds even for
    tables whose rows carry no natural unique key.
    """

    def write_batch(batch_df, batch_id: int) -> None:
        table.append_once(batch_df, app_id, batch_id)

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id.

    ``dropDuplicatesWithinWatermark`` keeps the seen-key state only for
    the watermark horizon — at 100 TB/day of events, plain
    ``dropDuplicates`` on a stream would accumulate unbounded state;
    the watermark bound is what makes streaming ingest-dedup viable.
    Batch frames fall back to plain ``dropDuplicates`` (same result on
    bounded data).
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def purchase_click_attribution(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Interval join: each purchase matched to the same user's clicks
    in the preceding ``max_gap``.

    On streams this is a stream-stream join — both sides carry
    watermarks and the join condition bounds event time on both sides,
    which is exactly what lets Spark expire join state (an unbounded
    stream-stream join would buffer forever). On batch frames the same
    condition plans as a hash join on user_id with the time range as a
    post-filter — never a nested-loop join.

    ``how='left_outer'`` keeps UNATTRIBUTED purchases (null click
    columns) — in stream mode Spark holds each purchase until the
    click-side watermark passes its join window and only then emits
    the null-match row, so "no click arrived" is a statement the
    engine can prove, not a race. That deferred emission is the
    semantic difference from the inner join, and why the outer form
    needs BOTH the watermark and the time-bound condition.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    return interval_attribution(
        purchases, clicks, max_gap=max_gap, watermark=watermark, how=how
    )


def interval_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """The interval-join core of :func:`purchase_click_attribution`
    over PRE-SPLIT frames — so the two sides can come from two
    independent streaming sources (e.g. two txnlog tables), not just
    one filtered event stream. Columns expected:
    purchases (user_id, purchase_id, purchase_ts, value),
    clicks (user_id, click_id, click_ts)."""
    if purchases.isStreaming:
        purchases = purchases.withWatermark("purchase_ts", watermark)
    if clicks.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
    cond = (
        (purchases.user_id == clicks.user_id)
        & (
            clicks.click_ts
            >= purchases.purchase_ts - F.expr(f"INTERVAL {max_gap}")
        )
        & (clicks.click_ts <= purchases.purchase_ts)
    )
    return purchases.join(clicks, cond, how).select(
        purchases.user_id,
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "value",
    )


# --------------------------------------------------------------------------
# Custom stateful operator: running per-user totals with
# applyInPandasWithState (the §7 "custom stateful operator" surface).
# --------------------------------------------------------------------------
_STATE_SCHEMA = "total double, n long"
_OUT_SCHEMA = "user_id long, n long, total double"


def _round_half_up(v: float, scale: str = "0.0001") -> float:
    """HALF_UP on the double's shortest decimal repr — exactly what
    Spark's F.round does (BigDecimal.valueOf(double)), where Python's
    round() is half-even: a value landing on a midpoint of the target
    scale would diverge from the batch oracle. Every Python-side
    stateful processor that rounds MUST use this, not round()."""
    import decimal

    return float(
        decimal.Decimal(repr(v)).quantize(
            decimal.Decimal(scale), rounding=decimal.ROUND_HALF_UP
        )
    )


def _update_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].sum())
        n += int(len(pdf))
    state.update((total, n))
    yield pd.DataFrame(
        [[user_id, n, _round_half_up(total)]],
        columns=["user_id", "n", "total"],
    )


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful streaming op: per-user running (count, sum)
    across micro-batches. State is keyed by user_id → shards across
    executors; ProcessingTimeTimeout left off for determinism."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor API to
# applyInPandasWithState — typed per-key state handles (Value/List/Map
# state, optional TTL, event-time timers) backed by the RocksDB state
# store. We express the same per-user running statistics through it,
# extended with Welford m2 so the operator also emits a running stddev
# (a streaming z-score/anomaly primitive the flat (total, n) tuple
# state of the older API can't carry incrementally).
# --------------------------------------------------------------------------
_TWS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("stddev", T.DoubleType()),
    ]
)


def _make_user_stats_processor():
    """Build the StatefulProcessor class lazily so importing this
    module never requires the streaming-only API."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserStatsProcessor(StatefulProcessor):
        """Per-user running (n, total, mean, m2) via Welford's online
        update. ValueState keeps one fixed-width row per user — state
        size is O(distinct users), independent of event volume, and
        shards across executors by the grouping key."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "user_stats", "n long, total double, m2 double, mean double"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                n, total, m2, mean = self._state.get()
            else:
                n, total, m2, mean = 0, 0.0, 0.0, 0.0
            for pdf in rows:
                for v in pdf["value"].astype(float):
                    n += 1
                    total += v
                    delta = v - mean
                    mean += delta / n
                    m2 += delta * (v - mean)
            self._state.update((n, total, m2, mean))
            std = (m2 / (n - 1)) ** 0.5 if n > 1 else 0.0

            r4 = _round_half_up  # HALF_UP, matching the batch F.round

            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n": [n],
                    "total": [r4(total)],
                    "mean": [r4(mean)],
                    "stddev": [r4(std)],
                }
            )

        def close(self) -> None:
            pass

    return UserStatsProcessor()


def stateful_user_stats_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas running per-user stats (count, sum,
    mean, sample stddev). Streaming-only API with two runtime
    requirements this module cannot supply by itself:
    ``spark.sql.streaming.stateStore.providerClass`` must be the
    RocksDBStateStoreProvider (the default HDFS provider fails at query
    start), and the Python ``protobuf`` package must be importable (the
    TWS state server runs a separate driver worker that speaks
    protobuf). tests/test_streaming.py sets the provider and pins the
    final state to :func:`user_stats_batch`, skipping only where
    protobuf is absent from the container."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_user_stats_processor(),
        outputStructType=_TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch oracle for the transformWithState operator: the final
    per-user state equals a plain aggregate (Welford's recurrence
    telescopes to the closed-form mean/variance)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
        F.round(F.avg("value"), 4).alias("mean"),
        F.round(F.coalesce(F.stddev_samp("value"), F.lit(0.0)), 4).alias(
            "stddev"
        ),
    )


def trending_topk(
    events: DataFrame,
    window: str = "1 hour",
    k: int = 3,
    watermark: str = "2 hours",
) -> DataFrame:
    """Top-k event types per tumbling window — the "trending now"
    board. Works on streams and batch frames alike: on a stream the
    windowed counts are the watermark-bounded stateful stage and the
    rank runs in the sink's foreachBatch (ranking needs the window
    CLOSED, which is exactly what the watermark guarantees); in batch
    the two stages compose directly. The rank window partitions by
    the time window, so state per partition is one window's type
    counts — bounded by event-type cardinality, not event volume.
    """
    from pyspark.sql import Window as W

    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    counts = (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    if events.isStreaming:
        return counts  # rank in the sink once windows close
    rank_w = W.partitionBy("window_start").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= k)
    )


def maintain_hourly_mv(events, table, checkpoint_dir: str):
    """Streaming materialized-view maintenance via foreachBatch: each
    micro-batch reduces to per-(hour, event_type) partial aggregates,
    which merge ADDITIVELY into the keyed table (counts and decimal
    sums are commutative monoids, so partials from any batch split
    combine to the exact batch answer). This is the streaming twin of
    the batch ``mv_incremental_rollup`` path: the MV is never
    recomputed from history — each batch touches only the hours it
    contains.

    Delivery note: the file-source checkpoint replays unprocessed
    batches at-least-once; an additive merge is NOT idempotent under
    redelivery, so production pairs this with a transactional sink or
    a processed-batch-id ledger. The availableNow harness here
    delivers each batch exactly once on a fresh checkpoint, which the
    differential oracle verifies end-to-end.
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("value_sum"),
        )
        merged = (
            table.read()
            .unionByName(partial)
            .groupBy("h", "event_type")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("value_sum")
                .cast("decimal(27,6)")
                .alias("value_sum"),
            )
        )
        table.init(merged)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def apply_cdc_stream(events, table, checkpoint_dir: str):
    """CDC apply: a stream of keyed change events folded into an SCD1
    latest-state table via foreachBatch MERGE.

    Each micro-batch reduces to one winner per key (``max_by`` over
    the (ts, event_id) change order — map-side combinable), then a
    single keyed MERGE applies it: insert when the key is new, update
    only when the incoming change is NEWER than the stored one. The
    ordered update condition is what makes the apply idempotent AND
    out-of-order tolerant — replayed batches (at-least-once delivery)
    and late-arriving files both converge to the same final state, so
    no cross-batch ordering guarantee is needed from the source. This
    is the standard Spark shape for maintaining a mirror of a CDC feed
    (Debezium/DMS-style) without a transactional sink.

    Returns the started query; callers await termination.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        win = F.max_by(
            F.struct("ts", "event_id", "value"),
            F.struct("ts", "event_id"),
        )
        latest = (
            batch_df.groupBy("user_id")
            .agg(win.alias("_w"))
            .select("user_id", "_w.ts", "_w.event_id", "_w.value")
        )
        newer = (F.col("_s_ts") > F.col("ts")) | (
            (F.col("_s_ts") == F.col("ts"))
            & (F.col("_s_event_id") > F.col("event_id"))
        )
        table.merge(
            latest,
            update_assign={
                "ts": F.col("_s_ts"),
                "event_id": F.col("_s_event_id"),
                "value": F.col("_s_value"),
            },
            update_cond=newer,
        )

    return (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
