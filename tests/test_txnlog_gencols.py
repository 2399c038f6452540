"""GENERATED columns on the txnlog format (operators/txnlog.py,
Delta's GENERATED ALWAYS AS). The invariant: a generated column's
value ALWAYS equals its expression over the row — computed when the
writer omits it, validated (rejected) when the writer supplies a
contradicting value, regenerated when an UPDATE/MERGE touches its
sources. The flagship composition is a generated DATE partition
column: raw event writes carry no date, yet date probes prune at
directory granularity with zero writer discipline."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from relational_query_engine_sql_spark.operators.txnlog import (
    ConstraintViolation,
    TxnLogTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("event_date", T.DateType()),
    ]
)


def _events(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1700000000000000) + F.col("id") * 3600_000_000
        ).alias("ts"),
        (F.col("id") * 0.5).alias("value"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnLogTable(
        spark,
        str(tmp_path / "ev"),
        SCHEMA,
        ["event_id"],
        partition_by=["event_date"],
        generated={"event_date": "CAST(ts AS DATE)"},
    )
    t.init(_events(spark, 0, 200))  # no event_date in the frame
    return t


def test_generated_on_every_write_path(spark, table):
    assert table.read().filter(F.col("event_date").isNull()).count() == 0
    r = table.read().filter(F.col("event_id") == 30).first()
    assert r["event_date"] == r["ts"].date()
    table.append(_events(spark, 200, 250))
    table.upsert(
        spark.createDataFrame(
            [(30, dt.datetime(2026, 2, 2, 2), 9.0)],
            schema="event_id long, ts timestamp, value double",
        )
    )
    got = table.read().filter(F.col("event_id") == 30).first()
    assert str(got["event_date"]) == "2026-02-02"
    assert table.read().filter(F.col("event_date").isNull()).count() == 0


def test_generated_partition_prunes(spark, table):
    d = table.read().agg(F.min("event_date")).first()[0]
    files = table._split_live()[0]
    cands = table.scan_candidates("event_date", d, d)
    assert 0 < len(cands) < len(files)


def test_explicit_values_validated(spark, table):
    bad = spark.createDataFrame(
        [(900, dt.datetime(2024, 1, 1, 12), 1.0, dt.date(1999, 9, 9))],
        SCHEMA,
    )
    with pytest.raises(ConstraintViolation, match="GENERATED"):
        table.append(bad)
    good = spark.createDataFrame(
        [(900, dt.datetime(2024, 1, 1, 12), 1.0, dt.date(2024, 1, 1))],
        SCHEMA,
    )
    table.append(good)  # correct explicit value is fine
    assert table.read().filter(F.col("event_id") == 900).count() == 1


def test_update_regenerates_from_new_source(spark, table):
    table.update(
        F.col("event_id") == 7,
        {"ts": F.lit(dt.datetime(2025, 6, 6, 6))},
    )
    r = table.read().filter(F.col("event_id") == 7).first()
    assert str(r["event_date"]) == "2025-06-06"


def test_log_resolves_declaration_for_other_instances(spark, table):
    fresh = TxnLogTable(
        spark, table.path, SCHEMA, ["event_id"],
        partition_by=["event_date"],
    )
    fresh.append(
        spark.createDataFrame(
            [(5000, dt.datetime(2024, 1, 1, 12), 1.0)],
            schema="event_id long, ts timestamp, value double",
        )
    )
    r = fresh.read().filter(F.col("event_id") == 5000).first()
    assert str(r["event_date"]) == "2024-01-01"
    # feature use gates pre-feature writers
    assert fresh._cmap_at(None)["protocol"]["min_writer"] == 2


def test_generated_and_source_columns_unmappable(spark, table):
    for op in (
        lambda: table.rename_column("event_date", "d2"),
        lambda: table.drop_column("event_date"),
        lambda: table.rename_column("ts", "ts2"),
        lambda: table.drop_column("ts"),
    ):
        with pytest.raises(ValueError):
            op()
    # an uninvolved column still maps fine
    table.rename_column("value", "amount")
    assert "amount" in table.read().columns


def test_add_generated_column_requires_empty_table(spark, table, tmp_path):
    with pytest.raises(ValueError, match="empty"):
        table.add_generated_column("vb", "int", "CAST(value AS INT)")
    t = TxnLogTable(
        spark,
        str(tmp_path / "e2"),
        T.StructType(SCHEMA.fields[:3]),
        ["event_id"],
    )
    t.init(_events(spark, 0, 0))
    t.add_generated_column("event_date", "date", "CAST(ts AS DATE)")
    t.append(_events(spark, 0, 10))
    assert "event_date" in t.schema.fieldNames()
    assert t.read().filter(F.col("event_date").isNull()).count() == 0


def test_restore_preserves_generation(spark, table):
    """RESTORE must carry the generated-column declarations of the
    restored era — dropping the field would silently stop generation
    for every later writer (fresh instances resolve gencols from the
    LOG, not the constructor)."""
    v_pre = table.current_version()
    table.append(_events(spark, 200, 220))
    # a rename after the snapshot forces restore to WRITE a metadata
    # action (schema/cmap differ) — the case where a rebuilt state
    # that dropped the gen field would silently kill generation
    table.rename_column("value", "amount")
    table.restore(v_pre)
    fresh = TxnLogTable(
        spark, table.path, SCHEMA, ["event_id"],
        partition_by=["event_date"],
    )
    assert fresh._gencols_at(None) == {"event_date": "CAST(ts AS DATE)"}
    fresh.append(_events(spark, 300, 310))
    got = fresh.read().filter(F.col("event_id") == 305).first()
    assert got["event_date"] == got["ts"].date()


def test_restore_to_pre_gen_era_resets_live_instance(spark, tmp_path):
    """restore() to a version that PREDATES add_generated_column
    correctly drops the declaration from the log — and must also reset
    the LIVE instance's in-memory declaration (_gencols_at's pre-commit
    fallback), or the same instance's next write references a generated
    column no longer in the restored schema and fails, while a fresh
    instance works fine."""
    t = TxnLogTable(
        spark,
        str(tmp_path / "pg"),
        T.StructType(SCHEMA.fields[:3]),
        ["event_id"],
    )
    t.init(_events(spark, 0, 0))  # v0: empty, NO generated column
    t.add_generated_column("event_date", "date", "CAST(ts AS DATE)")
    t.append(_events(spark, 0, 10))
    assert t.read().filter(F.col("event_date").isNull()).count() == 0
    t.restore(0)  # back to the pre-declaration era
    assert t._gencols_at(None) == {}
    assert "event_date" not in t.schema.fieldNames()
    # the SAME instance must keep writing without referencing the
    # dropped generated column
    t.append(_events(spark, 100, 110))
    assert t.read().count() == 10
    assert "event_date" not in t.read().columns


def test_stream_sink_refuses_generated_columns(spark, table, tmp_path):
    from relational_query_engine_sql_spark.sources.txnlog_stream import (
        TxnLogStreamDataSource,
    )

    spark.dataSource.register(TxnLogStreamDataSource)
    src = _events(spark, 500, 520).withColumn(
        "event_date", F.col("ts").cast("date")
    )
    src.write.parquet(str(tmp_path / "src" / "c0"))
    q = (
        spark.readStream.schema(src.schema)
        .parquet(str(tmp_path / "src" / "c*"))
        .writeStream.format("txnlog")
        .option("path", table.path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="GENERATED"):
        q.awaitTermination()
    assert table.read().count() == 200  # nothing landed


def test_merge_regenerates_generated_columns(spark, table):
    """MERGE sources routinely carry stale values for columns they
    didn't compute: unassigned generated columns are regenerated, so
    a source row whose date contradicts its (new) timestamp merges
    with the CORRECT generated value rather than failing or landing
    stale."""
    src = spark.createDataFrame(
        [
            # existing key with a STALE date: only `value` is assigned,
            # so the target keeps its ts and the regenerated date must
            # equal THAT ts — the source's contradicting date never lands
            (7, dt.datetime(2026, 3, 3, 3), 111.0, dt.date(1999, 1, 1)),
            # brand-new key, null date from an upstream that skipped it
            (9000, dt.datetime(2026, 4, 4, 4), 2.0, None),
        ],
        SCHEMA,
    )
    table.merge(src, update_assign={"value": F.col("_s_value")})
    rows = {
        r["event_id"]: r
        for r in table.read()
        .filter(F.col("event_id").isin(7, 9000))
        .collect()
    }
    assert rows[7]["value"] == 111.0  # the assignment applied
    assert rows[7]["event_date"] == rows[7]["ts"].date()  # regenerated
    assert str(rows[9000]["event_date"]) == "2026-04-04"  # computed
