"""Partition spec evolution (Iceberg's spec-evolution mechanic) on
the txnlog format: metadata-only spec changes, mixed-era layouts that
read as one table, per-era pruning, and cross-era mutation soundness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from relational_query_engine_sql_spark.operators.txnlog import TxnLogTable
from relational_query_engine_sql_spark.sources import load_table


def _ev(spark, sf):
    return load_table(spark, sf, "events").select(
        "event_id", "ts", "value", "event_type"
    )


@pytest.fixture()
def evolved(spark, sf_small, tmp_path):
    ev = _ev(spark, sf_small)
    t = TxnLogTable(
        spark, str(tmp_path / "e"), ev.schema, ["event_id"]
    )
    t.init(ev.filter(F.col("event_id") % 2 == 0).repartition(2))
    v_evolve = t.set_partitioning(["event_type"])
    t.append(ev.filter(F.col("event_id") % 2 == 1).repartition(1))
    return t, ev, v_evolve


def test_evolution_is_metadata_only(spark, sf_small, tmp_path):
    ev = _ev(spark, sf_small)
    t = TxnLogTable(
        spark, str(tmp_path / "m"), ev.schema, ["event_id"]
    )
    t.init(ev.repartition(2))
    before = set(t._live())
    t.set_partitioning(["event_type"])
    assert set(t._live()) == before  # zero files touched
    assert t.partition_by == ["event_type"]


def test_mixed_eras_read_as_one_table(evolved):
    t, ev, _ = evolved
    assert t.read().count() == ev.count()
    data, _dvs = t._split_live()
    old = [p for p, m in data.items() if not m.get("part")]
    new = [p for p, m in data.items() if m.get("part")]
    assert old and new  # both eras live
    # new-era files landed under hive-style dirs of the new spec
    assert all("p_event_type=" in p for p in new)
    assert not any("p_event_type=" in p for p in old)


def test_probe_prunes_new_era_exactly_keeps_old_era(evolved):
    t, ev, _ = evolved
    data, _dvs = t._split_live()
    old = {p for p, m in data.items() if not m.get("part")}
    new = {p for p, m in data.items() if m.get("part")}
    cands = set(t.scan_candidates("event_type", "click", "click"))
    # old-era files can't partition-prune on the new column (their
    # stats may still prune; event_type spans all values so they stay)
    assert old <= cands
    # new-era: exactly the probed partition's files survive
    surviving_new = cands & new
    assert surviving_new
    assert all("p_event_type=click" in p for p in surviving_new)
    assert len(cands) < len(data)


def test_cross_era_upsert_leaves_single_copies(evolved):
    t, ev, _ = evolved
    t.upsert(
        ev.filter(F.col("event_id") % 10 == 0).withColumn(
            "value", F.col("value") + 1.0
        )
    )
    dup = (
        t.read()
        .groupBy("event_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    assert t.read().count() == ev.count()


def test_fresh_instance_and_time_travel_resolve_spec_per_era(evolved):
    t, ev, v_evolve = evolved
    t2 = TxnLogTable(
        t.spark, t.path, ev.schema, ["event_id"]
    )
    assert t2.partition_by == ["event_type"]
    # pre-evolution era still reads (spec is write-layout metadata;
    # reads are flat multi-file scans either way)
    assert t.read(v_evolve - 1).count() > 0


def test_revert_to_unpartitioned_and_validation(evolved, tmp_path):
    t, ev, _ = evolved
    t.set_partitioning([])
    assert t.partition_by == []
    t.append(ev.limit(5).withColumn("event_id", F.col("event_id") + 10**9))
    assert t.read().count() == ev.count() + 5
    with pytest.raises(ValueError, match="not in schema"):
        t.set_partitioning(["nope"])


def test_generated_partition_column_spec_evolution(
    spark, sf_small, tmp_path
):
    """Evolving TO a generated date column composes with the
    key-stability rule: the generated column derives from ts (not a
    key), so mutation pruning must NOT use it — pinned by the
    moving-row upsert staying single-copy."""
    ev = _ev(spark, sf_small).withColumn(
        "event_date", F.col("ts").cast("date")
    )
    t = TxnLogTable(
        spark,
        str(tmp_path / "g"),
        ev.schema,
        ["event_id"],
        generated={"event_date": "CAST(ts AS DATE)"},
    )
    t.init(ev.repartition(2))
    t.set_partitioning(["event_date"])
    assert "event_date" not in t._stable_partition_cols()
    moved = (
        ev.orderBy("event_id")
        .limit(1)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
        .drop("event_date")
    )
    t.upsert(moved)
    dup = (
        t.read()
        .groupBy("event_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_reopen_with_ctor_schema_after_spec_on_added_column(
    spark, sf_small, tmp_path
):
    """A spec set on a column added AFTER creation must not make the
    table unopenable through the original constructor schema: init
    validates only the constructor-declared partitioning against the
    constructor-declared schema (the evolved spec was validated
    against the evolved schema at set_partitioning time)."""
    ev = _ev(spark, sf_small)
    t = TxnLogTable(spark, str(tmp_path / "a"), ev.schema, ["event_id"])
    t.init(ev.repartition(2))
    t.add_columns({"era": "string"})
    t.set_partitioning(["era"])
    # reopen with the ORIGINAL schema (a second writer/session that
    # predates the evolution) — this used to raise
    # "partition_by not in schema"
    t2 = TxnLogTable(spark, t.path, ev.schema, ["event_id"])
    assert t2.partition_by == ["era"]
    assert t2.read().count() == ev.count()
    # and the resolved spec drives new writes
    t2.append(
        ev.select(
            (F.col("event_id") + 5_000_000).alias("event_id"),
            "ts",
            "value",
            "event_type",
        ).withColumn("era", F.lit("new")).repartition(1)
    )
    assert t2.read().count() == 2 * ev.count()
