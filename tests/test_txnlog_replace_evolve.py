"""replace_where (Delta's replaceWhere partition-region reload) and
schema-evolving append (Delta's mergeSchema write option) on the
txnlog format — operators/txnlog.py. Properties that matter:

- replace_where is ONE atomic commit: remove of every matching file,
  re-add of its non-matching remainder, new data; validations
  (predicate on every incoming row, key uniqueness vs surviving rows)
  fail BEFORE anything is staged.
- merge_schema lands the widening metadata action and the data in the
  SAME commit; retired physical names are never reused, so a
  mergeSchema write after drop_column cannot resurrect dropped bytes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from relational_query_engine_sql_spark.operators.txnlog import TxnLogTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _rows(spark, lo, hi, g="a", v=1.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.lit(g).alias("grp"),
        F.lit(float(v)).alias("val"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnLogTable(spark, str(tmp_path / "t"), SCHEMA, ["k"])
    t.init(_rows(spark, 0, 10, "a").unionByName(_rows(spark, 10, 20, "b")))
    return t


# -- replace_where ----------------------------------------------------------


def test_replace_where_replaces_exactly_the_region(spark, table):
    table.replace_where(
        _rows(spark, 100, 105, "b", 9.0), F.col("grp") == "b"
    )
    d = table.read()
    assert d.count() == 15
    assert d.filter(F.col("grp") == "a").count() == 10  # untouched
    assert sorted(
        r["k"] for r in d.filter(F.col("grp") == "b").collect()
    ) == [100, 101, 102, 103, 104]
    # one atomic commit; time travel still sees the old region
    assert [h["op"] for h in table.history()][-1] == "replace_where"
    v_prev = table.current_version() - 1
    assert table.read(v_prev).filter(F.col("grp") == "b").count() == 10


def test_replace_where_validates_predicate_on_incoming(spark, table):
    before = table.current_version()
    with pytest.raises(ValueError, match="violate the predicate"):
        table.replace_where(
            _rows(spark, 200, 201, "a"), F.col("grp") == "b"
        )
    assert table.current_version() == before  # nothing landed


def test_replace_where_rejects_key_collision_outside_region(spark, table):
    # k=5 lives in grp 'a' (outside the replaced region): landing it
    # again inside 'b' would be a silent duplicate key
    with pytest.raises(ValueError, match="collide"):
        table.replace_where(_rows(spark, 5, 6, "b"), F.col("grp") == "b")
    assert table.read().count() == 20


def test_replace_where_empty_match_is_an_insert(spark, table):
    table.replace_where(
        _rows(spark, 300, 303, "c", 3.0), F.col("grp") == "c"
    )
    d = table.read()
    assert d.count() == 23
    assert d.filter(F.col("grp") == "c").count() == 3


def test_replace_where_prunes_untouched_files(spark, tmp_path):
    """Partitioned table: replacing one partition's region must leave
    the other partition's FILES live by identity (the idempotent
    partition-reload pattern at 100 TB)."""
    t = TxnLogTable(
        spark, str(tmp_path / "p"), SCHEMA, ["k"], partition_by=["grp"]
    )
    t.init(_rows(spark, 0, 10, "a").unionByName(_rows(spark, 10, 20, "b")))
    before = set(t._split_live()[0])
    a_files = {p for p in before if "p_grp=a" in p}
    t.replace_where(_rows(spark, 100, 103, "b", 2.0), F.col("grp") == "b")
    after = set(t._split_live()[0])
    assert a_files <= after, "untouched partition's files were rewritten"
    assert not any("p_grp=b" in p for p in before & after)


def test_replace_where_honors_deletion_vectors(spark, table):
    # tombstone k=12 (grp b) merge-on-read, then replace region 'b':
    # the tombstoned row must not resurrect in the rewrite, and a
    # replaced key's tombstone must shrink so the new row is visible
    table.delete_keys_deferred(_rows(spark, 12, 13, "b").select("k"))
    assert table.read().count() == 19
    table.replace_where(
        _rows(spark, 12, 14, "b", 5.0), F.col("grp") == "b"
    )
    d = table.read()
    assert d.filter(F.col("grp") == "b").count() == 2
    got = d.filter(F.col("k") == 12).first()
    assert got is not None and got["val"] == 5.0


# -- append(merge_schema=True) ----------------------------------------------


def test_merge_schema_append_single_commit(spark, table):
    v0 = table.current_version()
    table.append(
        _rows(spark, 20, 25, "c").withColumn(
            "extra", F.lit(7).cast("long")
        ),
        merge_schema=True,
    )
    assert table.current_version() == v0 + 1  # metadata + data in ONE
    assert table.schema.fieldNames() == ["k", "grp", "val", "extra"]
    d = table.read()
    assert d.filter(F.col("extra").isNull()).count() == 20  # old rows
    assert d.filter(F.col("extra") == 7).count() == 5
    # time travel to before the evolution shows the old schema
    assert table.read(v0).columns == ["k", "grp", "val"]


def test_merge_schema_noop_when_frame_fits(spark, table):
    table.append(_rows(spark, 20, 22, "a"), merge_schema=True)
    assert [h["op"] for h in table.history()][-1] == "append"
    assert table.schema.fieldNames() == ["k", "grp", "val"]


def test_merge_schema_after_drop_gets_fresh_physical_name(spark, table):
    table.append(
        _rows(spark, 20, 25, "c").withColumn(
            "extra", F.lit(7).cast("long")
        ),
        merge_schema=True,
    )
    table.drop_column("extra")
    table.append(
        _rows(spark, 30, 33, "d").withColumn(
            "extra", F.lit(9).cast("long")
        ),
        merge_schema=True,
    )
    assert table._cmap_at(None)["map"]["extra"].startswith("extra__p")
    d = table.read()
    # the dropped era's 7s must NOT resurrect
    assert d.filter(F.col("extra") == 7).count() == 0
    assert d.filter(F.col("k") == 22).first()["extra"] is None
    assert d.filter(F.col("extra") == 9).count() == 3


def test_merge_schema_fresh_instance_reads_evolution(spark, table, tmp_path):
    table.append(
        _rows(spark, 20, 22, "c").withColumn("w", F.lit(1.5)),
        merge_schema=True,
    )
    fresh = TxnLogTable(spark, table.path, SCHEMA, ["k"])
    assert fresh.schema.fieldNames() == ["k", "grp", "val", "w"]
    assert fresh.read().filter(F.col("w") == 1.5).count() == 2


def test_merge_schema_pending_state_clears_on_failure(spark, table):
    class Boom(Exception):
        pass

    orig = table._write_files

    def boom(df, dv=False):
        raise Boom()

    table._write_files = boom
    try:
        with pytest.raises(Boom):
            table.append(
                _rows(spark, 40, 41, "z").withColumn("q", F.lit(1)),
                merge_schema=True,
            )
    finally:
        table._write_files = orig
    assert table._pending_schema is None
    assert table._pending_cmap is None
    assert table.schema.fieldNames() == ["k", "grp", "val"]
    table.append(_rows(spark, 40, 41, "z"))  # table still writable
    assert table.read().count() == 21


def test_predicate_mutations_skip_nonmatching_partition_files(
    spark, tmp_path
):
    """_files_matching must identify files by full relpath: one
    partitioned write job emits IDENTICAL basenames into every
    partition directory, and basename matching made update()/delete()
    rewrite all of them (the 100 TB skip property silently lost)."""
    t = TxnLogTable(
        spark, str(tmp_path / "fm"), SCHEMA, ["k"], partition_by=["grp"]
    )
    t.init(_rows(spark, 0, 10, "a").unionByName(_rows(spark, 10, 20, "b")))
    before = set(t._split_live()[0])
    a_files = {p for p in before if "p_grp=a" in p}
    assert a_files, "expected partition-a files"
    matched = set(t._files_matching(F.col("grp") == "b"))
    assert not (matched & a_files), "non-matching partition flagged"
    t.delete(F.col("grp") == "b")
    after = set(t._split_live()[0])
    assert a_files <= after, "delete rewrote the untouched partition"
    assert t.read().count() == 10
