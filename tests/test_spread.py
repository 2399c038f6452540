"""sources.spread(): widen under-split scans, pass wide frames through
untouched (SCALE.md 'under-partitioned inputs')."""

from __future__ import annotations

from relational_query_engine_sql_spark.sources import load_table, spread


def test_spread_widens_single_split_scan(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    n_before = docs.rdd.getNumPartitions()
    assert n_before < spark.sparkContext.defaultParallelism
    widened = spread(docs, spark)
    assert (
        widened.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert widened.count() == docs.count()


def test_spread_is_noop_on_wide_frames(spark, sf_oracle):
    wide = load_table(spark, sf_oracle, "documents").repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    # already wider than defaultParallelism → returned as-is, no
    # forced down-shuffle
    assert spread(wide, spark) is wide
