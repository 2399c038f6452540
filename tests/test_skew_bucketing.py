"""Scale mechanics: salted aggregation equivalence and shuffle-free
bucketed joins (operators/skew.py, sources/bucketing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from relational_query_engine_sql_spark.operators.skew import salted_count_sum
from relational_query_engine_sql_spark.sources import load_table
from relational_query_engine_sql_spark.sources.bucketing import (
    assert_no_shuffle_join,
    bucketed_join,
    executed_plan,
    write_bucketed,
)


def test_salted_agg_equals_direct(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    salted = {
        r["l_returnflag"]: (r["n"], r["total"])
        for r in salted_count_sum(
            li, ["l_returnflag"], salt_col="l_orderkey",
            value_col="l_quantity",
        ).collect()
    }
    direct = {
        r["l_returnflag"]: (r["n"], r["total"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("total"),
        )
        .collect()
    }
    assert salted == direct


def test_salted_plan_has_two_aggregation_exchanges(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    plan = executed_plan(
        salted_count_sum(li, ["l_returnflag"], salt_col="l_orderkey")
    )
    # stage 1 shuffles on (key, salt), stage 2 on key
    assert plan.count("Exchange hashpartitioning") == 2


def test_bucketed_join_is_shuffle_free(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    li = load_table(spark, sf_oracle, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        buckets=8,
    )
    joined = bucketed_join(spark, "orders_b", "lineitem_b", ["o_orderkey"])
    assert_no_shuffle_join(joined)
    # joining the raw (un-bucketed) frames as a sort-merge join DOES
    # shuffle — the bucket layout is what removes the exchange (the
    # merge hint rules out broadcast, which small test data would pick)
    raw = orders.hint("merge").join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), ["o_orderkey"]
    )
    with pytest.raises(AssertionError):
        assert_no_shuffle_join(raw)
    # and the bucketed join returns the same rows
    assert joined.count() == raw.count()


def test_aqe_splits_skewed_join_partitions(spark):
    """SCALE.md claims AQE handles hot-key joins by splitting skewed
    partitions at runtime; pin that the final adaptive plan actually
    carries SortMergeJoin(skew=true) for a 95%-one-key join. Runtime
    SQL confs go on an isolated newSession so the shared fixture's
    planner behavior is untouched."""
    import re

    from pyspark.sql import functions as F

    ns = spark.newSession()
    ns.conf.set("spark.sql.adaptive.enabled", "true")
    ns.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ns.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    ns.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ns.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ns.conf.set("spark.sql.shuffle.partitions", "8")

    left = ns.range(200_000).select(
        F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    right = ns.range(10_000).select(
        F.col("id").alias("k"), F.lit("dim").alias("d")
    )
    j = left.join(right, "k")
    assert len(j.collect()) == 190_500
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert re.search(r"SortMergeJoin\(skew=true\)", plan), plan[:500]


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """A mass-identical corpus (10k copies of one boilerplate doc plus
    a handful of genuine near-dup pairs) puts every copy in ONE band
    bucket — uncapped that bucket alone is 10k²/2 ≈ 5·10⁷ candidate
    pairs. With max_bucket_size the capped run must (a) finish fast,
    (b) still find the genuine near-dups outside the hot bucket, and
    (c) surface the spilled bucket in the audit frame with its true
    member count."""
    import time

    from relational_query_engine_sql_spark.datapipe.dedup import (
        lsh_bucket_audit,
        minhash_lsh_dedup,
        minhash_signature,
        shingles,
    )

    boiler = "all rights reserved subscribe to our newsletter for updates " * 4
    rows = [(i, boiler) for i in range(10_000)]
    # two genuine near-dup pairs with distinct shingle sets
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "pack my box with five dozen liquor jugs before the long winter night"
    rows += [
        (20_000, a),
        (20_001, a + " again"),
        (30_000, b),
        (30_001, b + " indeed"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    t0 = time.perf_counter()
    pairs = minhash_lsh_dedup(docs, threshold=0.4, max_bucket_size=100)
    found = {(r["d1"], r["d2"]) for r in pairs.collect()}
    took = time.perf_counter() - t0
    assert (20_000, 20_001) in found
    assert (30_000, 30_001) in found
    # no pair from the capped boilerplate bucket
    assert not any(d1 < 10_000 for d1, _ in found)
    assert took < 60, f"capped run took {took:.1f}s — cap not effective"

    sig = minhash_signature(shingles(docs))
    audit = lsh_bucket_audit(sig, max_bucket_size=100).collect()
    assert audit, "hot bucket missing from audit"
    assert max(r["n_ids"] for r in audit) == 10_000
