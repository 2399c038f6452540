"""Physical-plan pins: the scale properties SCALE.md claims must be
visible in the executed plans, not just intended. Regressions that
silently flip a broadcast into a shuffle or lose filter pushdown fail
here even though results stay correct."""

from __future__ import annotations

from relational_query_engine_sql_spark import plans


def _plan(spark, sf, name: str) -> str:
    return (
        plans.get(name)
        .fn(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_dim_joins_broadcast_not_shuffle(spark, sf_oracle):
    """Dimension lookups must broadcast-hash; a sort-merge here would
    shuffle the fact side on every query."""
    for name in ["j1_join_dims", "tpch_q10_returned_items"]:
        plan = _plan(spark, sf_oracle, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_no_nested_loop_joins_anywhere(spark, sf_oracle):
    """The J2 OR-join rewrite and J4 triangular join exist precisely to
    avoid BroadcastNestedLoopJoin; pin that they (and the as-of join)
    never regress into one. (Cartesian product is legitimate only in
    the ANN query-fanout, which is not in this list.)"""
    for name in [
        "j2_or_join_union",
        "j4_triangular_selfjoin",
        "j7_asof_latest",
        "a5_correlation_matrix",
    ]:
        plan = _plan(spark, sf_oracle, name)
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q6_filters_reach_scan(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "tpch_q6_forecast_revenue")
    # toString truncates the filter list, so assert on the visible
    # prefix: non-null guards for all three filtered columns plus the
    # first range predicate
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "IsNotNull(l_discount)" in plan
    assert "IsNotNull(l_quantity)" in plan
    assert "GreaterThanOrEqual(l_shipda" in plan


def test_scan_prunes_columns(spark, sf_oracle):
    """A 2-column projection must not read the whole lineitem schema."""
    plan = _plan(spark, sf_oracle, "s1_scan_project")
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_comment" not in read
    # a handful of named columns, not the full struct
    assert read.count(":") <= 6, read


def test_semi_and_anti_joins_stay_semi(spark, sf_oracle):
    assert "LeftSemi" in _plan(spark, sf_oracle, "j5_semijoin_exists")
    assert "LeftAnti" in _plan(spark, sf_oracle, "j8_antijoin")


def test_ledger_id_window_is_partitioned(spark):
    """SERIAL-like ledger id assignment must never funnel the trade
    table through one reducer: every Window over trade rows must carry
    a portfolioid partition spec. (The cumulative-offset window runs
    over the one-row-per-portfolio counts frame — broadcast-sized — and
    is the only unpartitioned window allowed, identifiable by its
    aggregated input.)"""
    import re

    from pyspark.sql import functions as F

    from relational_query_engine_sql_spark.operators.trading import (
        ledger_entries,
    )

    trades = spark.range(10_000).select(
        (F.col("id") % 50).cast("int").alias("portfolioid"),
        F.concat(F.lit("S"), (F.col("id") % 7).cast("string")).alias("symbol"),
        F.when(F.col("id") % 3 == 0, "SELL").otherwise("BUY").alias("side"),
        (F.col("id") % 9 + 1).cast("int").alias("shares"),
        (F.col("id") % 97 + 1).cast("double").alias("price"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("ts"),
    )
    out = ledger_entries(trades)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every row_number window must be partitioned by portfolioid
    for m in re.finditer(r"Window \[row_number\(\)[^\]]*\]", plan):
        assert "portfolioid" in m.group(0), m.group(0)
    # ids are dense 1..N and unique
    n = trades.count()
    ids = out.select("transactionid").distinct().count()
    agg = out.agg(
        F.min("transactionid").alias("lo"), F.max("transactionid").alias("hi")
    ).collect()[0]
    assert ids == n and agg["lo"] == 1 and agg["hi"] == n


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_oracle):
    """Runtime filtering: a selective dimension filter should inject a
    bloom-filter semi-filter into the fact scan side (Catalyst
    InjectRuntimeFilter). Locally the probe side is far below the
    default 10GB applicationSideScanSizeThreshold, so the test drops
    that threshold to 0 on an isolated session — at cluster scale the
    default config triggers this on its own; what's pinned here is
    that our join shapes are ELIGIBLE (equi-join + selective creation
    side), not the threshold."""
    from pyspark.sql import functions as F

    ns = spark.newSession()
    ns.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ns.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = ns.read.parquet(f"{sf_oracle}/lineitem.parquet")
    o = ns.read.parquet(f"{sf_oracle}/orders.parquet").filter(
        F.col("o_totalprice") > 450000
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan


def test_salted_join_is_shuffle_hash_on_salted_key(spark, sf_oracle):
    """ext_salted_join exists to demonstrate the distributed shuffle
    plan; if the tiny dim auto-broadcasts the demonstration is moot.
    Pin the ShuffledHashJoin and the dim-side replication explode."""
    plan = _plan(spark, sf_oracle, "ext_salted_join")
    assert "ShuffledHashJoin" in plan
    assert "Generate explode" in plan  # dim replicated across salts


def test_bloom_prefilter_has_no_shuffle_join(spark, sf_oracle):
    """The whole point: the probe side is filtered map-side (broadcast
    bitmask) and the exact semi-join broadcasts the small build side —
    no shuffle join anywhere."""
    plan = _plan(spark, sf_oracle, "join_bloom_prefilter")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan  # exact semi-join
    # build-side selectivity predicate reaches the orders scan
    assert "GreaterThan(o_totalprice" in plan


def test_target_encode_has_no_window(spark, sf_oracle):
    """Leave-one-out encoding must be groupBy+broadcast-join, never a
    per-category window (5 categories = 5 reducers)."""
    plan = _plan(spark, sf_oracle, "feat_target_encode")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_cusum_windows_are_day_segmented(spark, sf_oracle):
    """The prefix sum must never run as one global window per series:
    every Window node's partition spec includes the day column."""
    import re

    plan = _plan(spark, sf_oracle, "ts_cusum_changepoints")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "no window specs found in plan"
    in_day = [s for s in specs if "day" in s]
    # both window passes (within-day cusum, day-offset chain) key on
    # day or operate over day totals; none partitions by event_type
    # alone over raw rows
    raw_global = [
        s
        for s in specs
        if "event_type" in s and "day" not in s
    ]
    assert in_day and not raw_global, specs


def test_lm_score_reference_model_broadcasts(spark, sf_oracle):
    """The vocab join must be broadcast (map-side) — a shuffle join on
    'word' would redistribute the whole token stream."""
    plan = _plan(spark, sf_oracle, "text_lm_score")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_exchange_reuse_collapses_duplicate_aggregation(spark, sf_oracle):
    """ext_reused_exchange feeds one hourly aggregate to two consumers;
    the FINAL adaptive plan must compute the shuffle once (a
    ReusedExchange node replaces the duplicate subplan). Note: reuse is
    only visible after execution — the pre-run snapshot still shows
    both subplans."""
    df = plans.get("ext_reused_exchange").fn(spark, sf_oracle)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan


def test_nested_struct_scan_prunes_leaves(spark, sf_oracle):
    """Projecting two leaves out of two 2-field structs must prune the
    unused leaves from the parquet ReadSchema — reading whole structs
    to use one field multiplies scan bytes at 100 TB."""
    df = plans.get("src_nested_struct_pruning").fn(spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "status" in read and "total" in read
    assert "priority" not in read and "weighted" not in read
