"""Engine extensions the reference never uses but Catalyst gives for
free (SURVEY.md §2.4/§2.7 call these out as absent: no DISTINCT
aggregates, no grouping sets / rollup / cube, no HAVING, no set
operations, no window frames / ranking beyond LAG). A complete engine
exposes them, oracle-checked like everything else.

All shapes are built-ins — multi-dimensional aggregates expand to
grouping sets inside one shuffle; HAVING is a post-aggregation filter;
set ops hash-partition on the full row. ``approx_count_distinct`` is
registered WITHOUT an oracle (HLL sketches differ across engines by
design) — its accuracy bound is pinned in tests/test_extensions.py
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources import load_table
from .registry import query


@query(
    "ext_having",
    survey="ext:having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 30
    """,
)
def ext_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 30)
    )


@query(
    "ext_rollup",
    survey="ext:rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf,
           GROUPING(l_linestatus) AS g_ls,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def ext_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g_rf"),
        F.grouping("l_linestatus").alias("g_ls"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    ).select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "n", "qty")


@query(
    "ext_cube",
    survey="ext:cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_st,
           GROUPING(o_orderpriority) AS g_pr,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def ext_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").alias("g_st"),
        F.grouping("o_orderpriority").alias("g_pr"),
        F.count(F.lit(1)).alias("n"),
    ).select("o_orderstatus", "o_orderpriority", "g_st", "g_pr", "n")


@query(
    "ext_distinct_agg",
    survey="ext:distinct-agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def ext_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n"),
    )


# No oracle: HLL sketch results are engine-specific by design. The
# driver records a rows-only check; the ±5% accuracy bound vs the exact
# count is asserted in tests/test_extensions.py.
@query("ext_approx_distinct", survey="ext:approx-agg")
def ext_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


@query(
    "ext_setops",
    survey="ext:set-operations",
    oracle="""
    WITH building AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    big_spenders AS (
        SELECT o_custkey AS c_custkey FROM orders
        GROUP BY o_custkey HAVING SUM(o_totalprice) > 1000000
    )
    SELECT 'union' AS op, c_custkey FROM (
        SELECT c_custkey FROM building UNION SELECT c_custkey FROM big_spenders
    )
    UNION ALL
    SELECT 'intersect', c_custkey FROM (
        SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big_spenders
    )
    UNION ALL
    SELECT 'except', c_custkey FROM (
        SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big_spenders
    )
    """,
)
def ext_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    spenders = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
        .filter(F.col("s") > 1_000_000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        building.union(spenders).distinct()
        .select(F.lit("union").alias("op"), "c_custkey")
        .unionAll(
            building.intersect(spenders).select(
                F.lit("intersect").alias("op"), "c_custkey"
            )
        )
        .unionAll(
            building.exceptAll(spenders).distinct().select(
                F.lit("except").alias("op"), "c_custkey"
            )
        )
    )


@query(
    "ext_salted_agg",
    survey="ext:skew-salting",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total
    FROM events
    GROUP BY event_type
    """,
)
def ext_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on the power-law event_type key —
    bit-identical result to the direct groupBy (count/sum are
    commutative monoids), verified against the plain-SQL oracle."""
    from ..operators.skew import salted_count_sum

    ev = load_table(spark, sf_dir, "events")
    return salted_count_sum(
        ev, ["event_type"], salt_col="event_id", value_col="value"
    )


@query(
    "ext_moving_avg",
    survey="ext:window-frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
               AS spend_ma7
    FROM orders
    """,
)
def ext_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.avg("o_totalprice").over(w), 4).alias("spend_ma7"),
    )


@query(
    "ext_lead_ntile",
    survey="ext:ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LEAD(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS next_orderkey,
           NTILE(4) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS quartile
    FROM orders
    """,
)
def ext_lead_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.ntile(4).over(w).alias("quartile"),
    )
