"""Core relational operators: scans, filters, sorts, top-k, distinct,
grouped aggregates (SURVEY.md §2.1, §2.2, §2.4, §2.6, §2.8).

Each query re-expresses a reference query shape on the driver's test
tables. Reference citations are to /root/reference/ file:line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources import load_table
from .numeric import money_sum
from .registry import query


# --------------------------------------------------------------------------
# A1 — grouped multi-aggregate (flagship).
# Reference shape: GET /api/stocks/:symbol/stats — 7 aggregates GROUP BY
# symbol (src/routes/stocks.js:208-221). Same operator on lineitem is the
# TPC-H Q1 pricing summary. Scale note: purely map-side partial agg +
# one shuffle on the (tiny-cardinality) group keys; AQE coalesces the
# post-shuffle partitions. No driver-side work.
# --------------------------------------------------------------------------
@query(
    "a1_pricing_summary",
    survey="A1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                                   AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(27,6))), 2)
                AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(27,6))), 2) AS DOUBLE)
               AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                               AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_price"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# A1 variant — per-key stats panel, the literal shape of
# src/routes/stocks.js:208-221 (COUNT/MIN/MAX/AVG/SUM GROUP BY symbol)
# on the events table (event_type plays 'symbol', value plays 'close').
# --------------------------------------------------------------------------
@query(
    "a1_key_stats",
    survey="A1",
    oracle="""
    SELECT event_type,
           COUNT(*)                 AS n_rows,
           MIN(ts)                  AS first_ts,
           MAX(ts)                  AS last_ts,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_value,
           ROUND(MAX(value), 6)     AS max_value,
           ROUND(MIN(value), 6)     AS min_value,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 4) AS DOUBLE)
               AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def a1_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.round(
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        money_sum(F.col("value"), 4).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# S1 — table scan + projection (SELECT <cols> FROM t WHERE ...),
# e.g. src/routes/lists.js:50-57. Projection + predicate both push to
# the parquet scan (check: PushedFilters / ReadSchema in explain).
# --------------------------------------------------------------------------
@query(
    "s1_scan_project",
    survey="S1,F1",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def s1_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# S2 — point lookup on a key (price for (symbol, date),
# src/routes/stocks.js:89-92). The key is derived in-plan (scalar agg +
# broadcast join), not collected to the driver.
# --------------------------------------------------------------------------
@query(
    "s2_point_lookup",
    survey="S2",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
    """,
)
def s2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    min_key = orders.agg(F.min("o_orderkey").alias("_k"))
    return (
        orders.join(F.broadcast(min_key), orders.o_orderkey == F.col("_k"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )


# --------------------------------------------------------------------------
# S9 — connectivity probe (SELECT NOW(), src/index.js:45). Deterministic
# variant for the oracle.
# --------------------------------------------------------------------------
@query("s9_probe", survey="S9,E1", oracle="SELECT 1 AS ok")
def s9_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql("SELECT 1 AS ok")


# --------------------------------------------------------------------------
# F2/F3 — date-range BETWEEN + timestamp::date cast
# (src/routes/stocks.js:111-114, src/routes/portfolio.js:294,372).
# --------------------------------------------------------------------------
@query(
    "f2_date_between",
    survey="F2,F3,E3",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day,
           l_quantity
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 23:59:59'
    """,
)
def f2_date_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1996-12-31 23:59:59").cast("timestamp"),
            )
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("ship_day"),
            "l_quantity",
        )
    )


# --------------------------------------------------------------------------
# F4 — case-insensitive substring search (email ILIKE '%q%' LIMIT 20,
# src/routes/users.js:50-53). Top-k by key keeps the LIMIT deterministic.
# --------------------------------------------------------------------------
@query(
    "f4_ilike_search",
    survey="F4,O2",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_name ILIKE '%42%'
    ORDER BY c_custkey
    LIMIT 20
    """,
)
def f4_ilike_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_name").ilike("%42%"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# F5 — IN-list membership (status state machine, sql/schema.sql:30,
# src/routes/users.js:337).
# --------------------------------------------------------------------------
@query(
    "f5_in_list",
    survey="F5",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
    GROUP BY o_orderstatus
    """,
)
def f5_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "P"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# F6 — disjunctive predicate incl. symmetric-pair match
# (pending request either direction, src/routes/users.js:336-340).
# --------------------------------------------------------------------------
@query(
    "f6_or_predicate",
    survey="F6",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'O' AND o_orderpriority = '1-URGENT')
       OR (o_orderstatus = 'F' AND o_orderpriority = '5-LOW')
    """,
)
def f6_or_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") == "1-URGENT"))
        | ((F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "5-LOW"))
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


# --------------------------------------------------------------------------
# A6 — SELECT DISTINCT (src/routes/stocks.js:9-11).
# --------------------------------------------------------------------------
@query(
    "a6_distinct",
    survey="A6",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def a6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


# --------------------------------------------------------------------------
# O2 — ORDER BY ... LIMIT n top-k (latest-15 board, src/routes/stocks.js:21-26).
# Catalyst compiles to TakeOrderedAndProject: per-partition top-k then a
# driver merge of k·p rows — no global sort at any scale.
# Unique tie-break key keeps the result deterministic.
# --------------------------------------------------------------------------
@query(
    "o2_topk",
    survey="O2,O1",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def o2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(15)
    )


# --------------------------------------------------------------------------
# O4 — fetch LIMIT-desc then re-sort chronological (the reference reverses
# app-side after a DESC LIMIT fetch, src/routes/portfolio.js:513-514,
# src/routes/chart.js:87-88). Folded into one plan: subquery top-k,
# outer ORDER BY asc.
# --------------------------------------------------------------------------
@query(
    "o4_topk_then_asc",
    survey="O4,O3",
    oracle="""
    SELECT event_id, ts, ROUND(value, 6) AS value
    FROM (
        SELECT event_id, ts, value
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 50
    ) t
    ORDER BY ts ASC, event_id ASC
    """,
)
def o4_topk_then_asc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    top = ev.orderBy(F.col("ts").desc(), F.col("event_id").desc()).limit(50)
    return top.orderBy(F.col("ts").asc(), F.col("event_id").asc()).select(
        "event_id", "ts", F.round("value", 6).alias("value")
    )


# --------------------------------------------------------------------------
# E8 — symbol normalization via UPPER (src/routes/stocks.js:46,70,91).
# E11 — least/greatest pair normalization (src/routes/users.js:205-206).
# --------------------------------------------------------------------------
@query(
    "e8_upper_normalize",
    survey="E8",
    oracle="""
    SELECT DISTINCT UPPER(o_orderpriority) AS priority_uc
    FROM orders
    """,
)
def e8_upper_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select(F.upper("o_orderpriority").alias("priority_uc"))
        .distinct()
    )


@query(
    "e11_pair_normalize",
    survey="E11",
    oracle="""
    SELECT DISTINCT LEAST(l_partkey, l_suppkey)    AS k_lo,
                    GREATEST(l_partkey, l_suppkey) AS k_hi
    FROM lineitem
    """,
)
def e11_pair_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.least("l_partkey", "l_suppkey").alias("k_lo"),
        F.greatest("l_partkey", "l_suppkey").alias("k_hi"),
    ).distinct()


# --------------------------------------------------------------------------
# A7 analog — SUM over an arithmetic expression (portfolio market value:
# sum(close*shares) accumulated in a JS loop, src/routes/portfolio.js:288-303;
# here set-based, grouped by order).
# --------------------------------------------------------------------------
@query(
    "a7_value_sum",
    survey="A7,E5",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice * l_quantity
                               AS DECIMAL(27,6))), 2) AS DOUBLE)
               AS order_value
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(27,6)))
           > 15000000
    """,
)
def a7_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(27,6)"
                )
            ).alias("_raw"),
        )
        # > 15M keeps the result non-empty at every driver SF (20 rows
        # @ sf0.001, 203 @ sf0.01) so the hash check can discriminate.
        .filter(F.col("_raw") > 15_000_000)
        .select(
            "l_orderkey",
            F.round("_raw", 2).cast("double").alias("order_value"),
        )
    )


# --------------------------------------------------------------------------
# A8 — weighted average (cost basis: sum(price*qty)/sum(qty),
# src/routes/trading.js:83-89 recomputed set-based from the ledger).
# --------------------------------------------------------------------------
@query(
    "a8_weighted_avg",
    survey="A8,E6",
    oracle="""
    SELECT l_partkey,
           ROUND(CAST(SUM(CAST(l_extendedprice * l_quantity
                           AS DECIMAL(27,6))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE), 6)
               AS wavg_price
    FROM lineitem
    GROUP BY l_partkey
    """,
)
def a8_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(27,6)"
                )
            ).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double"),
            6,
        ).alias("wavg_price")
    )


# --------------------------------------------------------------------------
# SQL-string API path: the SAME ANSI text runs on Spark (spark.sql over
# registered views) and on DuckDB as the oracle — demonstrating the
# engine's SQL surface is dialect-portable, not just the DataFrame API.
# Correlated EXISTS (J5) chosen because subquery decorrelation is the
# planner feature worth pinning.
# --------------------------------------------------------------------------
_SQL_API_EXISTS = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > 400000
    )
"""


@query("sql_api_exists", survey="J5,S1", oracle=_SQL_API_EXISTS)
def sql_api_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_SQL_API_EXISTS)


# --------------------------------------------------------------------------
# Full SQL-text surface: a multi-CTE report (CTE → join → aggregate →
# window → HAVING-style filter → ORDER) executed verbatim through
# spark.sql over the registered views — the "switch from the
# reference, paste your SQL" path. The IDENTICAL text runs on DuckDB
# as the oracle, so the row hash pins Spark's SQL parser + analyzer
# semantics, not just the DataFrame API.
# --------------------------------------------------------------------------
_SQL_API_REPORT = """
    WITH cust_spend AS (
        SELECT c.c_custkey, c.c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))), 2)
                    AS DOUBLE) AS spend
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_mktsegment
    ),
    ranked AS (
        SELECT c_custkey, c_mktsegment, n_orders, spend,
               ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY spend DESC, c_custkey
               ) AS rnk
        FROM cust_spend
    )
    SELECT c_mktsegment, c_custkey, n_orders, spend, rnk
    FROM ranked
    WHERE rnk <= 5
"""


@query(
    "sql_api_report",
    survey="S1,A1,W3,ext:sql-text",
    priority=60,
    oracle=_SQL_API_REPORT,
)
def sql_api_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_SQL_API_REPORT)


@query(
    "sql_api_bind_params",
    survey="S2,F5,ext:bind-params",
    priority=60,
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_totalprice > 450000.0
      AND o_orderstatus IN ('F', 'O')
    """,
)
def sql_api_bind_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL — the reference's prepared-statement surface
    (every route binds $1/$2 placeholders, e.g.
    src/routes/portfolio.js:289-302's `WHERE symbol=$1`). Spark's
    analog is named parameter markers with `spark.sql(query, args=)`:
    values are bound as literals by the analyzer, never interpolated
    into the SQL text, so the plan is injection-safe and cacheable by
    shape exactly like a prepared statement."""
    from ..sources import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders
        WHERE o_totalprice > :min_price
          AND o_orderstatus IN (:status_f, :status_o)
        """,
        args={"min_price": 450000.0, "status_f": "F", "status_o": "O"},
    )
