"""Join operators (SURVEY.md §2.3): equi / OR-join rewrite / triangular
self-join / semi / anti / fact-bridge / as-of latest-per-key.

Scale notes baked into each plan:
- dimension sides are broadcast (no shuffle of the fact table for J1/J6);
- the J2 OR-join is rewritten as a union of two equi-joins — an OR join
  condition would force a broadcast-nested-loop join, which is quadratic
  at 100 TB;
- J7 (as-of) replaces the reference's N+1 per-key loop
  (src/routes/portfolio.js:289-302 et al.) with one window + one join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators.asof import latest_per_key
from ..sources import load_table
from .numeric import money_sum
from .registry import query


# --------------------------------------------------------------------------
# J1 — inner equi-joins fact→dims (stocklist⋈users etc.,
# src/routes/lists.js:24-36). Dims broadcast; single shuffle on the
# group key only.
# --------------------------------------------------------------------------
@query(
    "j1_join_dims",
    survey="J1,A1",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))), 2)
                AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def j1_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# J2 — join with disjunctive ON (undirected friend-edge resolution,
# src/routes/users.js:68-75). An OR join forces BNLJ in Spark, so we
# rewrite as a UNION of two equi-joins + DISTINCT — each leg hash-joins.
# --------------------------------------------------------------------------
@query(
    "j2_or_join_union",
    survey="J2",
    oracle="""
    SELECT DISTINCT c.c_custkey, s.s_suppkey
    FROM customer c
    JOIN supplier s
      ON c.c_nationkey = s.s_nationkey OR c.c_custkey = s.s_suppkey
    """,
)
def j2_or_join_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    leg1 = c.join(F.broadcast(s), c.c_nationkey == s.s_nationkey).select(
        "c_custkey", "s_suppkey"
    )
    leg2 = c.join(F.broadcast(s), c.c_custkey == s.s_suppkey).select(
        "c_custkey", "s_suppkey"
    )
    return leg1.union(leg2).distinct()


# --------------------------------------------------------------------------
# J4 — self-join with triangular (theta) component: equi key in the ON
# clause, `<=` as a post-filter so Catalyst keeps the hash join
# (upper-triangle correlation pairs, src/routes/portfolio.js:464-473).
# --------------------------------------------------------------------------
@query(
    "j4_triangular_selfjoin",
    survey="J4,E7",
    oracle="""
    SELECT s1.s_nationkey AS nationkey,
           s1.s_suppkey AS supp1, s2.s_suppkey AS supp2
    FROM supplier s1
    JOIN supplier s2
      ON s1.s_nationkey = s2.s_nationkey AND s1.s_suppkey < s2.s_suppkey
    """,
)
def j4_triangular_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    s1 = s.alias("s1")
    s2 = s.alias("s2")
    return (
        s1.join(s2, F.col("s1.s_nationkey") == F.col("s2.s_nationkey"))
        .filter(F.col("s1.s_suppkey") < F.col("s2.s_suppkey"))
        .select(
            F.col("s1.s_nationkey").alias("nationkey"),
            F.col("s1.s_suppkey").alias("supp1"),
            F.col("s2.s_suppkey").alias("supp2"),
        )
    )


# --------------------------------------------------------------------------
# J5 — semi-join via EXISTS (shared-with existence,
# src/routes/lists.js:168-194) → left_semi: no row duplication, the
# probe side never materializes.
# --------------------------------------------------------------------------
@query(
    "j5_semijoin_exists",
    survey="J5",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def j5_semijoin_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# J8 — anti-join (validation probes whose empty result gates an insert,
# src/routes/users.js:318-350) → left_anti.
# --------------------------------------------------------------------------
@query(
    "j8_antijoin",
    survey="J8",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def j8_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Anti-join against the URGENT subset: every customer has SOME
    # order in the driver data, so the unfiltered anti-join is empty
    # at every SF and its hash row can't discriminate (0 vs 0). The
    # filtered variant keeps the same left_anti plan shape and yields
    # 18 rows @ sf0.001 / 203 @ sf0.01. The filter lands below the
    # join, so the build side shrinks before the shuffle — the shape
    # you want at 100 TB too.
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# J6 — fact ⋈ bridge (Holdings⋈Stocks, src/routes/portfolio.js:459-462):
# lineitem ⋈ orders, revenue by order priority.
# --------------------------------------------------------------------------
@query(
    "j6_fact_bridge",
    survey="J6",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(27,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderpriority
    """,
)
def j6_fact_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# J7 — as-of / latest-per-key. The reference runs one query per key
# (`ORDER BY timestamp DESC LIMIT 1` in a loop —
# src/routes/portfolio.js:289-302, src/routes/holdings.js:46-65,
# src/routes/trading.js:22-35). Set-based rewrite: row_number over
# (PARTITION BY key ORDER BY time DESC) = 1, then one equi-join.
# One shuffle on the key instead of N round-trips.
# --------------------------------------------------------------------------
@query(
    "j7_asof_latest",
    survey="J7,W3",
    oracle="""
    SELECT c.c_custkey, c.c_name, t.o_orderkey AS last_orderkey,
           t.o_orderdate AS last_orderdate, t.o_totalprice AS last_totalprice
    FROM customer c
    JOIN (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ) t ON t.o_custkey = c.c_custkey AND t.rn = 1
    """,
)
def j7_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    last = latest_per_key(
        o, keys=["o_custkey"], order_col="o_orderdate", tiebreak="o_orderkey"
    )
    return c.join(last, c.c_custkey == last.o_custkey).select(
        "c_custkey",
        "c_name",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


# --------------------------------------------------------------------------
# J7 + A7 — portfolio market value: latest price per key, then
# sum over a grouping (the reference accumulates close*shares in a JS
# loop across N+1 queries, src/routes/portfolio.js:288-303).
# --------------------------------------------------------------------------
@query(
    "j7_a7_market_value",
    survey="J7,A7",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(t.o_totalprice AS DECIMAL(27,6))), 2)
                AS DOUBLE) AS segment_value
    FROM customer c
    JOIN (
        SELECT o_custkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ) t ON t.o_custkey = c.c_custkey AND t.rn = 1
    GROUP BY c.c_mktsegment
    """,
)
def j7_a7_market_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    last = latest_per_key(
        o, keys=["o_custkey"], order_col="o_orderdate", tiebreak="o_orderkey"
    )
    return (
        c.join(last, c.c_custkey == last.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(F.col("o_totalprice")).alias("segment_value"),
        )
    )


# --------------------------------------------------------------------------
# W3 — ranked top-n per group (generalization of the latest-per-key
# window, SURVEY.md §2.5 W3).
# --------------------------------------------------------------------------
@query(
    "w3_topn_per_group",
    survey="W3,O2",
    oracle="""
    SELECT nationkey, c_custkey, c_acctbal, rnk
    FROM (
        SELECT c_nationkey AS nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rnk
        FROM customer
    ) t
    WHERE rnk <= 3
    """,
)
def w3_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            "c_custkey",
            "c_acctbal",
            "rnk",
        )
    )


# --------------------------------------------------------------------------
# F8/F9 analog on driver tables — the reference's access-control
# predicate shape (owner OR public OR EXISTS(share),
# src/routes/lists.js:184-194) as: own-segment OR urgent OR
# EXISTS(big lineitem). Same plan shape: OR of cheap predicates with a
# semi-join arm. The true fixture-table versions live in
# operators/domain.py (tests/test_domain_semantics.py).
# --------------------------------------------------------------------------
@query(
    "f8_analog_acl",
    survey="F8,F9,J5",
    oracle="""
    SELECT o.o_orderkey
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING'
       OR o.o_orderpriority = '1-URGENT'
       OR EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49
          )
    """,
)
def f8_analog_acl(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") > 49).select("l_orderkey").distinct()
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        big, o.o_orderkey == big.l_orderkey, "left"
    )
    visible = (
        (F.col("c_mktsegment") == "BUILDING")
        | (F.col("o_orderpriority") == "1-URGENT")
        | F.col("l_orderkey").isNotNull()
    )
    return joined.filter(visible).select("o_orderkey")


# --------------------------------------------------------------------------
# J6 via bucketed layout — the ingest-time contract for the hot
# fact⋈fact join. Both orders and lineitem are written bucketed+sorted
# by orderkey ONCE (sources/bucketing.py); every subsequent join on
# that key is a zero-Exchange sort-merge — at 100 TB the dominant join
# shuffle disappears from all downstream pipelines reusing the layout.
# The query asserts the property from the executed plan (the join
# subplan must contain no Exchange) before aggregating, so a layout
# regression fails the correctness row, not just a perf number.
# Same semantics and oracle as j6_fact_bridge.
# --------------------------------------------------------------------------
@query(
    "j6_bucketed_fact_join",
    survey="J6,bucketed-join",
    priority=45,
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(27,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderpriority
    """,
)
def j6_bucketed_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from ..sources.bucketing import assert_no_shuffle_join, write_bucketed

    # table names key on a hash of the FULL source path so two datasets
    # sharing a basename can never alias each other's bucketed copy;
    # within-session reuse assumes the source directory is immutable
    # (the driver testdata is read-only).
    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:10]
    lt, ot = f"b_lineitem_{tag}", f"b_orders_{tag}"
    if not spark.catalog.tableExists(lt) or not spark.catalog.tableExists(ot):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        )
        write_bucketed(li, lt, ["l_orderkey"])
        write_bucketed(o, ot, ["o_orderkey"])
    ofilt = spark.table(ot).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    # a merge-join HINT (not a session conf) pins the bucketed
    # sort-merge path — the 100 TB shape, where neither fact side
    # broadcasts. The hint lives in the plan itself, so the asserted
    # plan IS the plan the caller later executes, and concurrent
    # queries in the session are untouched.
    joined = spark.table(lt).hint("merge").join(
        ofilt.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    assert_no_shuffle_join(joined)
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
    )


# --------------------------------------------------------------------------
# J9 (beyond) — general as-of join: for each purchase event, the most
# recent 'view' event by the same user at or before the purchase
# timestamp. The reference's closest shape is the per-key
# latest-price loop (J7); a true as-of join is its generalization to a
# left table of arbitrary probe times. operators/asof.py implements it
# as union + one window (single shuffle on user_id) — no range
# explosion, no BNLJ, no pandas; the oracle replays it with an
# inequality join + row_number, which is only feasible oracle-side.
# --------------------------------------------------------------------------
@query(
    "j9_asof_join_purchase_view",
    survey="beyond:asof-join,J7",
    priority=60,
    oracle="""
    WITH v AS (
        SELECT user_id, ts, MAX_BY(value, event_id) AS value
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
        SELECT p.event_id, v.value AS vv,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id ORDER BY v.ts DESC
               ) AS rn
        FROM p JOIN v
          ON v.user_id = p.user_id AND v.ts <= p.ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           p.value AS purchase_value,
           r.vv AS last_view_value
    FROM p
    LEFT JOIN (SELECT event_id, vv FROM ranked WHERE rn = 1) r
      USING (event_id)
    """,
)
def j9_asof_join_purchase_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # Dedupe the right side to one row per (user_id, ts) — max
    # event_id wins — so the window fill inside asof_join is
    # order-deterministic even if timestamps ever collide.
    views = latest_per_key(
        ev.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts", "value"
        ),
        keys=["user_id", "ts"],
        order_col="event_id",
    ).drop("event_id")
    return asof_join(
        purchases, views, on=["user_id"], left_time="ts", right_time="ts"
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
        F.col("value_r").alias("last_view_value"),
    )


# --------------------------------------------------------------------------
# J10 (beyond) — banded range join: events ⋈ time windows with NO
# equi-key. Windows = the 20 busiest hours, widened to 2h (so they
# overlap and an event can land in two). A naive range join is a
# BroadcastNestedLoopJoin — quadratic; operators/rangejoin.py bands
# time so it becomes a hash equi-join on the band id with the exact
# range predicate as a residual. The empty-window-safe aggregate
# left-joins the inner result back to the window table.
# --------------------------------------------------------------------------
@query(
    "j10_range_join_busy_windows",
    survey="beyond:range-join",
    priority=60,
    oracle="""
    WITH hours AS (
        SELECT date_trunc('hour', ts) AS w_start, COUNT(*) AS c
        FROM events GROUP BY 1
        ORDER BY c DESC, w_start LIMIT 20
    ),
    wins AS (
        SELECT w_start, w_start + INTERVAL 2 HOUR AS w_end FROM hours
    )
    SELECT w.w_start,
           COUNT(e.event_id) AS n_events,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(27,6))), 2)
                AS DOUBLE) AS sum_value
    FROM wins w
    LEFT JOIN events e
      ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.w_start
    """,
)
def j10_range_join_busy_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.rangejoin import banded_range_join

    ev = load_table(spark, sf_dir, "events")
    hours = ev.groupBy(
        F.date_trunc("hour", "ts").alias("w_start")
    ).agg(F.count(F.lit(1)).alias("c"))
    wins = (
        hours.orderBy(F.desc("c"), F.asc("w_start"))
        .limit(20)
        .select(
            "w_start",
            (F.col("w_start") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
        )
    )
    joined = banded_range_join(
        ev.select("event_id", "ts", "value"),
        wins,
        point_ts="ts",
        start_ts="w_start",
        end_ts="w_end",
        band_seconds=7200,
    )
    agg = joined.groupBy("w_start").agg(
        F.count("event_id").alias("n_events"),
        money_sum(F.col("value")).alias("sum_value"),
    )
    return wins.select("w_start").join(agg, "w_start", "left").select(
        "w_start",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "sum_value",
    )


# --------------------------------------------------------------------------
# J11 — blocked fuzzy-match join (entity resolution). Naive fuzzy
# matching is an all-pairs edit-distance scan; the standard fix is
# BLOCKING: hash candidates into cheap equality buckets (here the
# name's final token — the head noun) and verify the expensive metric
# only inside blocks, turning O(n²) global pairs into Σ O(block²)
# with block size bounded by the blocking key's selectivity. The same
# shape scales to 100 TB as a plain equi-join on the block key;
# levenshtein is an identical integer metric in both engines, so the
# verification filter carries a full value-hash oracle.
# --------------------------------------------------------------------------
FUZZY_MAX_DIST = 3


@query(
    "j11_fuzzy_name_match",
    survey="beyond:fuzzy-match,J4",
    priority=60,
    oracle=f"""
    WITH names AS (
        SELECT DISTINCT p_name,
               string_split(p_name, ' ')[-1] AS block
        FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM names a
    JOIN names b ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
)
def j11_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn(
            "block", F.element_at(F.split(F.col("p_name"), " "), -1)
        )
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias(
                "dist"
            ),
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
    )


# --------------------------------------------------------------------------
# J13 (beyond) — as-of join with tolerance: the J9 as-of match, but a
# match older than MAX_STALENESS is discarded (NULL fill), the way a
# feature-store point-in-time join bounds feature staleness. Because
# the as-of match is the LATEST right row at-or-before the probe
# time, "latest match within the window" and "discard stale latest
# match" are the same set — so the tolerance is one post-filter on
# the carried match timestamp, not a different join. Plan unchanged:
# one union + one window shuffle on user_id.
# --------------------------------------------------------------------------
@query(
    "j13_asof_tolerance",
    survey="beyond:asof-tolerance,J7",
    priority=60,
    oracle="""
    WITH v AS (
        SELECT user_id, ts, MAX_BY(value, event_id) AS value
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
        SELECT p.event_id, v.value AS vv, v.ts AS vts,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id ORDER BY v.ts DESC
               ) AS rn
        FROM p JOIN v
          ON v.user_id = p.user_id AND v.ts <= p.ts
    )
    SELECT p.event_id, p.user_id,
           p.value AS purchase_value,
           CASE WHEN r.vts >= p.ts - INTERVAL 1 HOUR THEN r.vv END
               AS fresh_view_value
    FROM p
    LEFT JOIN (SELECT event_id, vv, vts FROM ranked WHERE rn = 1) r
      USING (event_id)
    """,
)
def j13_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join, latest_per_key

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        latest_per_key(
            ev.filter(F.col("event_type") == "view").select(
                "event_id", "user_id", "ts", "value"
            ),
            keys=["user_id", "ts"],
            order_col="event_id",
        )
        .drop("event_id")
        # duplicate the match time as a value column so the window
        # fill carries it to the probe row for the staleness test
        .withColumn("view_ts", F.col("ts"))
    )
    joined = asof_join(
        purchases, views, on=["user_id"], left_time="ts", right_time="ts"
    )
    fresh = F.col("view_ts_r") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return joined.select(
        "event_id",
        "user_id",
        F.col("value").alias("purchase_value"),
        F.when(fresh, F.col("value_r")).alias("fresh_view_value"),
    )


# --------------------------------------------------------------------------
# J14 — join strategy control surface: the same dimensional join as
# J1, but forced to a shuffled hash join via the DataFrame hint (the
# knob for when the "small" side outgrows broadcast but a sort-merge's
# double sort is still wasteful). Results must be bit-identical to the
# optimizer's own choice — pinned by the shared oracle; the strategy
# itself is pinned in tests/test_advanced_ops.py.
# --------------------------------------------------------------------------
@query(
    "j14_shuffle_hash_hint",
    survey="J1,ext:join-hints",
    priority=60,
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(27,6))), 2)
                AS DOUBLE) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j14_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").hint("shuffle_hash")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(F.col("c_acctbal")).alias("total_balance"),
        )
    )


# --------------------------------------------------------------------------
# J16 — nearest-event join (either direction, bounded, banded).
# --------------------------------------------------------------------------
_NEAREST_WINDOW_S = 1800  # ±30 minutes


@query(
    "j16_asof_nearest",
    survey="beyond:asof-nearest,J7,J3",
    priority=60,
    oracle=f"""
    WITH pairs AS (
        SELECT p.event_id AS purchase_id, p.user_id,
               p.ts AS purchase_ts, c.event_id AS click_id,
               c.ts AS click_ts,
               ABS(EPOCH_US(c.ts) - EPOCH_US(p.ts)) AS abs_us
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND ABS(EPOCH_US(c.ts) - EPOCH_US(p.ts))
             <= {_NEAREST_WINDOW_S} * 1000000
        WHERE p.event_type = 'purchase'
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY purchase_id
            ORDER BY abs_us, click_ts, click_id
        ) AS rn
        FROM pairs
    )
    SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
    FROM ranked WHERE rn = 1
    """,
)
def j16_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest click to each purchase within ±30 min — EITHER
    direction (j7/j9/j13 are backward-only as-of joins; sensor fusion
    and attribution sometimes want the closest event, before or
    after). Ties (equidistant before/after) break to the earlier
    click, then event_id.

    Banded like j10: both sides bucket to 30-minute bands and each
    purchase probes its own and both adjacent bands — a pure
    (user, band) hash equi-join plus residual |Δt| filter, never a
    time-range BNLJ. Candidate volume per purchase is bounded by
    per-user click density in a 90-minute strip regardless of table
    size; the final pick is one row_number window keyed by purchase."""
    ev = load_table(spark, sf_dir, "events")
    band = lambda c: F.floor(F.unix_timestamp(c) / _NEAREST_WINDOW_S)  # noqa: E731
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.explode(
            F.array(
                band(F.col("ts")) - 1, band(F.col("ts")), band(F.col("ts")) + 1
            )
        ).alias("band"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        band(F.col("ts")).alias("band"),
    )
    abs_us = F.abs(
        F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("purchase_ts"))
    )
    pairs = (
        p.join(c, (p.user_id == c.c_user) & (p.band == c.band))
        .filter(abs_us <= _NEAREST_WINDOW_S * 1_000_000)
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            "click_id",
            "click_ts",
            abs_us.alias("abs_us"),
        )
        .distinct()  # adjacent-band probes can duplicate a candidate
    )
    w = W.partitionBy("purchase_id").orderBy(
        "abs_us", "click_ts", "click_id"
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "abs_us")
    )


# --------------------------------------------------------------------------
# J17 (beyond) — interval × interval overlap join: concurrent user
# sessions. The range-range generalization of j10: BOTH sides band
# (operators/rangejoin.py:interval_overlap_join), candidates meet in
# a hash equi-join on the band id, and the first-shared-band residual
# emits each overlapping pair exactly once with no post-join
# distinct. Output: each cross-user session pair that overlaps in
# time, with the exact overlap in whole microseconds (integer
# arithmetic — deterministic). Ordered-pair convention (u1, s1) <
# (u2, s2) keeps every pair single-sided in both engines.
# --------------------------------------------------------------------------
_SESS_CTE = """
    marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts)
                         - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                        > 1800000000
                    THEN 1 ELSE 0 END AS newsess
        FROM events
    ),
    snum AS (
        SELECT user_id, ts,
               CAST(SUM(newsess) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) + 1
                    AS BIGINT) AS session_id
        FROM marked
    ),
    sess AS (
        SELECT user_id, session_id,
               MIN(ts) AS st, MAX(ts) AS en
        FROM snum GROUP BY user_id, session_id
    )
"""


@query(
    "j17_interval_overlap",
    survey="beyond:interval-overlap-join",
    priority=60,
    oracle=f"""
    WITH {_SESS_CTE}
    SELECT a.user_id AS u1, a.session_id AS s1,
           b.user_id AS u2, b.session_id AS s2,
           epoch_us(LEAST(a.en, b.en))
           - epoch_us(GREATEST(a.st, b.st)) AS ov_us
    FROM sess a
    JOIN sess b
      ON a.st < b.en AND b.st < a.en
     AND (a.user_id, a.session_id) < (b.user_id, b.session_id)
    """,
)
def j17_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import interval_overlap_join
    from ..streaming.events import sessionize_batch

    # sess feeds BOTH sides of the banded self-join; without a cut the
    # sessionize windows (lag + running sum + group) run twice. The
    # session table is one row per session — tiny relative to events.
    sess = sessionize_batch(
        load_table(spark, sf_dir, "events")
    ).localCheckpoint(eager=True)
    a = sess.select(
        F.col("user_id").alias("u1"),
        F.col("session_id").alias("s1"),
        F.col("session_start").alias("st1"),
        F.col("session_end").alias("en1"),
    )
    b = sess.select(
        F.col("user_id").alias("u2"),
        F.col("session_id").alias("s2"),
        F.col("session_start").alias("st2"),
        F.col("session_end").alias("en2"),
    )
    joined = interval_overlap_join(
        a, b, "st1", "en1", "st2", "en2", band_seconds=3600
    )
    ordered = (F.col("u1") < F.col("u2")) | (
        (F.col("u1") == F.col("u2")) & (F.col("s1") < F.col("s2"))
    )
    return joined.filter(ordered).select(
        "u1",
        "s1",
        "u2",
        "s2",
        (
            F.unix_micros(F.least("en1", "en2"))
            - F.unix_micros(F.greatest("st1", "st2"))
        ).alias("ov_us"),
    )


# --------------------------------------------------------------------------
# J18 — 2-D skyline (Pareto frontier): the parts no other part beats on
# BOTH price (minimize) and size (maximize). The relational semantics
# are the NOT EXISTS dominance anti-join — quadratic if planned
# naively — executed here as the two-phase distributed skyline
# (operators/skyline.py): map-side local-pareto prefilter (zero
# shuffle, kills ~all rows), then an exact frontier pass over the
# surviving distinct prices + a broadcast join back to restore full
# rows. Exact-duplicate (price, size) pairs don't dominate each other,
# so every copy of a frontier point is returned — matching NOT EXISTS.
# The oracle uses the group-max/window formulation (O(n log n) in
# DuckDB); tests/test_skyline.py additionally pins equality against
# the brute-force NOT EXISTS on small data, so both independent
# formulations agree. All output columns are raw passthroughs — no
# float rounding needed.
# --------------------------------------------------------------------------
@query(
    "j18_skyline_pareto",
    survey="beyond:skyline-pareto",
    priority=60,
    oracle="""
    WITH g AS (
        SELECT p_retailprice AS price, MAX(p_size) AS msize
        FROM part
        WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
        GROUP BY p_retailprice
    ),
    k AS (
        SELECT price, msize,
               MAX(msize) OVER (
                   ORDER BY price ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev
        FROM g
    ),
    sky AS (
        SELECT price, msize FROM k WHERE prev IS NULL OR msize > prev
    )
    SELECT p.p_partkey, p.p_brand, p.p_retailprice, p.p_size
    FROM part p
    JOIN sky s
      ON p.p_retailprice = s.price AND p.p_size = s.msize
    """,
)
def j18_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skyline import skyline

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    return skyline(part, lo="p_retailprice", hi="p_size")
