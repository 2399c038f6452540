"""Window returns + statistical aggregates (SURVEY.md §2.5 W1-W3,
§2.4 A2-A5) — the analytical heart of the reference
(GET /api/portfolio/:id/statistics, src/routes/portfolio.js:319-482).

The events table plays the role of the Stocks OHLCV fact:
event_type ≈ symbol, daily AVG(value) ≈ close. Every query here derives
from ONE shared returns panel — where the reference runs 2 queries per
holding (N+1) plus a matrix query, we run one window + k aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.returns import daily_close_panel, returns_panel
from ..operators.statistics import (
    beta_vs_market,
    coefficient_of_variation,
    correlation_matrix,
    market_returns,
)
from ..sources import load_table
from .numeric import money_sum
from .registry import query

# Shared oracle CTE: daily close panel + LAG returns on events.
_RETURNS_CTE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS close
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    ),
    rets AS (
        SELECT event_type, d,
               (close - LAG(close) OVER (PARTITION BY event_type ORDER BY d))
               / LAG(close) OVER (PARTITION BY event_type ORDER BY d) AS r
        FROM daily
    ),
    rnn AS (
        SELECT event_type, d, r FROM rets WHERE r IS NOT NULL
    )
"""


def _returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    panel = daily_close_panel(ev, key="event_type", ts_col="ts", value_col="value")
    return returns_panel(panel, key="event_type")


# --------------------------------------------------------------------------
# W2 + F7 — partitioned LAG return panel with NULL-first-row filter
# (src/routes/portfolio.js:396-400 + the IS NOT NULL filters).
# --------------------------------------------------------------------------
@query(
    "w2_returns_panel",
    survey="W2,F7,E5,A3",
    oracle=_RETURNS_CTE
    + "SELECT event_type, d, ROUND(r, 6) AS r FROM rnn",
)
def w2_returns_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    return r.select("event_type", "d", F.round("r", 6).alias("r"))


# --------------------------------------------------------------------------
# W1 — unpartitioned LAG over a single-key slice
# (src/routes/portfolio.js:367-372).
# --------------------------------------------------------------------------
@query(
    "w1_single_series_returns",
    survey="W1,F7",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, AVG(value) AS close
        FROM events
        WHERE event_type = 'click'
        GROUP BY CAST(ts AS DATE)
    ),
    rets AS (
        SELECT d, (close - LAG(close) OVER (ORDER BY d))
                  / LAG(close) OVER (ORDER BY d) AS r
        FROM daily
    )
    SELECT d, ROUND(r, 6) AS r FROM rets WHERE r IS NOT NULL
    """,
)
def w1_single_series_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    panel = daily_close_panel(ev, key="event_type", ts_col="ts", value_col="value")
    # Single-key slice → the reference's unpartitioned form is safe here;
    # we still compute it per-key then drop the key column.
    r = returns_panel(panel, key="event_type")
    return r.select("d", F.round("r", 6).alias("r"))


# --------------------------------------------------------------------------
# A2 — coefficient of variation STDDEV(r)/AVG(r) per key
# (the reference's "COV", src/routes/portfolio.js:366-378;
# Postgres STDDEV = sample stddev → stddev_samp).
# --------------------------------------------------------------------------
@query(
    "a2_coefficient_of_variation",
    survey="A2,E6",
    oracle=_RETURNS_CTE
    + """
    SELECT event_type, ROUND(STDDEV_SAMP(r) / AVG(r), 6) AS cov
    FROM rnn
    GROUP BY event_type
    """,
)
def a2_coefficient_of_variation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    return coefficient_of_variation(r, key="event_type").select(
        "event_type", F.round("cov", 6).alias("cov")
    )


# --------------------------------------------------------------------------
# A3 — equal-weight market return per day (src/routes/portfolio.js:402-407).
# --------------------------------------------------------------------------
@query(
    "a3_market_returns",
    survey="A3",
    oracle=_RETURNS_CTE
    + """
    SELECT d, ROUND(AVG(r), 6) AS mr
    FROM rnn
    GROUP BY d
    """,
)
def a3_market_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    return market_returns(r).select("d", F.round("mr", 6).alias("mr"))


# --------------------------------------------------------------------------
# A4 — beta = COVAR_POP(r, mr)/VAR_POP(mr) per key vs the equal-weight
# market (src/routes/portfolio.js:386-417).
# --------------------------------------------------------------------------
@query(
    "a4_beta",
    survey="A4,J3,E6",
    oracle=_RETURNS_CTE
    + """
    , mkt AS (
        SELECT d, AVG(r) AS mr FROM rnn GROUP BY d
    )
    SELECT rnn.event_type,
           ROUND(COVAR_POP(rnn.r, mkt.mr) / VAR_POP(mkt.mr), 6) AS beta
    FROM rnn JOIN mkt ON rnn.d = mkt.d
    GROUP BY rnn.event_type
    """,
)
def a4_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    return beta_vs_market(r, key="event_type").select(
        "event_type", F.round("beta", 6).alias("beta")
    )


# --------------------------------------------------------------------------
# J4 + A5 — upper-triangle correlation matrix: self-join the returns
# panel on day with s1 <= s2, then corr/covar_pop per pair
# (src/routes/portfolio.js:450-475).
# --------------------------------------------------------------------------
@query(
    "a5_correlation_matrix",
    survey="A5,J4",
    oracle=_RETURNS_CTE
    + """
    SELECT r1.event_type AS s1, r2.event_type AS s2,
           ROUND(CORR(r1.r, r2.r), 6)      AS correlation,
           ROUND(COVAR_POP(r1.r, r2.r), 6) AS covariance
    FROM rnn r1
    JOIN rnn r2 ON r1.d = r2.d AND r1.event_type <= r2.event_type
    GROUP BY r1.event_type, r2.event_type
    """,
)
def a5_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    m = correlation_matrix(r, key="event_type")
    return m.select(
        "s1",
        "s2",
        F.round("correlation", 6).alias("correlation"),
        F.round("covariance", 6).alias("covariance"),
    )


# --------------------------------------------------------------------------
# §3.1 flagship bundle — COV + beta in ONE pass over the shared persisted
# returns panel (replaces the reference's 2-queries-per-holding N+1 loop
# and its statistics_cache round trips, portfolio.js:319-482).
# --------------------------------------------------------------------------
@query(
    "stats_bundle_cov_beta",
    survey="A2,A4,W2,J3",
    oracle=_RETURNS_CTE
    + """
    , mkt AS (SELECT d, AVG(r) AS mr FROM rnn GROUP BY d),
    cov_t AS (
        SELECT event_type, STDDEV_SAMP(r) / AVG(r) AS cov
        FROM rnn GROUP BY event_type
    ),
    beta_t AS (
        SELECT rnn.event_type,
               COVAR_POP(rnn.r, mkt.mr) / VAR_POP(mkt.mr) AS beta
        FROM rnn JOIN mkt ON rnn.d = mkt.d
        GROUP BY rnn.event_type
    )
    SELECT c.event_type, ROUND(c.cov, 6) AS cov, ROUND(b.beta, 6) AS beta
    FROM cov_t c JOIN beta_t b ON c.event_type = b.event_type
    """,
)
def stats_bundle_cov_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir).persist()
    cov = coefficient_of_variation(r, key="event_type")
    beta = beta_vs_market(r, key="event_type")
    return cov.join(beta, on="event_type").select(
        "event_type",
        F.round("cov", 6).alias("cov"),
        F.round("beta", 6).alias("beta"),
    )


# --------------------------------------------------------------------------
# §4 statistics cache — probe-or-compute, registry-gated. The reference
# memoizes COV/beta in a statistics_cache table (schema.sql:101-110,
# portfolio.js:329-346,427-445); here the wrapper computes on miss,
# upserts, and serves the SECOND call from the cache — the returned
# frame is the cache-hit read, so the oracle also validates the
# write→read round trip through the keyed parquet table.
# --------------------------------------------------------------------------
@query(
    "stats_cached_cov_beta",
    survey="A2,A4,cache:statistics",
    oracle=_RETURNS_CTE
    + """
    , mkt AS (SELECT d, AVG(r) AS mr FROM rnn GROUP BY d),
    cov_t AS (
        SELECT event_type, STDDEV_SAMP(r) / AVG(r) AS cov
        FROM rnn GROUP BY event_type
    ),
    beta_t AS (
        SELECT rnn.event_type,
               COVAR_POP(rnn.r, mkt.mr) / VAR_POP(mkt.mr) AS beta
        FROM rnn JOIN mkt ON rnn.d = mkt.d
        GROUP BY rnn.event_type
    )
    SELECT c.event_type AS symbol,
           ROUND(c.cov, 6) AS cov,
           ROUND(b.beta, 6) AS beta
    FROM cov_t c JOIN beta_t b ON c.event_type = b.event_type
    """,
)
def stats_cached_cov_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.stats_cache import (
        cached_portfolio_statistics,
        statistics_cache_table,
    )

    cache = statistics_cache_table(
        spark, tempfile.mkdtemp(prefix="statcache") + "/t"
    )

    def compute() -> DataFrame:
        return (
            stats_bundle_cov_beta(spark, sf_dir)
            .select(F.col("event_type").alias("symbol"), "cov", "beta")
        )

    args = (cache, 1, "2024-01-01", "2024-12-31", compute)
    cached_portfolio_statistics(*args)  # miss → compute + upsert
    return cached_portfolio_statistics(*args)  # hit → served from cache


# --------------------------------------------------------------------------
# W6 (beyond) — OHLC bar-building: per (user, day) open/high/low/close
# over event values (operators/timeseries.py:downsample_ohlc). The
# map-side-combinable agg formulation — min_by/max_by on (ts,
# event_id) structs — not a window: no per-key sort, partial
# aggregation applies, the cheapest shape for tick→bar at scale.
# --------------------------------------------------------------------------
@query(
    "w6_ohlc_daily",
    survey="beyond:ohlc-downsample",
    priority=60,
    oracle="""
    SELECT user_id,
           date_trunc('day', ts) AS bucket,
           -- DuckDB's min_by/max_by take no struct key; a zero-padded
           -- (epoch_us, event_id) string orders identically to the
           -- Spark side's struct(ts, event_id).
           MIN_BY(value, printf('%020d%020d', epoch_us(ts), event_id))
               AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX_BY(value, printf('%020d%020d', epoch_us(ts), event_id))
               AS close,
           COUNT(*) AS n_ticks
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
    """,
)
def w6_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import downsample_ohlc

    ev = load_table(spark, sf_dir, "events")
    return downsample_ohlc(ev, key="user_id")


# --------------------------------------------------------------------------
# W7 — exponentially weighted moving average per user over the daily
# value series. EWMA is a sequential recurrence (ewma_t = αx_t +
# (1-α)·ewma_{t-1}), which naive implementations push into Python; here
# it stays JVM-side as a per-key array fold: sort-collect the bounded
# daily series per user, then F.aggregate left-folds it inside codegen.
# DuckDB's list_reduce is the exact twin (same init = first element,
# same left-to-right float ops), so the doubles match bit-for-bit
# before the final ROUND. State per key is the day count, not event
# volume — the shuffle moves the daily aggregate only.
# --------------------------------------------------------------------------
EWMA_ALPHA = 0.3


@query(
    "w7_ewma_value",
    survey="ext:ewma",
    priority=60,
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 4) AS DOUBLE)
                   AS v
        FROM events GROUP BY 1, 2
    ),
    arrs AS (
        SELECT user_id, list(v ORDER BY d) AS vals
        FROM daily GROUP BY user_id
    )
    SELECT user_id, CAST(LEN(vals) AS INT) AS n_days,
           ROUND(list_reduce(CAST(vals AS DOUBLE[]),
                             (acc, x) -> CAST(0.3 AS DOUBLE) * x
                                         + CAST(0.7 AS DOUBLE) * acc),
                 6) AS ewma
    FROM arrs
    """,
)
def w7_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        money_sum(F.col("value"), 4).alias("v")
    )
    arrs = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("d", "v"))).alias("s")
    )
    vals = F.transform(F.col("s"), lambda r: r["v"])
    ewma = F.aggregate(
        F.expr("slice(transform(s, r -> r.v), 2, size(s) - 1)"),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(EWMA_ALPHA) * x
        + F.lit(1 - EWMA_ALPHA) * acc,
    )
    return arrs.select(
        "user_id",
        F.size("s").alias("n_days"),
        F.round(ewma, 6).alias("ewma"),
    )


# --------------------------------------------------------------------------
# W8 — running COUNT(DISTINCT) via the first-occurrence rewrite.
# Spark (and most engines) reject DISTINCT aggregates over running
# window frames; the scalable rewrite marks each (user, event_type)'s
# first occurrence with a per-pair row_number, then running-sums the
# 0/1 flag — two window passes, both keyed by user, no distinct state.
# The oracle uses the IDENTICAL formulation so the semantics are
# pinned engine-neutrally.
# --------------------------------------------------------------------------
@query(
    "w8_running_distinct_types",
    survey="W8,ext:window-distinct",
    priority=60,
    oracle="""
    WITH flagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) = 1
               THEN 1 ELSE 0 END AS is_first
        FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(is_first) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_distinct_types
    FROM flagged
    """,
)
def w8_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w_first = W.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1)
        .otherwise(0)
        .alias("is_first"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("is_first").over(w_run).alias("n_distinct_types"),
    )


# --------------------------------------------------------------------------
# W9 — time-weighted average (TWAP): each observation weighted by how
# long it was "live" (until the next observation in its series). The
# correct average for irregularly-sampled series, vs the naive mean
# that over-weights bursts. One LEAD window per user + one aggregate;
# the weighted sum quantizes each product to DECIMAL so the result is
# summation-order-independent across engines.
# --------------------------------------------------------------------------
@query(
    "w9_time_weighted_avg",
    survey="W9,beyond:twap",
    priority=60,
    oracle="""
    WITH seq AS (
        SELECT user_id, value,
               EPOCH_US(LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               )) - EPOCH_US(ts) AS dt
        FROM events
    )
    SELECT user_id,
           ROUND(CAST(SUM(CAST(value * dt AS DECIMAL(27,6))) AS DOUBLE)
                 / CAST(SUM(CAST(dt AS DECIMAL(27,6))) AS DOUBLE), 6)
               AS twap
    FROM seq
    WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    """,
)
def w9_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as Win

    ev = load_table(spark, sf_dir, "events")
    w = Win.partitionBy("user_id").orderBy("ts", "event_id")
    # dt in WHOLE MICROSECONDS on both sides: timestamps carry
    # sub-second precision, and a seconds-truncated dt (unix_timestamp)
    # vs a fractional-seconds dt (DuckDB EPOCH) weights every interval
    # differently. unix_micros ↔ EPOCH_US are exact integer twins.
    seq = ev.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dt"),
    ).filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
    # Divide as doubles: the decimal sums are exact (order-free), the
    # decimal→double conversion is deterministic, and IEEE division is
    # bit-stable — whereas decimal/decimal division scale rules differ
    # between engines (measured 1e-5 drift).
    num = F.sum((F.col("value") * F.col("dt")).cast("decimal(27,6)")).cast(
        "double"
    )
    den = F.sum(F.col("dt").cast("decimal(27,6)")).cast("double")
    return seq.groupBy("user_id").agg(
        F.round(num / den, 6).alias("twap")
    )


# --------------------------------------------------------------------------
# A9 — contribution share (percent-of-total). The oracle states it as
# a partition-less window SUM OVER (); the Spark plan computes the
# grand total as a 1-row aggregate and broadcasts it — at scale a
# global window would funnel every group through one reducer, while
# the broadcast scaffold keeps the plan two map-side-combinable
# aggregates and a free join.
# --------------------------------------------------------------------------
@query(
    "a9_contribution_share",
    survey="A9,beyond:contribution",
    priority=60,
    oracle="""
    WITH per_nation AS (
        SELECT n.n_name AS nation,
               SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT nation,
           CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
           CAST(ROUND(rev / SUM(rev) OVER (), 6) AS DOUBLE) AS share
    FROM per_nation
    """,
)
def a9_contribution_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("rev")
        )
    )
    total = per_nation.agg(F.sum("rev").alias("tot"))
    return per_nation.crossJoin(F.broadcast(total)).select(
        "nation",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(F.col("rev") / F.col("tot"), 6).cast("double").alias("share"),
    )


# --------------------------------------------------------------------------
# Rolling correlation from exact decimal component sums.
# --------------------------------------------------------------------------


@query(
    "w10_rolling_corr",
    survey="beyond:rolling-corr,A5,W2",
    priority=60,
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS tot
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type, a.h, a.tot AS x, b.tot AS y
        FROM hourly a JOIN hourly b
          ON a.h = b.h AND b.event_type = 'view'
        WHERE a.event_type <> 'view'
    ),
    comps AS (
        SELECT event_type, h,
            COUNT(*) OVER w AS n,
            CAST(SUM(CAST(x AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sx,
            CAST(SUM(CAST(y AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sy,
            CAST(SUM(CAST(x*y AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sxy,
            CAST(SUM(CAST(x*x AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sxx,
            CAST(SUM(CAST(y*y AS DECIMAL(27,6))) OVER w AS DOUBLE) AS syy
        FROM pairs
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, h, n AS n_obs,
           ROUND((n*sxy - sx*sy)
                 / (SQRT(n*sxx - sx*sx) * SQRT(n*syy - sy*sy)), 6)
               AS rolling_corr
    FROM comps
    WHERE n >= 8 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
    """,
)
def w10_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hour rolling correlation of each event type's hourly volume
    against the 'view' series — the rolling upgrade of
    a5_correlation_matrix (whole-series corr). Cross-engine corr() is
    NOT hash-reproducible (per-engine summation order), so the frame
    statistics are accumulated as EXACT decimal sums (n, Σx, Σy, Σxy,
    Σx², Σy²) and the correlation is assembled from those components
    in deterministic double arithmetic — bit-identical in both
    engines, including the variance-positivity guards. One shuffle to
    hourly grain, one window keyed by series; frame state is O(24)."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(27,6)"
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.sum(F.col("value").cast(dec)).cast("double").alias("tot"))
    base = hourly.filter(F.col("event_type") == "view").select(
        "h", F.col("tot").alias("y")
    )
    pairs = (
        hourly.filter(F.col("event_type") != "view")
        .join(base, "h")
        .select("event_type", "h", F.col("tot").alias("x"), "y")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("h").rowsBetween(-23, 0)
    comps = pairs.select(
        "event_type",
        "h",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.col("x").cast(dec)).over(w).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).over(w).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).over(w).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).over(w).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).over(w).cast("double").alias("syy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return comps.filter(
        (F.col("n") >= 8) & (varx > 0) & (vary > 0)
    ).select(
        "event_type",
        "h",
        F.col("n").alias("n_obs"),
        F.round(cov / (F.sqrt(varx) * F.sqrt(vary)), 6).alias(
            "rolling_corr"
        ),
    )


# --------------------------------------------------------------------------
# W11 (beyond) — rolling exact median: per-user trailing-20-event
# median of value (ROWS frame, current row included). The robust
# twin of the rolling mean the anomaly detector uses — medians resist
# the value spikes that drag a mean-based baseline. Exact interpolated
# percentile as a WINDOW aggregate (both engines define it by linear
# interpolation); per-user frames keep the state bounded (≤ 20 rows)
# and the shuffle keyed. Rounded 6 dp; raw values pass through
# unrounded.
# --------------------------------------------------------------------------
@query(
    "w11_rolling_median",
    survey="beyond:rolling-median,W2",
    priority=60,
    oracle="""
    SELECT event_id, user_id, value,
           ROUND(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
           ), 6) AS med20
    FROM events
    """,
)
def w11_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.round(
            F.expr("percentile(value, 0.5)").over(w), 6
        ).alias("med20"),
    )


# --------------------------------------------------------------------------
# M4 downsampling: the standard error-free line-chart reduction —
# per (user, time-bucket), keep min / max / first / last of the
# value series. One keyed aggregate with map-side combine (min_by /
# max_by on the (ts, event_id) order for the endpoints), so a
# billion-point series downsamples in a single shuffle to 4 values
# per pixel-bucket; unlike averaging, the rendered line is pixel-
# identical to the full series (Jugel et al., M4). All outputs are
# raw passthrough values or integer counts — bit-deterministic.
# --------------------------------------------------------------------------
@query(
    "ts_downsample_m4",
    survey="beyond:m4-downsample",
    priority=60,
    oracle="""
    SELECT user_id,
           date_trunc('day', ts) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS v_min,
           MAX(value) AS v_max,
           MIN_BY(value, CAST(epoch_us(ts) AS DECIMAL(38,0))
                         * 1000000000 + event_id) AS v_first,
           MAX_BY(value, CAST(epoch_us(ts) AS DECIMAL(38,0))
                         * 1000000000 + event_id) AS v_last
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
    """,
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # composite (ts, event_id) order as one DECIMAL(38,0) scalar —
    # DuckDB's min_by/max_by bind scalar keys only, and decimal128
    # arithmetic is exact in both engines (event ids ≪ 10^9)
    order = F.unix_micros("ts").cast("decimal(38,0)") * 1000000000 + F.col(
        "event_id"
    )
    return ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.min_by("value", order).alias("v_first"),
        F.max_by("value", order).alias("v_last"),
    )


# --------------------------------------------------------------------------
# Population-stability-index drift monitor: deciles fitted on the
# BASELINE half of the event stream (exact interpolated quantiles),
# the CURRENT half bucketed against those frozen edges, PSI =
# Σ (p_cur − p_base)·ln(p_cur / p_base). The standard ML-monitoring
# number for "did the feature distribution move". Scale shape: edge
# fitting is one aggregate (the 9 interior deciles broadcast as a
# single array), bucketing is a JVM expression scan, and both count
# passes are keyed aggregates. Determinism: proportions are exact
# integer ratios; each PSI term rounds to 8 dp, the term SUM
# quantizes to decimal (order-free), and the final PSI rounds to 6.
# Laplace-style +1 smoothing keeps empty buckets out of ln().
# --------------------------------------------------------------------------
@query(
    "dq_psi_drift",
    survey="beyond:psi-drift",
    priority=60,
    oracle="""
    WITH bounds AS (
        SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS tmid_us
        FROM events
    ),
    tagged AS (
        SELECT e.value,
               CASE WHEN epoch_us(e.ts) < b.tmid_us
                    THEN 'base' ELSE 'cur' END AS era
        FROM events e CROSS JOIN bounds b
    ),
    edges AS (
        SELECT quantile_cont(value,
                   [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q
        FROM tagged WHERE era = 'base'
    ),
    bucketed AS (
        SELECT era,
               1 + len(list_filter(e.q, x -> t.value >= x)) AS bkt
        FROM tagged t CROSS JOIN edges e
    ),
    cnt AS (
        SELECT bkt,
               1 + COALESCE(SUM(CASE WHEN era = 'base' THEN 1 END), 0)
                   AS n_base,
               1 + COALESCE(SUM(CASE WHEN era = 'cur' THEN 1 END), 0)
                   AS n_cur
        FROM bucketed GROUP BY bkt
    ),
    tot AS (
        SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM cnt
    ),
    terms AS (
        SELECT ROUND(
                   (n_cur * 1.0 / tc - n_base * 1.0 / tb)
                   * LN((n_cur * 1.0 / tc) / (n_base * 1.0 / tb)), 8
               ) AS term
        FROM cnt CROSS JOIN tot
    )
    SELECT CAST(ROUND(SUM(CAST(term AS DECIMAL(27,10))), 6) AS DOUBLE)
               AS psi,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM terms
    """,
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.expr(
            "(unix_micros(min(ts)) + unix_micros(max(ts))) div 2"
        ).alias("tmid_us")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "value",
        F.when(F.unix_micros("ts") < F.col("tmid_us"), "base")
        .otherwise("cur")
        .alias("era"),
    )
    edges = (
        tagged.filter(F.col("era") == "base")
        .agg(
            F.expr(
                "percentile(value, array(0.1,0.2,0.3,0.4,0.5,"
                "0.6,0.7,0.8,0.9))"
            ).alias("q")
        )
    )
    bucketed = tagged.crossJoin(F.broadcast(edges)).select(
        "era",
        (
            1
            + F.size(
                F.filter(F.col("q"), lambda x: F.col("value") >= x)
            )
        ).alias("bkt"),
    )
    cnt = bucketed.groupBy("bkt").agg(
        (
            1
            + F.coalesce(
                F.sum(F.when(F.col("era") == "base", 1)), F.lit(0)
            )
        ).alias("n_base"),
        (
            1
            + F.coalesce(
                F.sum(F.when(F.col("era") == "cur", 1)), F.lit(0)
            )
        ).alias("n_cur"),
    )
    tot = cnt.agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
    )
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        F.round(
            (F.col("n_cur") / F.col("tc") - F.col("n_base") / F.col("tb"))
            * F.log(
                (F.col("n_cur") / F.col("tc"))
                / (F.col("n_base") / F.col("tb"))
            ),
            8,
        ).alias("term")
    )
    return terms.agg(
        F.round(F.sum(F.col("term").cast("decimal(27,10)")), 6)
        .cast("double")
        .alias("psi"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


# --------------------------------------------------------------------------
# Poisson-bootstrap confidence interval for the mean of events.value —
# THE bootstrap that works at 100 TB: instead of drawing B resamples
# (B full shuffles), every row gets an independent Poisson(1) weight
# per replicate, so all B replicate means accumulate in ONE pass with
# map-side combine; replicate count explodes rows ×B but never
# re-shuffles the data. Weights are hash-seeded (md5 16-bit uniform →
# Poisson inverse CDF via fixed thresholds), making the whole
# procedure bit-reproducible and cross-engine checkable — a real
# deployment swaps the hash for an RNG and keeps the plan. Replicate
# means quantize their weighted sums to decimal; the CI reads exact
# interpolated percentiles off the B=50 replicate means.
# --------------------------------------------------------------------------
_BOOT_B = 50
# P(Poisson(1) <= k) for k = 0..7; u above the last threshold → 8
_POIS_CDF = [
    0.36787944, 0.73575888, 0.91969860, 0.98101184,
    0.99634015, 0.99940582, 0.99991676, 0.99998975,
]


def _boot_u_sql() -> str:
    # hash-budget trick: one md5 digest carries EIGHT independent
    # 16-bit uniforms (32 hex chars / 4), so replicate b reads slice
    # b%8 of digest b//8 — 7 hashes per row for B=50 instead of 50.
    hx = "0123456789abcdef"
    h = (
        "md5('boot|' || CAST(event_id AS VARCHAR) || '|'"
        " || CAST(b // 8 AS VARCHAR))"
    )
    digits = " + ".join(
        f"(strpos('{hx}', substr({h}, (b % 8) * 4 + {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({digits}) + 0.5) / 65536.0"


def _pois_case_sql(u: str) -> str:
    clauses = " ".join(
        f"WHEN {u} < {p} THEN {k}" for k, p in enumerate(_POIS_CDF)
    )
    return f"CASE {clauses} ELSE 8 END"


@query(
    "stats_bootstrap_ci",
    survey="beyond:poisson-bootstrap",
    priority=60,
    oracle=f"""
    WITH reps AS (
        SELECT e.event_id, e.value, b.b
        FROM events e
        CROSS JOIN (SELECT UNNEST(generate_series(0, {_BOOT_B - 1})) AS b) b
    ),
    weighted AS (
        SELECT b, value, {_pois_case_sql(_boot_u_sql())} AS w
        FROM reps
    ),
    rep_means AS (
        SELECT b,
               CAST(SUM(CAST(ROUND(w * value, 6) AS DECIMAL(27,6)))
                    AS DOUBLE)
               / CAST(SUM(w) AS DOUBLE) AS m
        FROM weighted GROUP BY b
        HAVING SUM(w) > 0
    ),
    point AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean
        FROM events
    )
    SELECT point.n, point.mean,
           ROUND(quantile_cont(rep_means.m, 0.025), 4) AS lo95,
           ROUND(quantile_cont(rep_means.m, 0.975), 4) AS hi95,
           CAST(COUNT(rep_means.m) AS BIGINT) AS n_replicates
    FROM rep_means CROSS JOIN point
    GROUP BY point.n, point.mean
    """,
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import spread

    # spread BEFORE the ×B replicate explode — the single-file local
    # scan would otherwise hash 5M weight rows on one core
    ev = spread(load_table(spark, sf_dir, "events"), spark)
    # The replicate hash depends only on ⌊b/8⌋, so hashing after a ×B
    # explode computed each md5 EIGHT times (guide §1.2: per-task work
    # after the shape is right). Explode by hash GROUP instead — one
    # md5 per (event, group) — then fan each group out to its 8
    # replicate ids; h, slice4, u and w are byte-identical.
    groups = _BOOT_B // 8 + (1 if _BOOT_B % 8 else 0)
    h_of_g = F.md5(
        F.concat(
            F.lit("boot|"),
            F.col("event_id").cast("string"),
            F.lit("|"),
            F.col("g").cast("long").cast("string"),
        )
    )
    reps = (
        ev.select("event_id", "value")
        .crossJoin(
            F.broadcast(
                spark.range(groups).select(
                    F.col("id").cast("int").alias("g")
                )
            )
        )
        .select("value", "g", h_of_g.alias("h"))
        .select(
            "value",
            "h",
            F.explode(
                F.sequence(
                    F.col("g") * 8,
                    F.least(F.col("g") * 8 + 7, F.lit(_BOOT_B - 1)),
                )
            ).alias("b"),
        )
    )
    slice4 = F.substring(F.col("h"), (F.col("b") % 8) * 4 + 1, 4)
    u = (F.conv(slice4, 16, 10).cast("double") + 0.5) / 65536.0
    w = F.lit(8)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < _POIS_CDF[k], k).otherwise(w)
    weighted = reps.select("b", "value", w.alias("w"))
    rep_means = (
        weighted.groupBy("b")
        .agg(
            F.sum(
                F.round(F.col("w") * F.col("value"), 6).cast(
                    "decimal(27,6)"
                )
            )
            .cast("double")
            .alias("ws"),
            F.sum("w").cast("double").alias("wn"),
        )
        .filter(F.col("wn") > 0)
        .select("b", (F.col("ws") / F.col("wn")).alias("m"))
    )
    point = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean"),
    )
    return (
        rep_means.crossJoin(F.broadcast(point))
        .groupBy("n", "mean")
        .agg(
            F.round(F.expr("percentile(m, 0.025)"), 4).alias("lo95"),
            F.round(F.expr("percentile(m, 0.975)"), 4).alias("hi95"),
            F.count("m").alias("n_replicates"),
        )
        .select("n", "mean", "lo95", "hi95", "n_replicates")
    )


# --------------------------------------------------------------------------
# Welch two-sample t-test: purchase vs click values — the A/B
# comparison an experimentation platform runs per metric. One grouped
# pass computes n, Σx, Σx² per arm (decimal-quantized — order-free),
# the t statistic and Welch–Satterthwaite degrees of freedom are
# scalar arithmetic on those three numbers per arm. At 100 TB this is
# a single map-side-combinable aggregate; nothing else moves.
# Variance via (Σx² − (Σx)²/n)/(n−1) on decimal-exact sums;
# cancellation is benign at these magnitudes and identical in both
# engines since the inputs are the identical decimals.
# --------------------------------------------------------------------------
@query(
    "stats_ab_welch",
    survey="beyond:ab-welch",
    priority=60,
    oracle="""
    WITH arms AS (
        SELECT event_type AS arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(27,6)))
                    AS DOUBLE) AS s2
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY event_type
    ),
    stats AS (
        SELECT arm, n, s1 / n AS m,
               (s2 - s1 * s1 / n) / (n - 1) AS v
        FROM arms
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN arm = 'purchase' THEN n END) AS n1,
            MAX(CASE WHEN arm = 'purchase' THEN m END) AS m1,
            MAX(CASE WHEN arm = 'purchase' THEN v END) AS v1,
            MAX(CASE WHEN arm = 'click' THEN n END) AS n2,
            MAX(CASE WHEN arm = 'click' THEN m END) AS m2,
            MAX(CASE WHEN arm = 'click' THEN v END) AS v2
        FROM stats
    )
    SELECT n1, n2,
           ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(
               POWER(v1 / n1 + v2 / n2, 2)
               / (POWER(v1 / n1, 2) / (n1 - 1)
                  + POWER(v2 / n2, 2) / (n2 - 1)),
               2) AS welch_df
    FROM wide
    """,
)
def stats_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    arms = ev.groupBy(F.col("event_type").alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(27,6)"))
        .cast("double")
        .alias("s1"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 6).cast(
                "decimal(27,6)"
            )
        )
        .cast("double")
        .alias("s2"),
    )
    stats = arms.select(
        "arm",
        "n",
        (F.col("s1") / F.col("n")).alias("m"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v"),
    )
    pick = lambda a, c: F.max(  # noqa: E731
        F.when(F.col("arm") == a, F.col(c))
    )
    wide = stats.agg(
        pick("purchase", "n").alias("n1"),
        pick("purchase", "m").alias("m1"),
        pick("purchase", "v").alias("v1"),
        pick("click", "n").alias("n2"),
        pick("click", "m").alias("m2"),
        pick("click", "v").alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return wide.select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias(
            "t_stat"
        ),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            2,
        ).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# W12 — row-PATTERN detection (SQL:2016 MATCH_RECOGNIZE's most common
# pattern, A B+ with B := value > PREV(value), i.e. maximal strictly-
# rising runs) expressed as the gaps-and-islands window composition
# Spark actually optimizes: one LAG to flag run breaks, one running
# SUM over the breaks to assign an island id, one grouped aggregate
# per island, one per-key rollup. Neither Spark nor DuckDB ships
# MATCH_RECOGNIZE; this is the scale-correct translation — every step
# is a keyed window/aggregate (state bounded per partition, no
# self-join, no UDF), so at 100 TB it is exactly two exchanges on
# user_id. Oracled with the same composition in DuckDB; counts and
# lengths are integers, hash-exact by construction.
# --------------------------------------------------------------------------
@query(
    "w12_pattern_rising_runs",
    survey="beyond:row-pattern-match,W2,F7",
    priority=60,
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN value > lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) THEN 0 ELSE 1 END AS brk
        FROM events
    ),
    isl AS (
        SELECT user_id,
               SUM(brk) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS island
        FROM seq
    ),
    runs AS (
        SELECT user_id, island, COUNT(*) AS run_len
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE run_len >= 3) AS BIGINT)
               AS n_rising_runs,
           CAST(MAX(run_len) AS BIGINT) AS longest_run
    FROM runs
    GROUP BY user_id
    HAVING COUNT(*) FILTER (WHERE run_len >= 3) > 0
    """,
)
def w12_pattern_rising_runs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per user: how many maximal runs of >= 3 strictly-rising event
    values occur in their (ts, event_id)-ordered stream, and the
    longest run seen. Users with no qualifying run are filtered (the
    MATCH_RECOGNIZE ONE ROW PER MATCH shape aggregated per key)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn(
        "brk",
        F.when(F.col("value") > F.lag("value").over(w), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    isl = seq.withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("run_len") >= 3, 1).otherwise(0)
            ).alias("n_rising_runs"),
            F.max("run_len").cast("long").alias("longest_run"),
        )
        .filter(F.col("n_rising_runs") > 0)
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift test per event_type: the
# distribution-free companion to dq_psi_drift (PSI needs binning; KS
# compares the full empirical CDFs). Eras split at the global time
# midpoint like PSI. D = sup_x |F_base(x) − F_cur(x)| — computed
# exactly in INTEGER arithmetic: with cumulative counts cb, cc at each
# distinct value, D = max|cb·n_cur − cc·n_base| / (n_base·n_cur), so
# both engines agree bit-for-bit on ks_num, and D ships integer-scaled
# (ks_d_e6 = floor(1e6·D), exact BIGINT floor-division — no float path
# at all). Scale shape: one (type, value) pre-agg
# collapses the stream to distinct values BEFORE the per-type cumsum
# window, so window state is bounded by value cardinality, not row
# count; era totals broadcast. For unbounded-cardinality continuous
# values at 100 TB, quantize values first (the PSI edges) or replace
# the per-type window with a range-partitioned prefix-sum — the
# pre-agg keyed by (type, value) is the only corpus-scale shuffle.
# Products stay in BIGINT (|cum| ≤ n, so |cb·n_cur| ≤ n_base·n_cur —
# fine through ~3·10⁹ rows per era-pair; cast to DECIMAL(38,0) past
# that).
# --------------------------------------------------------------------------
@query(
    "stats_ks_drift",
    survey="beyond:ks-drift",
    priority=60,
    oracle="""
    WITH bounds AS (
        SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS tmid_us
        FROM events
    ),
    tagged AS (
        SELECT e.event_type, e.value,
               CASE WHEN epoch_us(e.ts) < b.tmid_us
                    THEN 'base' ELSE 'cur' END AS era
        FROM events e CROSS JOIN bounds b
        WHERE e.value IS NOT NULL
    ),
    tot AS (
        SELECT event_type,
               SUM(CASE WHEN era = 'base' THEN 1 ELSE 0 END) AS n_base,
               SUM(CASE WHEN era = 'cur' THEN 1 ELSE 0 END) AS n_cur
        FROM tagged GROUP BY event_type
        HAVING n_base > 0 AND n_cur > 0
    ),
    pv AS (
        SELECT event_type, value,
               SUM(CASE WHEN era = 'base' THEN 1 ELSE 0 END) AS b,
               SUM(CASE WHEN era = 'cur' THEN 1 ELSE 0 END) AS c
        FROM tagged GROUP BY event_type, value
    ),
    cum AS (
        SELECT event_type,
               SUM(b) OVER (PARTITION BY event_type ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cb,
               SUM(c) OVER (PARTITION BY event_type ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cc
        FROM pv
    ),
    num AS (
        SELECT c.event_type,
               MAX(ABS(c.cb * t.n_cur - c.cc * t.n_base)) AS ks_num
        FROM cum c JOIN tot t USING (event_type)
        GROUP BY c.event_type
    )
    SELECT t.event_type,
           CAST(t.n_base AS BIGINT) AS n_base,
           CAST(t.n_cur AS BIGINT) AS n_cur,
           CAST(n.ks_num AS BIGINT) AS ks_num,
           CAST((n.ks_num * 1000000) // (t.n_base * t.n_cur)
                AS BIGINT) AS ks_d_e6
    FROM num n JOIN tot t USING (event_type)
    """,
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    bounds = load_table(spark, sf_dir, "events").agg(
        F.expr(
            "(unix_micros(min(ts)) + unix_micros(max(ts))) div 2"
        ).alias("tmid_us")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "value",
        F.when(F.unix_micros("ts") < F.col("tmid_us"), "base")
        .otherwise("cur")
        .alias("era"),
    )
    tot = (
        tagged.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("era") == "base", 1).otherwise(0)).alias(
                "n_base"
            ),
            F.sum(F.when(F.col("era") == "cur", 1).otherwise(0)).alias(
                "n_cur"
            ),
        )
        .filter((F.col("n_base") > 0) & (F.col("n_cur") > 0))
    )
    pv = tagged.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("era") == "base", 1).otherwise(0)).alias("b"),
        F.sum(F.when(F.col("era") == "cur", 1).otherwise(0)).alias("c"),
    )
    w = W.partitionBy("event_type").orderBy("value").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = pv.select(
        "event_type",
        F.sum("b").over(w).alias("cb"),
        F.sum("c").over(w).alias("cc"),
    )
    num = (
        cum.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.max(
                F.abs(
                    F.col("cb") * F.col("n_cur")
                    - F.col("cc") * F.col("n_base")
                )
            ).alias("ks_num")
        )
    )
    return num.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("n_base").cast("bigint").alias("n_base"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.col("ks_num").cast("bigint").alias("ks_num"),
        # integer-scaled emission (micro-D units): floor division of
        # exact BIGINTs — bit-identical cross-engine, no float path
        F.expr("ks_num * 1000000 div (n_base * n_cur)")
        .cast("bigint")
        .alias("ks_d_e6"),
    )
