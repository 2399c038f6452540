"""Regression forecast queries (SURVEY.md §2.10 U1/U4, §2.8 E10) —
GET /api/portfolio/predict/:symbol re-expressed as one DataFrame plan
(reference: src/routes/portfolio.js:491-558)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.forecast import classify_trend, forecast_horizon, linear_fit
from ..operators.returns import daily_close_panel
from ..sources import load_table
from .registry import query

# Oracle CTEs: daily close panel on events → last-50 window → 0-based
# index → regr_slope/regr_intercept (DuckDB's closed-form OLS).
_FIT_CTE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS close
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    ),
    recent AS (
        SELECT event_type, d, close,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC) AS rdesc
        FROM daily
    ),
    indexed AS (
        SELECT event_type, d, close,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d ASC) - 1
                    AS DOUBLE) AS x
        FROM recent
        WHERE rdesc <= 50
    ),
    fit AS (
        SELECT event_type,
               REGR_SLOPE(close, x)     AS slope,
               REGR_INTERCEPT(close, x) AS intercept,
               COUNT(*)                 AS n_obs,
               MAX(d)                   AS last_t
        FROM indexed
        GROUP BY event_type
        HAVING COUNT(*) >= 5
    )
"""


def _fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    panel = daily_close_panel(ev, key="event_type", ts_col="ts", value_col="value")
    return linear_fit(panel, key="event_type", time_col="d", value_col="close")


# --------------------------------------------------------------------------
# U1 + U4 — per-key OLS fit + trend classification by slope sign.
# --------------------------------------------------------------------------
@query(
    "u1_linreg_fit",
    survey="U1,U4",
    oracle=_FIT_CTE
    + """
    SELECT event_type,
           ROUND(slope, 6)     AS slope,
           ROUND(intercept, 6) AS intercept,
           n_obs,
           CASE WHEN slope > 0 THEN 'upward'
                WHEN slope < 0 THEN 'downward'
                ELSE 'stable' END AS trend
    FROM fit
    """,
)
def u1_linreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    fit = _fit(spark, sf_dir)
    return fit.select(
        "event_type",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        "n_obs",
        classify_trend().alias("trend"),
    )


# Grouped-map Pandas-UDF variant of the fit (SURVEY §2.10 U1
# "alternative: applyInPandas per symbol"). Shares u1_linreg_fit's
# closed-form oracle: summation-order drift between numpy and SQL
# aggregates sits at ~1e-12, absorbed by the shared ROUND(…, 6) —
# verified string-exact vs DuckDB at sf0.01 and sf0.1. The two Spark
# paths are additionally pinned to each other in
# tests/test_forecast_paths.py.
@query(
    "u1_linreg_fit_pandas",
    survey="U1:applyInPandas",
    oracle=_FIT_CTE
    + """
    SELECT event_type,
           ROUND(slope, 6)     AS slope,
           ROUND(intercept, 6) AS intercept,
           n_obs,
           CASE WHEN slope > 0 THEN 'upward'
                WHEN slope < 0 THEN 'downward'
                ELSE 'stable' END AS trend
    FROM fit
    """,
)
def u1_linreg_fit_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.forecast import linear_fit_grouped

    ev = load_table(spark, sf_dir, "events")
    panel = daily_close_panel(ev, key="event_type", ts_col="ts", value_col="value")
    fit = linear_fit_grouped(panel, key="event_type", time_col="d", value_col="close")
    return fit.select(
        "event_type",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        "n_obs",
        classify_trend().alias("trend"),
    )


# --------------------------------------------------------------------------
# E10 — 30-day forecast rows via sequence()+explode date stepping
# (the reference's JS day-stepping loop, portfolio.js:526-542).
# --------------------------------------------------------------------------
@query(
    "e10_forecast_horizon",
    survey="E10,U1",
    oracle=_FIT_CTE
    + """
    SELECT f.event_type,
           s.step,
           CAST(f.last_t + s.step * INTERVAL 1 DAY AS DATE) AS forecast_day,
           ROUND(f.intercept + f.slope * (f.n_obs - 1 + s.step), 6) AS predicted
    FROM fit f
    CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 30)) AS step) s
    """,
)
def e10_forecast_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    fit = _fit(spark, sf_dir)
    fc = forecast_horizon(fit, key="event_type")
    return fc.select(
        "event_type",
        "step",
        "forecast_day",
        F.round("predicted", 6).alias("predicted"),
    )


# --------------------------------------------------------------------------
# Backtest: fit on the first 80% of each series, score the held-out
# tail — the evaluation loop a forecasting deployment actually runs
# (the reference fits and forecasts but never scores itself;
# src/routes/portfolio.js:491-558 returns predictions uncheckd).
# Metrics aggregate decimal-quantized per-point terms so the per-type
# MAPE/RMSE are summation-order-independent.
# --------------------------------------------------------------------------


@query(
    "forecast_backtest_metrics",
    survey="beyond:forecast-backtest,U1,E6",
    priority=60,
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS close
        FROM events GROUP BY 1, 2
    ),
    indexed AS (
        SELECT event_type, d, close,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY d ASC) - 1
                   AS DOUBLE) AS x,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    fit AS (
        SELECT event_type,
               REGR_SLOPE(close, x) AS slope,
               REGR_INTERCEPT(close, x) AS intercept
        FROM indexed
        WHERE x < CAST(FLOOR(n * 0.8) AS DOUBLE)
        GROUP BY event_type
    ),
    scored AS (
        SELECT i.event_type,
               CAST(ABS(i.close - (f.intercept + f.slope * i.x))
                    / ABS(i.close) AS DECIMAL(27,6)) AS ape,
               CAST((i.close - (f.intercept + f.slope * i.x))
                    * (i.close - (f.intercept + f.slope * i.x))
                    AS DECIMAL(27,6)) AS se
        FROM indexed i JOIN fit f USING (event_type)
        WHERE i.x >= CAST(FLOOR(i.n * 0.8) AS DOUBLE)
    )
    SELECT event_type, COUNT(*) AS n_test,
           ROUND(CAST(SUM(ape) AS DOUBLE) / COUNT(*), 4) AS mape,
           ROUND(SQRT(CAST(SUM(se) AS DOUBLE) / COUNT(*)), 4) AS rmse
    FROM scored GROUP BY event_type
    """,
)
def forecast_backtest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series MAPE and RMSE of the OLS forecaster on a held-out
    20% tail. One panel shuffle; the fit is a closed-form aggregate
    over the train prefix (the same covar_pop/var_pop expressions as
    u1_linreg_fit, whose ~1e-12 drift vs REGR_SLOPE is absorbed by
    the shared rounding); scoring is a broadcast join of the 5-row
    fit table back onto the test rows."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    panel = daily_close_panel(
        ev, key="event_type", ts_col="ts", value_col="value"
    )
    w_asc = W.partitionBy("event_type").orderBy(F.col("d").asc())
    w_all = W.partitionBy("event_type")
    indexed = panel.select(
        "event_type",
        "d",
        F.col("close").cast("double").alias("close"),
        (F.row_number().over(w_asc) - 1).cast("double").alias("x"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    cut = F.floor(F.col("n") * 0.8).cast("double")
    train = indexed.filter(F.col("x") < cut)
    y = F.col("close")
    fit = train.groupBy("event_type").agg(
        (F.covar_pop("x", y) / F.var_pop("x")).alias("slope"),
        F.avg(y).alias("_ay"),
        F.avg("x").alias("_ax"),
    )
    fit = fit.select(
        "event_type",
        "slope",
        (F.col("_ay") - F.col("slope") * F.col("_ax")).alias("intercept"),
    )
    test = indexed.filter(F.col("x") >= cut)
    yhat = F.col("intercept") + F.col("slope") * F.col("x")
    scored = test.join(F.broadcast(fit), "event_type").select(
        "event_type",
        (F.abs(F.col("close") - yhat) / F.abs(F.col("close")))
        .cast("decimal(27,6)")
        .alias("ape"),
        ((F.col("close") - yhat) * (F.col("close") - yhat))
        .cast("decimal(27,6)")
        .alias("se"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.round(F.sum("ape").cast("double") / F.count(F.lit(1)), 4).alias(
            "mape"
        ),
        F.round(
            F.sqrt(F.sum("se").cast("double") / F.count(F.lit(1))), 4
        ).alias("rmse"),
    )


# --------------------------------------------------------------------------
# S8 (prediction chart) — the reference's SECOND chart route
# (src/routes/chart.js:67-158): last-50 historical daily closes for
# one series PLUS the 30-day linear-regression forecast, rendered as
# one two-dataset line chart (history solid, prediction dashed) and
# written to a file. The data side — the part the driver hash-checks —
# is the long (day, series, value) union built from the SAME fit CTE
# as u1/e10; the render is sources/chart_sink.render_series_svg.
# --------------------------------------------------------------------------
@query(
    "s8_chart_forecast",
    survey="S8,U1,E10",
    priority=60,
    oracle=_FIT_CTE
    + """
    , hist AS (
        SELECT d AS day, 'hist' AS series, ROUND(close, 6) AS value
        FROM indexed WHERE event_type = 'purchase'
    ),
    pred AS (
        SELECT CAST(f.last_t + s.step * INTERVAL 1 DAY AS DATE) AS day,
               'pred' AS series,
               ROUND(f.intercept + f.slope * (f.n_obs - 1 + s.step), 6)
                   AS value
        FROM fit f
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 30)) AS step) s
        WHERE f.event_type = 'purchase'
    )
    SELECT * FROM hist UNION ALL SELECT * FROM pred
    """,
)
def s8_chart_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    from pyspark.sql import Window as W

    from ..operators.forecast import forecast_horizon
    from ..operators.returns import daily_close_panel
    from ..sources.chart_sink import write_forecast_chart

    ev = load_table(spark, sf_dir, "events")
    panel = daily_close_panel(
        ev, key="event_type", ts_col="ts", value_col="value"
    ).filter(F.col("event_type") == "purchase")
    # the reference's LIMIT 50 (chart.js:74-79): last 50 days
    w_desc = W.partitionBy("event_type").orderBy(F.col("d").desc())
    hist = (
        panel.withColumn("_r", F.row_number().over(w_desc))
        .filter(F.col("_r") <= 50)
        .select(
            F.col("d").alias("day"),
            F.lit("hist").alias("series"),
            F.round(F.col("close"), 6).alias("value"),
        )
    )
    fc = forecast_horizon(_fit(spark, sf_dir), key="event_type")
    pred = fc.filter(F.col("event_type") == "purchase").select(
        F.col("forecast_day").alias("day"),
        F.lit("pred").alias("series"),
        F.round("predicted", 6).alias("value"),
    )
    out = hist.unionByName(pred)
    path = write_forecast_chart(
        out,
        _tf.mkdtemp(prefix="rqe-chart-pred-"),
        "purchase_pred",
        "day",
        "series",
        "value",
        "PURCHASE Historical + Predicted",
    )
    assert path.endswith(".svg")
    return out
