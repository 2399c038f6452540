"""Linear-regression price forecast (SURVEY.md §2.10 U1/U4, §2.8 E10).

The reference pulls the last 50 closes to the app, fits
``ml-regression-simple-linear`` in JS, loops 30 future days, and
classifies the trend by slope sign
(``/root/reference/src/routes/portfolio.js:491-558``,
``src/routes/chart.js:67-158``).

Set-based rewrite — closed-form OLS entirely in JVM aggregates:

    slope     = covar_pop(x, y) / var_pop(x)
    intercept = avg(y) - slope * avg(x)

with x = 0-based row index per key (window ``row_number``), y = close.
No UDF, no driver loop; the 30 forecast rows come from
``sequence() + explode``. Oracle-checkable against DuckDB's
``regr_slope``/``regr_intercept``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# Reference guards: fit on the last 50 points, require >= 5
# (portfolio.js:496,504,509), forecast 30 days ahead (portfolio.js:496).
DEFAULT_FIT_WINDOW = 50
DEFAULT_MIN_ROWS = 5
DEFAULT_HORIZON = 30


def linear_fit(
    panel: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    fit_window: int = DEFAULT_FIT_WINDOW,
    min_rows: int = DEFAULT_MIN_ROWS,
) -> DataFrame:
    """Per-key OLS over the last ``fit_window`` points.

    Output: (key, slope, intercept, n_obs, last_t, last_x) where
    last_x = n_obs - 1 (the index of the newest point).
    """
    w_desc = W.partitionBy(key).orderBy(F.col(time_col).desc())
    recent = (
        panel.withColumn("__rdesc", F.row_number().over(w_desc))
        .filter(F.col("__rdesc") <= fit_window)
        .drop("__rdesc")
    )
    w_asc = W.partitionBy(key).orderBy(F.col(time_col).asc())
    indexed = recent.withColumn("x", (F.row_number().over(w_asc) - 1).cast("double"))
    y = F.col(value_col).cast("double")
    fit = (
        indexed.groupBy(key)
        .agg(
            (F.covar_pop("x", y) / F.var_pop("x")).alias("slope"),
            F.avg(y).alias("_avg_y"),
            F.avg("x").alias("_avg_x"),
            F.count(F.lit(1)).alias("n_obs"),
            F.max(time_col).alias("last_t"),
        )
        .filter(F.col("n_obs") >= min_rows)
    )
    return fit.select(
        key,
        "slope",
        (F.col("_avg_y") - F.col("slope") * F.col("_avg_x")).alias("intercept"),
        "n_obs",
        "last_t",
        (F.col("n_obs") - 1).cast("double").alias("last_x"),
    )


def classify_trend(slope_col: str = "slope") -> F.Column:
    """Trend label by slope sign (portfolio.js:544-556)."""
    return (
        F.when(F.col(slope_col) > 0, F.lit("upward"))
        .when(F.col(slope_col) < 0, F.lit("downward"))
        .otherwise(F.lit("stable"))
    )


def linear_fit_grouped(
    panel: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    fit_window: int = DEFAULT_FIT_WINDOW,
    min_rows: int = DEFAULT_MIN_ROWS,
) -> DataFrame:
    """``applyInPandas`` variant of :func:`linear_fit` — the grouped-map
    Pandas-UDF path the reference's per-symbol JS fit maps to at scale
    (one Arrow batch per key, fits run in parallel across executors).

    Same closed-form formulas as the aggregate version so the two paths
    are numerically comparable (pinned to ~1e-9 in tests); prefer
    :func:`linear_fit` when the model IS expressible as aggregates —
    this path exists for models that aren't.
    """
    import pandas as pd

    def fit_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col).tail(fit_window)
        n = len(pdf)
        if n < min_rows:
            return pd.DataFrame(
                columns=[key, "slope", "intercept", "n_obs", "last_t", "last_x"]
            )
        x = pd.Series(range(n), dtype="float64")
        y = pdf[value_col].astype("float64").reset_index(drop=True)
        covar = ((x - x.mean()) * (y - y.mean())).mean()
        var = ((x - x.mean()) ** 2).mean()
        slope = covar / var
        return pd.DataFrame(
            [
                {
                    key: pdf[key].iloc[0],
                    "slope": slope,
                    "intercept": y.mean() - slope * x.mean(),
                    "n_obs": n,
                    "last_t": pdf[time_col].iloc[-1],
                    "last_x": float(n - 1),
                }
            ]
        )

    out_schema = (
        f"{key} string, slope double, intercept double, n_obs long, "
        "last_t date, last_x double"
    )
    return panel.groupBy(key).applyInPandas(fit_one, schema=out_schema)


def forecast_horizon(
    fit: DataFrame,
    key: str,
    horizon: int = DEFAULT_HORIZON,
) -> DataFrame:
    """Extrapolate ``horizon`` daily steps past last_t:
    predicted_i = intercept + slope * (last_x + i), i = 1..horizon.
    Date stepping via sequence+explode (E10) — no driver loop.
    Output: (key, step, forecast_day, predicted)."""
    steps = F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("step")
    return fit.select(key, "slope", "intercept", "last_t", "last_x", steps).select(
        key,
        "step",
        F.date_add(F.col("last_t"), F.col("step")).alias("forecast_day"),
        (F.col("intercept") + F.col("slope") * (F.col("last_x") + F.col("step"))).alias(
            "predicted"
        ),
    )
