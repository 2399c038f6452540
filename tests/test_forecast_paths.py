"""The two OLS fit paths — JVM aggregates (linear_fit) and grouped-map
applyInPandas (linear_fit_grouped) — must agree numerically."""

from __future__ import annotations

from relational_query_engine_sql_spark.operators.forecast import (
    linear_fit,
    linear_fit_grouped,
)
from relational_query_engine_sql_spark.operators.returns import (
    daily_close_panel,
)
from relational_query_engine_sql_spark.sources import load_table


def test_pandas_fit_matches_aggregate_fit(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    panel = daily_close_panel(
        ev, key="event_type", ts_col="ts", value_col="value"
    )
    agg = {
        r["event_type"]: r
        for r in linear_fit(
            panel, key="event_type", time_col="d", value_col="close"
        ).collect()
    }
    pnd = {
        r["event_type"]: r
        for r in linear_fit_grouped(
            panel, key="event_type", time_col="d", value_col="close"
        ).collect()
    }
    assert set(agg) == set(pnd) and len(agg) > 0
    for k in agg:
        assert agg[k]["n_obs"] == pnd[k]["n_obs"]
        assert agg[k]["last_t"] == pnd[k]["last_t"]
        assert abs(agg[k]["slope"] - pnd[k]["slope"]) < 1e-9
        assert abs(agg[k]["intercept"] - pnd[k]["intercept"]) < 1e-9
