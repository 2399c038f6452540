from .asof import asof_join, latest_per_key
from .graph import connected_components
from .rangejoin import banded_range_join
from .forecast import (
    classify_trend,
    forecast_horizon,
    linear_fit,
    linear_fit_grouped,
)
from .mutation import ParquetTable
from .returns import daily_close_panel, returns_panel
from .skew import salted_count_sum, salted_join
from .statistics import beta_vs_market, coefficient_of_variation, correlation_matrix
from .timeseries import gap_fill
from .trading import apply_trades, cash_deltas, ledger_entries

__all__ = [
    "ParquetTable",
    "apply_trades",
    "asof_join",
    "banded_range_join",
    "connected_components",
    "beta_vs_market",
    "cash_deltas",
    "classify_trend",
    "coefficient_of_variation",
    "correlation_matrix",
    "daily_close_panel",
    "forecast_horizon",
    "gap_fill",
    "latest_per_key",
    "ledger_entries",
    "linear_fit",
    "linear_fit_grouped",
    "returns_panel",
    "salted_count_sum",
    "salted_join",
]
