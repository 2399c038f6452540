from .asof import asof_join, latest_per_key
from .returns import daily_close_panel, returns_panel
from .statistics import beta_vs_market, coefficient_of_variation, correlation_matrix

__all__ = [
    "asof_join",
    "latest_per_key",
    "daily_close_panel",
    "returns_panel",
    "beta_vs_market",
    "coefficient_of_variation",
    "correlation_matrix",
]
