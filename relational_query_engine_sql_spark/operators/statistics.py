"""Statistical aggregates over return panels (SURVEY.md §2.4 A2-A5).

Reference semantics, set-based:

- coefficient of variation: ``STDDEV(r)/AVG(r)`` — the reference calls
  this "COV" (``/root/reference/src/routes/portfolio.js:366-378``).
  Postgres STDDEV is *sample* stddev → ``stddev_samp``.
- beta: ``COVAR_POP(r, mr)/VAR_POP(mr)`` against an equal-weight
  market return (``portfolio.js:386-417``) — *population* moments.
- correlation matrix: triangular self-join on day +
  ``corr``/``covar_pop`` grouped by symbol pair
  (``portfolio.js:450-475``).

The reference computes COV and beta in an N+1 loop over holdings
(2 queries × N holdings). Here each is ONE grouped aggregation over a
shared returns panel — the panel should be ``.persist()``-ed by the
caller when computing several of these (replaces the reference's
``statistics_cache`` within a session; see ``stats_cache.py`` for the
cross-session analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coefficient_of_variation(
    returns: DataFrame, key: str, r_col: str = "r"
) -> DataFrame:
    """Per-key stddev_samp(r)/avg(r). Output: (key, cov)."""
    return returns.groupBy(key).agg(
        (F.stddev_samp(r_col) / F.avg(r_col)).alias("cov")
    )


def market_returns(
    returns: DataFrame, time_col: str = "d", r_col: str = "r"
) -> DataFrame:
    """Equal-weight market proxy: AVG(r) per day
    (portfolio.js:402-407). Output: (time_col, mr)."""
    return returns.groupBy(time_col).agg(F.avg(r_col).alias("mr"))


def beta_vs_market(
    returns: DataFrame, key: str, time_col: str = "d", r_col: str = "r"
) -> DataFrame:
    """Per-key beta = covar_pop(r, mr)/var_pop(mr) vs the equal-weight
    market (portfolio.js:408-417). Sanity: beta of the market vs itself
    is 1 (comment at portfolio.js:385). Output: (key, beta).

    The market table is tiny (one row per day) → broadcast join; the
    aggregation is one shuffle on the key.
    """
    mkt = market_returns(returns, time_col, r_col)
    joined = returns.join(F.broadcast(mkt), on=time_col)
    return joined.groupBy(key).agg(
        (F.covar_pop(r_col, "mr") / F.var_pop("mr")).alias("beta")
    )


def correlation_matrix(
    returns: DataFrame, key: str, time_col: str = "d", r_col: str = "r"
) -> DataFrame:
    """Upper-triangle pairwise correlation + population covariance of
    per-key returns (portfolio.js:450-475).

    Plan shape: self equi-join on the day column (keeps a hash join —
    the ``<=`` triangle condition stays a post-filter so Catalyst never
    falls back to BNLJ), then one grouped aggregation on the pair.
    Output: (s1, s2, correlation, covariance).
    """
    r1 = returns.select(
        F.col(time_col).alias("d1"),
        F.col(key).alias("s1"),
        F.col(r_col).alias("rt1"),
    )
    r2 = returns.select(
        F.col(time_col).alias("d2"),
        F.col(key).alias("s2"),
        F.col(r_col).alias("rt2"),
    )
    return (
        r1.join(r2, F.col("d1") == F.col("d2"))
        .filter(F.col("s1") <= F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.corr("rt1", "rt2").alias("correlation"),
            F.covar_pop("rt1", "rt2").alias("covariance"),
        )
    )
