"""Reference-semantics tests on domain fixtures (SURVEY.md §5.2-5.3):
beta sanity, correlation-matrix invariants, COV scale invariance,
as-of pricing, ACL visibility, friend-edge resolution, forecast guards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from relational_query_engine_sql_spark import fixtures as fx
from relational_query_engine_sql_spark.operators.asof import asof_join, latest_per_key
from relational_query_engine_sql_spark.operators.domain import (
    can_request,
    friends_of,
    portfolio_market_value,
    portfolio_returns,
    portfolio_statistics,
    visible_lists,
    visible_reviews,
)
from relational_query_engine_sql_spark.operators.forecast import linear_fit
from relational_query_engine_sql_spark.operators.returns import returns_panel
from relational_query_engine_sql_spark.operators.statistics import beta_vs_market


@pytest.fixture(scope="module")
def dom(spark):
    return {
        "stocks": fx.make_stocks(spark).persist(),
        "users": fx.make_users(spark),
        "friend": fx.make_friend(spark),
        "request": fx.make_request(spark),
        "stocklist": fx.make_stocklist(spark),
        "shared": fx.make_shared_with(spark),
        "review": fx.make_review(spark),
        "holdings": fx.make_holdings(spark),
    }


WINDOW = ("2017-01-01", "2019-01-01")


def test_correlation_matrix_invariants(spark, dom):
    stats, matrix = portfolio_statistics(
        dom["stocks"], dom["holdings"], 1, *WINDOW
    )
    m = matrix.collect()
    # upper triangle only: s1 <= s2 (portfolio.js:471)
    assert all(r.s1 <= r.s2 for r in m)
    # diagonal correlation = 1
    diag = [r for r in m if r.s1 == r.s2]
    assert len(diag) == 4  # portfolio 1 holds 4 symbols
    for r in diag:
        assert r.correlation == pytest.approx(1.0, abs=1e-9)
    # off-diagonal |corr| <= 1
    for r in m:
        assert abs(r.correlation) <= 1.0 + 1e-12
    # 4 symbols → 4 + C(4,2) = 10 pairs
    assert len(m) == 10


def test_beta_of_market_is_one(spark, dom):
    """Equal-weight-market beta of the market itself = 1
    (comment at portfolio.js:385)."""
    r = portfolio_returns(dom["stocks"], dom["holdings"], 1, *WINDOW)
    mkt = r.groupBy("d").agg(F.avg("r").alias("r")).withColumn(
        "symbol", F.lit("MKT")
    )
    beta = beta_vs_market(mkt, key="symbol").collect()[0]
    assert beta.beta == pytest.approx(1.0, abs=1e-9)


def test_cov_scale_invariance(spark, dom):
    """COV (stddev/avg of returns) is invariant to price scaling."""
    stocks = dom["stocks"]
    panel = stocks.filter(F.col("symbol") == "AAPL").select(
        "symbol",
        F.col("timestamp").alias("d"),
        F.col("close").cast("double").alias("close"),
    )
    scaled = panel.withColumn("close", F.col("close") * 7.5)
    def cov_of(p):
        r = returns_panel(p, key="symbol")
        return (
            r.groupBy("symbol")
            .agg((F.stddev_samp("r") / F.avg("r")).alias("cov"))
            .collect()[0]
            .cov
        )
    assert cov_of(panel) == pytest.approx(cov_of(scaled), rel=1e-9)


def test_returns_drop_first_row_per_symbol(spark, dom):
    r = portfolio_returns(dom["stocks"], dom["holdings"], 1, *WINDOW)
    n_days = (
        dom["stocks"]
        .join(
            dom["holdings"].filter(F.col("portfolioid") == 1).select("symbol"),
            "symbol",
            "left_semi",
        )
        .filter(F.col("timestamp").between(*WINDOW))
        .count()
    )
    # exactly one NULL-lag row dropped per symbol (F7 semantics)
    assert r.count() == n_days - 4


def test_asof_latest_price_and_market_value(spark, dom):
    last = latest_per_key(
        dom["stocks"], keys=["symbol"], order_col="timestamp", as_of="2018-06-01"
    )
    rows = {r.symbol: r for r in last.collect()}
    # every held symbol has exactly one as-of row, dated <= cutoff
    assert all(str(r.timestamp) <= "2018-06-01" for r in rows.values())
    mv = portfolio_market_value(dom["stocks"], dom["holdings"], as_of="2018-06-01")
    vals = {r.portfolioid: float(r.market_value) for r in mv.collect()}
    # hand-check portfolio 3: 75 shares of NVDA at its as-of close
    nvda = float(rows["NVDA"].close)
    assert vals[3] == pytest.approx(75 * nvda, abs=0.01)
    # portfolio 6 has no holdings → absent (error path portfolio.js:353-355)
    assert 6 not in vals


def test_asof_join_generic(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("B", 3, 20.0)],
        "sym string, t int, px double",
    )
    trades = spark.createDataFrame(
        [("A", 0), ("A", 1), ("A", 4), ("A", 9), ("B", 2), ("B", 3)],
        "sym string, t int",
    )
    out = {
        (r.sym, r.t): r.px_r
        for r in asof_join(
            trades, quotes, on=["sym"], left_time="t", right_time="t"
        ).collect()
    }
    assert out[("A", 0)] is None     # nothing at or before t=0
    assert out[("A", 1)] == 10.0     # exact-time match visible
    assert out[("A", 4)] == 10.0
    assert out[("A", 9)] == 11.0
    assert out[("B", 2)] is None
    assert out[("B", 3)] == 20.0


def test_visible_lists_trichotomy(spark, dom):
    vis = visible_lists(dom["stocklist"], dom["shared"], user_id=5)
    ids = {r.listid for r in vis.collect()}
    # public lists: listid % 3 == 0 → {3,6,9,12}; owned by 5: listid 4
    # (ownerid = (i % 20)+1); shared with 5: {1, 4}
    assert {3, 6, 9, 12} <= ids
    assert 4 in ids and 1 in ids
    # a private, unshared, unowned list stays hidden
    assert 2 not in ids


def test_visible_reviews(spark, dom):
    vis = visible_reviews(dom["review"], dom["stocklist"], user_id=2)
    rows = vis.collect()
    lists = {r.listid: r for r in dom["stocklist"].collect()}
    for r in rows:
        lst = lists[r.listid]
        assert lst.is_public or r.userid == 2 or lst.ownerid == 2


def test_friends_of_undirected(spark, dom):
    edges = dom["friend"].collect()
    uid = edges[0].userid1
    expected = {e.userid2 for e in edges if e.userid1 == uid} | {
        e.userid1 for e in edges if e.userid2 == uid
    }
    got = {r.userid for r in friends_of(dom["friend"], dom["users"], uid).collect()}
    assert got == expected


def test_can_request_blocks_friends_and_pending(spark, dom):
    edge = dom["friend"].collect()[0]
    pend = [r for r in dom["request"].collect() if r.status == "PENDING"][0]
    cands = spark.createDataFrame(
        [
            (edge.userid2, edge.userid1),      # already friends (reversed)
            (pend.touserid, pend.fromuserid),  # pending other direction
            (19, 20),
        ],
        "fromuserid int, touserid int",
    )
    ok = {(r.fromuserid, r.touserid) for r in
          can_request(dom["friend"], dom["request"], cands).collect()}
    assert (edge.userid2, edge.userid1) not in ok
    assert (pend.touserid, pend.fromuserid) not in ok


def test_forecast_min_rows_guard(spark, dom):
    """Symbols with <5 rows are excluded (portfolio.js:509)."""
    panel = dom["stocks"].select(
        "symbol",
        F.col("timestamp").alias("d"),
        F.col("close").cast("double").alias("close"),
    )
    fit = linear_fit(panel, key="symbol", time_col="d", value_col="close")
    syms = {r.symbol for r in fit.select("symbol").collect()}
    assert fx.TINY_SYMBOL not in syms          # 3 rows → guarded out
    assert len(syms) == len(fx.SYMBOLS) - 1
    # fit window: n_obs capped at 50
    assert all(r.n_obs <= 50 for r in fit.collect())
