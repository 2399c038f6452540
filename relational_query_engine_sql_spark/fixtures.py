"""Deterministic domain-table fixtures (FIXTURES.md group A).

The reference ships no tests and no data (SURVEY.md §5) — these
synthetic tables mirror its PostgreSQL schema
(/root/reference/sql/schema.sql) so reference query *semantics*
(as-of pricing, COV/beta/corr, cost basis, ACL visibility, friend
edges) are testable on data shaped like the reference's.

Everything is seeded (numpy PCG64) and SERIAL keys are pre-assigned
sequential ints (SURVEY.md §1.2).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import DOMAIN_SCHEMAS

SEED = 7
SYMBOLS = [
    "AAPL", "MSFT", "GOOG", "AMZN", "TSLA", "META", "NVDA", "AMD",
    "INTC", "NFLX",
]
# one symbol with <5 rows to hit the regression min-row guard
# (portfolio.js:509) and one with gaps (LAG-null paths).
TINY_SYMBOL = "NFLX"
GAPPY_SYMBOL = "INTC"
N_USERS = 20
N_PORTFOLIOS = 6


def conform(spark: SparkSession, pdf: pd.DataFrame, table: str) -> DataFrame:
    """createDataFrame then cast every column to the declared domain
    schema (decimals/dates enforced, never inferred)."""
    schema = DOMAIN_SCHEMAS[table]
    df = spark.createDataFrame(pdf)
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def business_days(start: str, end: str) -> list[dt.date]:
    return [d.date() for d in pd.bdate_range(start, end)]


def make_stocks(spark: SparkSession) -> DataFrame:
    """Random-walk OHLCV over the reference UI's default window
    (2017-01-01 → 2019-01-01, public/js/main.js:17-18)."""
    rng = np.random.default_rng(SEED)
    days = business_days("2017-01-01", "2019-01-01")
    rows = []
    for si, sym in enumerate(SYMBOLS):
        close = 20.0 + 80.0 * (si + 1) / len(SYMBOLS)
        sym_days = days
        if sym == TINY_SYMBOL:
            sym_days = days[:3]
        elif sym == GAPPY_SYMBOL:
            sym_days = [d for i, d in enumerate(days) if i % 7 != 3]
        for d in sym_days:
            r = rng.normal(0, 0.02)
            new_close = max(5.0, min(1000.0, close * (1 + r)))
            o = close
            hi = max(o, new_close) * (1 + abs(rng.normal(0, 0.004)))
            lo = min(o, new_close) * (1 - abs(rng.normal(0, 0.004)))
            rows.append(
                (
                    sym,
                    d,
                    round(o, 2),
                    round(hi, 2),
                    round(lo, 2),
                    round(new_close, 2),
                    int(rng.integers(10_000, 100_000_000)),
                )
            )
            close = new_close
    pdf = pd.DataFrame(
        rows,
        columns=["symbol", "timestamp", "open", "high", "low", "close", "volume"],
    )
    return conform(spark, pdf, "stocks")


def make_users(spark: SparkSession) -> DataFrame:
    pdf = pd.DataFrame(
        {
            "userid": range(1, N_USERS + 1),
            "name": [f"User {i}" for i in range(1, N_USERS + 1)],
            # mixed-case emails for the ILIKE test (users.js:50-53)
            "email": [
                f"{'User' if i % 2 else 'user'}{i}@Example.com"
                for i in range(1, N_USERS + 1)
            ],
            "password_hash": ["$2b$fixture"] * N_USERS,
        }
    )
    return conform(spark, pdf, "users")


def make_friend(spark: SparkSession) -> DataFrame:
    rng = np.random.default_rng(SEED + 1)
    pairs = set()
    while len(pairs) < 25:
        a, b = rng.integers(1, N_USERS + 1, 2)
        if a != b:
            pairs.add((int(min(a, b)), int(max(a, b))))  # userid1 < userid2
    pdf = pd.DataFrame(sorted(pairs), columns=["userid1", "userid2"])
    pdf["created_at"] = dt.datetime(2018, 1, 1, 12, 0, 0)
    return conform(spark, pdf, "friend")


def make_request(spark: SparkSession) -> DataFrame:
    rng = np.random.default_rng(SEED + 2)
    rows = []
    statuses = ["PENDING", "ACCEPTED", "REJECTED"]
    for i in range(1, 31):
        a, b = 0, 0
        while a == b:
            a, b = (int(x) for x in rng.integers(1, N_USERS + 1, 2))
        rows.append(
            (i, a, b, statuses[i % 3], dt.datetime(2018, 2, 1) + dt.timedelta(hours=i))
        )
    pdf = pd.DataFrame(
        rows, columns=["requestid", "fromuserid", "touserid", "status", "created_at"]
    )
    return conform(spark, pdf, "request")


def make_stocklist(spark: SparkSession) -> DataFrame:
    rows = []
    for i in range(1, 13):
        # visibility trichotomy (lists.js:155-233): public / private+shared
        # / private+unshared
        rows.append((i, (i % N_USERS) + 1, f"List {i}", i % 3 == 0))
    pdf = pd.DataFrame(rows, columns=["listid", "ownerid", "name", "is_public"])
    return conform(spark, pdf, "stocklist")


def make_shared_with(spark: SparkSession) -> DataFrame:
    rows = [(1, 5), (1, 6), (2, 7), (4, 5), (7, 3), (8, 9)]
    pdf = pd.DataFrame(rows, columns=["listid", "userid"])
    return conform(spark, pdf, "stocklist_shared_with")


def make_stockin(spark: SparkSession) -> DataFrame:
    rng = np.random.default_rng(SEED + 3)
    rows = []
    for listid in range(1, 13):
        n = int(rng.integers(1, 6))
        syms = rng.choice(SYMBOLS, size=n, replace=False)
        for s in syms:
            rows.append((listid, str(s), float(rng.integers(1, 500))))
    pdf = pd.DataFrame(rows, columns=["listid", "symbol", "shares"])
    return conform(spark, pdf, "stockin")


def make_review(spark: SparkSession) -> DataFrame:
    rows = []
    rid = 1
    for listid in range(1, 13):
        for uid in range(1, (listid % 4) + 2):
            rows.append(
                (
                    rid,
                    listid,
                    uid,
                    f"review of list {listid} by {uid}",
                    dt.datetime(2018, 3, 1) + dt.timedelta(hours=rid),
                    dt.datetime(2018, 3, 2) + dt.timedelta(hours=rid),
                )
            )
            rid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["reviewid", "listid", "userid", "content", "created_at", "updated_at"],
    )
    return conform(spark, pdf, "review")


def make_portfolio(spark: SparkSession) -> DataFrame:
    pdf = pd.DataFrame(
        {
            "portfolioid": range(1, N_PORTFOLIOS + 1),
            "userid": [(i % N_USERS) + 1 for i in range(N_PORTFOLIOS)],
            "name": [f"Portfolio {i}" for i in range(1, N_PORTFOLIOS + 1)],
            "cashbalance": [10_000.00 * i for i in range(1, N_PORTFOLIOS + 1)],
        }
    )
    return conform(spark, pdf, "portfolio")


def make_holdings(spark: SparkSession) -> DataFrame:
    # portfolio 1: >=3 holdings (corr matrix needs pairs,
    # portfolio.js:449-476); portfolio 6: none (error path :353-355).
    rows = [
        (1, 1, "AAPL", 100, 50.1234),
        (2, 1, "MSFT", 50, 80.5000),
        (3, 1, "GOOG", 25, 95.2500),
        (4, 1, "AMZN", 10, 110.0000),
        (5, 2, "AAPL", 200, 48.0000),
        (6, 2, "TSLA", 30, 60.0000),
        (7, 3, "NVDA", 75, 70.7500),
        (8, 4, "AMD", 120, 30.2000),
        (9, 5, "INTC", 60, 40.0000),
    ]
    ts = dt.datetime(2018, 6, 1, 9, 30)
    pdf = pd.DataFrame(
        rows, columns=["holdingid", "portfolioid", "symbol", "shares", "avgprice"]
    )
    pdf["createdat"] = ts
    pdf["updatedat"] = ts
    return conform(spark, pdf, "holdings")


def make_transactions(spark: SparkSession) -> DataFrame:
    # ledger detail strings in the reference's exact formats
    # (trading.js:105,215, portfolio.js:170-217)
    rows = [
        (1, 1, 10000.00, "Deposit $10000.00"),
        (2, 1, -5012.34, "Bought 100 shares of AAPL at $50.1234 each."),
        (3, 1, -4025.00, "Bought 50 shares of MSFT at $80.50 each."),
        (4, 2, 20000.00, "Deposit $20000.00"),
        (5, 2, -9600.00, "Bought 200 shares of AAPL at $48.00 each."),
        (6, 2, 1500.00, "Sold 25 shares of AAPL at $60.00 each."),
        (7, 3, -500.00, "Withdraw $500.00"),
        (8, 3, -5306.25, "Bought 75 shares of NVDA at $70.75 each."),
    ]
    pdf = pd.DataFrame(
        rows, columns=["transactionid", "portfolioid", "amount", "detail"]
    )
    pdf["createdat"] = [
        dt.datetime(2018, 6, 1, 10, 0) + dt.timedelta(minutes=i)
        for i in range(len(rows))
    ]
    return conform(spark, pdf, "transactions")


def make_statistics_cache(spark: SparkSession) -> DataFrame:
    # one pre-seeded row → cache-hit path (portfolio.js:329-346)
    pdf = pd.DataFrame(
        {
            "portfolio_id": [1],
            "start_date": [dt.date(2017, 1, 1)],
            "end_date": [dt.date(2019, 1, 1)],
            "symbol": ["AAPL"],
            "cov": [1.2345],
            "beta": [0.9876],
            "updated_at": [dt.datetime(2018, 12, 31, 23, 59)],
        }
    )
    return conform(spark, pdf, "statistics_cache")


_MAKERS = {
    "stocks": make_stocks,
    "users": make_users,
    "friend": make_friend,
    "request": make_request,
    "stocklist": make_stocklist,
    "stocklist_shared_with": make_shared_with,
    "stockin": make_stockin,
    "review": make_review,
    "portfolio": make_portfolio,
    "holdings": make_holdings,
    "transactions": make_transactions,
    "statistics_cache": make_statistics_cache,
}


def make_domain_table(spark: SparkSession, name: str) -> DataFrame:
    return _MAKERS[name](spark)


def write_domain_tables(spark: SparkSession, out_dir: str) -> None:
    """Materialize every domain fixture as parquet (for differential
    tests that register the same files in DuckDB)."""
    for name, maker in _MAKERS.items():
        maker(spark).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
