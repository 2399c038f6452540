"""Property-based invariants (SURVEY.md §5.3) with hypothesis.

The trade fold is a pure pandas function — hypothesis hammers it
directly (no Spark round trip, hundreds of examples). The parquet-table
mutation properties go through Spark, so they run few examples with the
deadline off.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import PROP_EXAMPLES

from relational_query_engine_sql_spark.operators.trading import _fold_position

# --- pure fold properties --------------------------------------------------

trade = st.tuples(
    st.sampled_from(["BUY", "SELL"]),
    st.integers(min_value=1, max_value=50),  # shares
    st.integers(min_value=1, max_value=10_000),  # price in cents
)


def _fold(initial_shares, initial_avg, trades):
    rows = []
    if not initial_shares and not trades:
        # groupBy().applyInPandas never yields empty groups — mirror that
        return pd.Series(
            {"shares": 0, "avgprice": None, "rejected": 0}
        )
    if initial_shares:
        rows.append([1, "XYZ", 0, None, "HOLD", initial_shares, initial_avg, 0])
    for i, (side, n, cents) in enumerate(trades):
        rows.append([1, "XYZ", 1, i, side, n, cents / 100.0, i])
    pdf = pd.DataFrame(
        rows,
        columns=["portfolioid", "symbol", "kind", "ts", "side", "shares",
                 "price", "rowid"],
    )
    # _fold_position reads price for the seed holding from `price`
    out = _fold_position(pdf)
    assert len(out) == 1
    return out.iloc[0]


@given(trades=st.lists(trade, max_size=30))
@settings(max_examples=200, deadline=None)
def test_fold_shares_never_negative_and_conserved(trades):
    r = _fold(0, 0.0, trades)
    assert r["shares"] >= 0
    # replay: shares must equal buys minus accepted sells
    shares = 0
    rejected = 0
    for side, n, _ in trades:
        if side == "BUY":
            shares += n
        elif n <= shares:
            shares -= n
        else:
            rejected += 1
    assert r["shares"] == shares
    assert r["rejected"] == rejected


@given(trades=st.lists(trade, min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_fold_avg_price_bounded_by_buy_prices(trades):
    """Weighted-average cost basis lies within the buy-price envelope
    (sells never move it — trading.js:185-200)."""
    r = _fold(0, 0.0, trades)
    buys = [cents / 100.0 for side, _, cents in trades if side == "BUY"]
    if r["shares"] > 0 and buys:
        assert min(buys) - 1e-9 <= r["avgprice"] <= max(buys) + 1e-9


@given(
    n0=st.integers(min_value=1, max_value=100),
    avg0=st.integers(min_value=1, max_value=10_000),
    trades=st.lists(trade, max_size=10),
)
@settings(max_examples=100, deadline=None)
def test_fold_seeded_holding_extends_cleanly(n0, avg0, trades):
    """Seeding an existing holding == folding a synthetic first BUY of
    the same size and price."""
    seeded = _fold(n0, avg0 / 100.0, trades)
    synthetic = _fold(0, 0.0, [("BUY", n0, avg0)] + trades)
    assert seeded["shares"] == synthetic["shares"]
    if seeded["shares"] > 0:
        assert abs(seeded["avgprice"] - synthetic["avgprice"]) <= 1e-4


# --- Spark mutation properties --------------------------------------------

kv_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 1000)),
    min_size=1,
    max_size=8,
)


@pytest.fixture(scope="module")
def kv_table_factory(spark, tmp_path_factory):
    from pyspark.sql import types as T

    from relational_query_engine_sql_spark.operators.mutation import (
        ParquetTable,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    counter = {"n": 0}

    def make(rows):
        counter["n"] += 1
        d = tmp_path_factory.mktemp(f"kv{counter['n']}")
        t = ParquetTable(spark, str(d / "t"), schema, keys=["k"])
        t.init(spark.createDataFrame(rows, schema))
        return t

    return make


@given(first=kv_rows, second=kv_rows)
@settings(
    max_examples=PROP_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_upsert_idempotent_and_new_rows_win(kv_table_factory, spark, first, second):
    t = kv_table_factory(first)
    incoming = spark.createDataFrame(second, t.schema)
    t.upsert(incoming)
    once = sorted(map(tuple, t.read().collect()))
    t.upsert(incoming)
    twice = sorted(map(tuple, t.read().collect()))
    assert once == twice  # idempotent
    # every incoming key holds an incoming value (last dup wins is
    # unspecified — assert membership, not which dup)
    final = dict(once)
    incoming_by_key = {}
    for k, v in second:
        incoming_by_key.setdefault(k, set()).add(v)
    for k, vals in incoming_by_key.items():
        assert final[k] in vals
