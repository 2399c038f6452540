"""Engine-extension semantics not covered by the oracle differential
(tests/test_oracle_parity.py handles the rest of queries_extensions.py
and queries_tpch.py).
"""

from __future__ import annotations

from relational_query_engine_sql_spark import plans


def test_approx_distinct_error_bound(spark, sf_oracle):
    """The HLL estimate's error envelope is now hashed INSIDE the
    query (round 6: within_5pct rides the oracled result); this test
    pins the remaining local facts — the exact counts agree with the
    independent distinct-agg query and every envelope bit is True."""
    rows = plans.get("ext_approx_distinct").fn(spark, sf_oracle).collect()
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in plans.get("ext_distinct_agg").fn(spark, sf_oracle).collect()
    }
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_parts"] == exact[r["l_returnflag"]]
        assert r["within_5pct"] is True, r


def test_rollup_has_grand_total(spark, sf_oracle):
    rows = plans.get("ext_rollup").fn(spark, sf_oracle).collect()
    grand = [r for r in rows if r["g_rf"] == 1 and r["g_ls"] == 1]
    assert len(grand) == 1
    total = sum(r["n"] for r in rows if r["g_rf"] == 0 and r["g_ls"] == 0)
    assert grand[0]["n"] == total


def test_q5_broadcasts_dimensions(spark, sf_oracle):
    """The 6-way join must broadcast the dim sides, not shuffle them."""
    plan = (
        plans.get("tpch_q5_local_supplier_volume")
        .fn(spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
