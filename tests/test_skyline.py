"""Skyline (Pareto frontier) operator: the two-phase distributed plan
must agree with the brute-force NOT EXISTS dominance semantics, keep
exact (lo, hi) duplicates, and the local prefilter must never drop a
global frontier point."""

from __future__ import annotations

import pyspark.sql.functions as F


def _brute_skyline(rows, lo_i, hi_i):
    out = []
    for a in rows:
        dominated = any(
            b[lo_i] <= a[lo_i]
            and b[hi_i] >= a[hi_i]
            and (b[lo_i] < a[lo_i] or b[hi_i] > a[hi_i])
            for b in rows
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_skyline_matches_brute_force_on_parts(spark, sf_small):
    from relational_query_engine_sql_spark.operators.skyline import skyline
    from relational_query_engine_sql_spark.sources import load_table

    part = load_table(spark, sf_small, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    rows = [tuple(r) for r in part.collect()]
    want = _brute_skyline(rows, 1, 2)
    got = sorted(
        tuple(r)
        for r in skyline(part, lo="p_retailprice", hi="p_size").collect()
    )
    assert got == want
    assert len(got) >= 1


def test_skyline_keeps_duplicates_and_drops_dominated(spark):
    from relational_query_engine_sql_spark.operators.skyline import skyline

    df = spark.createDataFrame(
        [
            (1, 10.0, 6),  # frontier (only point with hi=6)
            (2, 10.0, 6),  # exact duplicate — both kept
            (3, 10.0, 4),  # dominated by 1 (same lo, worse hi)
            (4, 9.0, 5),   # frontier (cheaper than 1, smaller hi)
            (5, 8.0, 3),   # frontier (cheapest overall)
            (6, 12.0, 5),  # dominated by 4
            (7, 8.0, 3),   # duplicate of 5 — kept
            (8, None, 9),  # null measure — excluded
        ],
        "id long, lo double, hi int",
    )
    got = sorted(r["id"] for r in skyline(df, "lo", "hi").collect())
    assert got == [1, 2, 4, 5, 7]


def test_local_prefilter_is_conservative(spark):
    """Whatever the partitioning, prefilter output is a superset of the
    global frontier and a subset of the input."""
    from relational_query_engine_sql_spark.operators.skyline import (
        local_skyline_prefilter,
        skyline,
    )

    data = [(i, float((i * 37) % 101), (i * 53) % 89) for i in range(500)]
    df = spark.createDataFrame(data, "id long, lo double, hi int")
    for parts in (1, 7):
        d = df.repartition(parts)
        pre = {r["id"] for r in local_skyline_prefilter(d, "lo", "hi").collect()}
        sky = {r["id"] for r in skyline(d, "lo", "hi").collect()}
        brute = {
            t[0] for t in _brute_skyline(data, 1, 2)
        }
        assert sky == brute
        assert brute <= pre <= {t[0] for t in data}


def test_skyline_plan_has_no_nested_loop_join(spark, sf_small):
    """The scale contract: no BroadcastNestedLoopJoin / CartesianProduct
    anywhere in the physical plan — the join back is a broadcast hash
    equi-join on (lo, hi)."""
    from relational_query_engine_sql_spark.operators.skyline import skyline
    from relational_query_engine_sql_spark.sources import load_table

    part = load_table(spark, sf_small, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    plan = (
        skyline(part, "p_retailprice", "p_size")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
