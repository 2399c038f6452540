"""Round-8 operator properties: Python UDTF lateral expansion,
VARIANT typed extraction, integer fixed-point PageRank, and Holt
linear smoothing. Value-level cross-engine equality is covered by the
oracle registry (tools/driver_sim.py / test_oracle_parity); these pin
the properties the oracle can't see — API semantics, mass
conservation, division-semantics parity, and null behavior.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from relational_query_engine_sql_spark import plans
from relational_query_engine_sql_spark.plans.queries_advanced import (
    _PRW_SCALE,
)
from relational_query_engine_sql_spark.sources import load_table


def test_udtf_expansion_count_matches_explode(spark, sf_small):
    """The UDTF emits exactly len(words)-1 bigrams per part name —
    cross-checked against the built-in split/explode path (which is
    also the fast path the docstring tells users to prefer)."""
    part = load_table(spark, sf_small, "part")
    via_builtin = (
        part.select(
            (F.size(F.split("p_name", " ")) - 1).alias("k")
        )
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    total = (
        plans.get("ext_python_udtf")
        .fn(spark, sf_small)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    # the query LIMITs to top-20 bigrams, so compare against the
    # un-limited UDTF expansion directly
    spark.udtf.register  # session has the UDTF from the query call
    raw = spark.sql(
        "SELECT COUNT(*) FROM ext_udtf_part p,"
        " LATERAL word_bigrams(p.p_name) t"
    ).collect()[0][0]
    assert raw == via_builtin
    assert total <= raw


def test_variant_typed_get_and_null_path(spark):
    """variant_get returns the requested primitive type, and
    try_variant_get on a missing path is NULL, not an error."""
    df = spark.sql(
        """
        SELECT parse_json('{"a":{"b":7},"s":"x"}') AS v
        """
    ).select(
        F.variant_get("v", "$.a.b", "bigint").alias("b"),
        F.variant_get("v", "$.s", "string").alias("s"),
        F.try_variant_get("v", "$.missing", "bigint").alias("m"),
    )
    row = df.collect()[0]
    assert row.b == 7 and isinstance(row.b, int)
    assert row.s == "x"
    assert row.m is None
    # schema_of_variant sees the shredded structure
    schema = spark.sql(
        """SELECT schema_of_variant(parse_json('{"a":1}')) AS s"""
    ).collect()[0][0]
    assert "OBJECT<A: BIGINT>" == schema.upper()


def test_pagerank_mass_is_conserved_within_truncation(spark, sf_small):
    """Rank mass after each superstep is SCALE minus only truncation
    loss: every per-edge contribution and the teleport term floor, so
    the total can fall short by at most one unit per (edge + node)
    per iteration — but never exceed SCALE or collapse."""
    out = plans.get("graph_pagerank").fn(spark, sf_small).collect()
    total = sum(r.rank_e12 for r in out)
    n_nodes = len(out)
    assert total <= _PRW_SCALE
    # generous floor: damping keeps (1-d) of mass teleporting each
    # round; truncation can't eat more than ~(E+N) units/iteration
    assert total > _PRW_SCALE * 9 // 10
    assert all(r.rank_e12 > 0 for r in out)
    assert n_nodes == 5  # event types in the fixture data


def test_pagerank_is_deterministic_across_runs(spark, sf_small):
    """Two executions hash-identical — the integer fixed-point claim
    (no summation-order sensitivity anywhere)."""
    a = plans.get("graph_pagerank").fn(spark, sf_small).collect()
    b = plans.get("graph_pagerank").fn(spark, sf_small).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_holt_truncating_division_matches_sql_div(spark):
    """The Pandas-side tdiv and Spark's div agree on negatives —
    the exact seam where Python floor-division would silently
    diverge from SQL truncating division."""
    cases = [(-7, 2), (7, 2), (-9, 10), (9, -10), (-10, 10)]
    sql_rows = spark.sql(
        "SELECT "
        + ", ".join(f"{a} div {b} AS q{i}" for i, (a, b) in enumerate(cases))
    ).collect()[0]

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for i, (a, b) in enumerate(cases):
        assert sql_rows[i] == tdiv(a, b), (a, b)


def test_holt_constant_series_converges_to_level(spark):
    """On a constant series y=c the level must stay c and the trend
    must stay 0 for any number of steps (smoothing fixed point)."""
    import pandas as pd

    from relational_query_engine_sql_spark.plans.queries_advanced import (
        ts_holt_linear,  # noqa: F401 — query registered; use helper math
    )

    # replicate the update rule directly
    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    level, trend = 123_000_000, 0
    for _ in range(50):
        y = 123_000_000
        new_level = tdiv(2 * y + 8 * (level + trend), 10)
        trend = tdiv((new_level - level) + 9 * trend, 10)
        level = new_level
    assert level == 123_000_000 and trend == 0


def test_holt_output_one_row_per_series(spark, sf_small):
    out = plans.get("ts_holt_linear").fn(spark, sf_small)
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert r.forecast_e6 == r.level_e6 + 5 * r.trend_e6


def test_native_recursive_cte_matches_loop_variant(spark, sf_small):
    """The engine-unrolled recursion and the application frontier
    loop are the same relation — and the native plan actually uses
    the recursive operator (UnionLoop) rather than being silently
    rewritten."""
    native = plans.get("sql_recursive_cte_native").fn(spark, sf_small)
    loop = plans.get("sql_recursive_hierarchy").fn(spark, sf_small)
    assert sorted(map(tuple, native.collect())) == sorted(
        map(tuple, loop.collect())
    )
    plan = native._jdf.queryExecution().executedPlan().toString()
    assert "Loop" in plan or "Recursion" in plan, plan[:500]
