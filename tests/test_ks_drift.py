"""stats_ks_drift: the windowed integer-arithmetic KS statistic must
equal the textbook two-sample sup|F1 − F2| computed brute-force on the
collected sample, per event_type."""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F


def test_ks_matches_brute_force(spark, sf_small):
    from relational_query_engine_sql_spark.plans import all_queries
    from relational_query_engine_sql_spark.sources import load_table

    got = {
        r["event_type"]: r
        for r in all_queries()["stats_ks_drift"](spark, sf_small).collect()
    }

    ev = load_table(spark, sf_small, "events")
    tmid = ev.agg(
        F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2")
    ).collect()[0][0]
    rows = ev.filter(F.col("value").isNotNull()).select(
        "event_type", "value", F.unix_micros("ts").alias("us")
    ).collect()

    by_type: dict[str, tuple[list, list]] = {}
    for r in rows:
        base, cur = by_type.setdefault(r["event_type"], ([], []))
        (base if r["us"] < tmid else cur).append(r["value"])

    for et, (base, cur) in by_type.items():
        if not base or not cur:
            assert et not in got
            continue
        n1, n2 = len(base), len(cur)
        xs = sorted(set(base + cur))
        d = max(
            abs(
                Fraction(sum(v <= x for v in base), n1)
                - Fraction(sum(v <= x for v in cur), n2)
            )
            for x in xs
        )
        r = got[et]
        assert (r["n_base"], r["n_cur"]) == (n1, n2)
        # exact rational identity: ks_num / (n1*n2) == D
        assert Fraction(r["ks_num"], n1 * n2) == d
        assert r["ks_d_e6"] == (r["ks_num"] * 1_000_000) // (n1 * n2)
    assert set(got) == {
        et for et, (b, c) in by_type.items() if b and c
    }
