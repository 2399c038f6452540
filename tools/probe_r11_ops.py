#!/usr/bin/env python
"""Round-11 new-operator 10x probe: j18_skyline_pareto and
stats_ks_drift at sf0.01 vs sf0.1, min-of-3 warm, with a fixed canary
(a1_pricing_summary at sf0.01) timed before and after so host-steal
windows are visible. Paste the table into SCALE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relational_query_engine_sql_spark.plans import all_queries
from relational_query_engine_sql_spark.session import get_spark

NAMES = sys.argv[1:] or ["j18_skyline_pareto", "stats_ks_drift"]
SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def time_min3(fn):
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = all_queries()

    def canary():
        return time_min3(
            lambda: qs["a1_pricing_summary"](spark, SFS[0]).collect()
        )

    # warm the JVM/IO paths once
    for name in NAMES:
        for sf in SFS:
            qs[name](spark, sf).collect()

    c0 = canary()
    rows = []
    for name in NAMES:
        t = {}
        for sf in SFS:
            t[sf] = time_min3(lambda n=name, s=sf: qs[n](spark, s).collect())
        rows.append((name, t[SFS[0]], t[SFS[1]]))
    c1 = canary()

    print(f"canary a1@sf0.01 before/after: {c0:.3f}s / {c1:.3f}s")
    print("| query | sf0.01 | sf0.1 | ratio |")
    print("|---|---|---|---|")
    for name, a, b in rows:
        print(f"| `{name}` | {a:.2f} s | {b:.2f} s | {b / a:.2f}x |")


if __name__ == "__main__":
    main()
