#!/usr/bin/env python
"""Per-query job-count + wall profile.

Usage: python tools/profile_query.py [--sf DIR] [-k N] name [name ...]

For each query: run fn(spark, sf).count() under a unique job group and
report wall seconds (min of k) plus the number of Spark jobs launched
(constant per plan, so job count is read from the last rep). Job count
is the fixed-cost lens: at bench scale a ~50-100 ms scheduler floor
per job means a 30-job scenario pays ~2-3 s before any data work.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relational_query_engine_sql_spark import plans
from relational_query_engine_sql_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-k", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="profile_query")
    sc = spark.sparkContext
    plans.get("a1_pricing_summary").fn(spark, args.sf).count()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long").count()
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for n in args.names:
            try:
                plans.get(n).fn(spark, warm_dir).count()
            except Exception as ex:
                print(f"warm FAIL {n}: {ex}"[:200], file=sys.stderr)
        spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for rep in range(args.k):
        for n in args.names:
            spark.catalog.clearCache()
            group = f"prof-{n}-{rep}"
            sc.setJobGroup(group, n)
            t0 = time.perf_counter()
            try:
                plans.get(n).fn(spark, args.sf).count()
                took = round(time.perf_counter() - t0, 3)
            except Exception as ex:
                print(f"FAIL {n}: {ex}"[:300], file=sys.stderr)
                continue
            finally:
                sc.setJobGroup(None, None)
            njobs = len(sc.statusTracker().getJobIdsForGroup(group))
            cur = out.setdefault(n, {"best": took, "jobs": njobs})
            cur["best"] = min(cur["best"], took)
            cur["jobs"] = njobs
            print(f"run{rep} {n} {took}s jobs={njobs}",
                  file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
