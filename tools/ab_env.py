#!/usr/bin/env python
"""Interleaved A/B of driver-side ENV gates in one session.

Same rationale as ab_conf.py (steal drifts within minutes, so two
sequential sessions measure the host, not the change), but for the
os.environ gates the driver fast paths read at call time
(SPARK_GRAFT_CC_DRIVER_MAX_EDGES, SPARK_GRAFT_PAGERANK_DRIVER_MAX_EDGES,
...): both arms run inside ONE session, alternating per query per
round, and per-arm minima are reported.

Usage:
  python tools/ab_env.py -k 3 --set KEY=VALUE [--set ...] name...

The "base" arm is the current environment; the "variant" arm applies
the --set overrides (value "" unsets).
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
    ap.add_argument("-k", type=int, default=3)
    ap.add_argument("--set", action="append", default=[], dest="envs")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    variant = dict(kv.split("=", 1) for kv in args.envs)
    base = {k: os.environ.get(k) for k in variant}

    spark = get_spark(app_name="ab_env")
    plans.get("a1_pricing_summary").fn(spark, args.sf).count()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long").count()
    warm = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for n in args.names:
        try:
            plans.get(n).fn(spark, warm).count()
        except Exception as ex:
            print(f"warm FAIL {n}: {ex}", file=sys.stderr)
    spark.catalog.clearCache()

    def apply(env: dict) -> None:
        for k, v in env.items():
            if v in (None, ""):
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    best: dict[str, dict[str, float]] = {"base": {}, "variant": {}}
    for rep in range(args.k):
        for n in args.names:
            for arm, env in (("base", base), ("variant", variant)):
                apply(env)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{arm}:{n}")
                t0 = time.perf_counter()
                try:
                    plans.get(n).fn(spark, args.sf).count()
                    took = round(time.perf_counter() - t0, 3)
                    cur = best[arm]
                    if n not in cur or took < cur[n]:
                        cur[n] = took
                    print(f"run{rep} {arm} {n} {took}s",
                          file=sys.stderr, flush=True)
                except Exception as ex:
                    print(f"FAIL {arm} {n}: {type(ex).__name__}: {ex}"[:300],
                          file=sys.stderr)
                    best[arm].setdefault(n, float("nan"))
    apply(base)
    print(json.dumps(best))
    spark.stop()


if __name__ == "__main__":
    main()
