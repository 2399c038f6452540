#!/usr/bin/env python
"""Interleaved A/B of RUNTIME-settable Spark SQL confs in one session.

Steal on this host drifts within minutes, so two sequential sessions
measure the host, not the conf. This alternates base/variant per query
per round inside ONE session — both arms see the same steal window —
and reports per-arm minima.

Usage:
  python tools/ab_conf.py -k 3 --set k=v [--set k=v ...] name...
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
    ap.add_argument("--set", action="append", default=[], dest="confs")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    variant = dict(kv.split("=", 1) for kv in args.confs)

    spark = get_spark(app_name="ab_conf")
    base = {k: spark.conf.get(k, None) for k in variant}
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

    def apply(conf: dict) -> None:
        for k, v in conf.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    best: dict[str, dict[str, float]] = {"base": {}, "variant": {}}
    for rep in range(args.k):
        for n in args.names:
            for arm, conf in (("base", base), ("variant", variant)):
                spark.catalog.clearCache()
                apply(conf)
                spark.sparkContext.setJobDescription(f"{arm}:{n}")
                t0 = time.perf_counter()
                try:
                    plans.get(n).fn(spark, args.sf).count()
                    took = round(time.perf_counter() - t0, 3)
                    cur = best[arm]
                    if n not in cur or took < cur[n]:
                        cur[n] = took
                    print(f"r{rep} {arm:7s} {n} {took}s",
                          file=sys.stderr, flush=True)
                except Exception as ex:
                    print(f"FAIL {arm} {n}: {ex}"[:200], file=sys.stderr)
    apply(base)
    out = {
        n: {
            "base": best["base"].get(n),
            "variant": best["variant"].get(n),
            "ratio": (
                round(best["variant"][n] / best["base"][n], 3)
                if best["base"].get(n) and best["variant"].get(n)
                else None
            ),
        }
        for n in args.names
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
