#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from relational_query_engine_sql_spark import plans
from relational_query_engine_sql_spark.session import get_spark

# Headline set: one per operator family, weighted toward the
# analytically interesting plans (stats, as-of, dedup, ANN).
HEADLINE = [
    "a1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "j1_join_dims",
    "j7_asof_latest",
    "j7_a7_market_value",
    "w2_returns_panel",
    "stats_bundle_cov_beta",
    "a5_correlation_matrix",
    "u1_linreg_fit",
    "e10_forecast_horizon",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "text_quality_metrics",
    "corpus_clean_pipeline",
    "stream_tumbling_hourly",
    "tpch_q6_forecast_revenue",
    "ext_pivot",
    "w4_gap_fill",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch JIT.
    plans.get("a1_pricing_summary").fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in HEADLINE:
        q = plans.get(name)
        t0 = time.perf_counter()
        try:
            # count() materializes every row through the full plan
            # without collecting results to the driver.
            q.fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # one bad query must not lose the run
            failures[name] = f"{type(ex).__name__}: {ex}"[:200]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **({"failures": failures} if failures else {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
