#!/usr/bin/env python
"""Round-12 larger-SF spot bench (verdict item 5).

Times a row list at a data directory (default the sf0.5-style replica
from tools/make_sf_replica.py) with the bench methodology (count()
action, clearCache between queries, min-of-k) and LOGS WHICH GATE PATH
actually ran per query:

- cc_driver / cc_dist      — connected_components union-find vs loop
- stats_driver / stats_dist — txnlog per-file stats fast path vs
                              distributed aggregate
- hier_driver, pr_driver    — recursive-hierarchy / pagerank loops

Usage: python tools/scale_spot_r12.py [--sf DIR] [-k 2] [name ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relational_query_engine_sql_spark import plans
from relational_query_engine_sql_spark.operators import graph, txnlog
from relational_query_engine_sql_spark.session import get_spark

DEFAULT_ROWS = [
    "dedup_cluster_components",
    "split_leakage_safe",
    "eval_dedup_recall",
    "dedup_incremental_ingest",
    "reco_copurchase_lift",
    "dedup_minhash_lsh",
    "dedup_ngram_containment",
    "dedup_ngram_jaccard",
    "search_bm25_topk",
    "search_tfidf_terms",
    "corpus_clean_pipeline",
    "pipeline_training_manifest",
    "s17_txnlog_merge_on_read",
    "s13_txnlog_merge_mixed",
    "maintenance_txnlog_history",
    "sql_recursive_hierarchy",
    "graph_pagerank",
    "text_bpe_encode",
]

counters = {"cc_driver": 0, "cc_dist": 0, "stats_driver": 0, "stats_dist": 0}

_real_cc = graph._driver_components


def _spy_cc(e, pdf=None):
    counters["cc_driver"] += 1
    return _real_cc(e, pdf=pdf)


graph._driver_components = _spy_cc

# the distributed CC loop is detectable by its symmetrize step: wrap
# connected_components and compare the driver counter before/after
_real_conn = graph.connected_components


def _spy_conn(*a, **k):
    before = counters["cc_driver"]
    out = _real_conn(*a, **k)
    if counters["cc_driver"] == before:
        counters["cc_dist"] += 1
    return out


graph.connected_components = _spy_conn
# consumers imported the symbol directly in some modules; patch via
# plans' lazy imports is unnecessary — queries import inside fn bodies
# from operators.graph, so the module attribute patch above is seen.

_real_stats = txnlog.TxnLogTable._driver_stat_rows


def _spy_stats(self, *a, **k):
    out = _real_stats(self, *a, **k)
    counters["stats_driver" if out is not None else "stats_dist"] += 1
    return out


txnlog.TxnLogTable._driver_stat_rows = _spy_stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("-k", type=int, default=2)
    ap.add_argument("--sf", default="/tmp/sfrep0.5")
    args = ap.parse_args()
    names = args.names or DEFAULT_ROWS

    spark = get_spark(app_name="scale_spot_r12")
    plans.get("a1_pricing_summary").fn(spark, args.sf).count()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long").count()
    warm = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for n in names:
        try:
            plans.get(n).fn(spark, warm).count()
        except Exception as ex:
            print(f"warm FAIL {n}: {ex}"[:200], file=sys.stderr)
    spark.catalog.clearCache()

    best: dict[str, float] = {}
    paths: dict[str, dict] = {}
    for rep in range(args.k):
        for n in names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"spot:{n}")
            base = dict(counters)
            t0 = time.perf_counter()
            try:
                plans.get(n).fn(spark, args.sf).count()
                took = round(time.perf_counter() - t0, 3)
                if n not in best or took < best[n]:
                    best[n] = took
                paths[n] = {
                    k: counters[k] - base[k]
                    for k in counters
                    if counters[k] - base[k]
                }
                print(f"run{rep} {n} {took}s {paths[n]}",
                      file=sys.stderr, flush=True)
            except Exception as ex:
                print(f"FAIL {n}: {type(ex).__name__}: {ex}"[:300],
                      file=sys.stderr)
                best.setdefault(n, float("nan"))
    print(json.dumps({"sf": args.sf, "best": best, "paths": paths}))
    spark.stop()


if __name__ == "__main__":
    main()
