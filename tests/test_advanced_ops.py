"""Properties of the advanced operators (plans/queries_advanced.py)
that the oracle can't see: closed-form invariants, plan shape, and
scale-relevant structure. Cross-engine value equality is covered by
tools/driver_sim.py over the registry.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from relational_query_engine_sql_spark import plans
from relational_query_engine_sql_spark.sources import load_table


def test_recursive_hierarchy_depth_closed_form(spark, sf_small):
    """The iterative frontier loop must reproduce the closed form
    depth(k) = floor(log2(k)) + 1 for k >= 1, depth(0) = 0 in the
    parent = floor(k/2) tree rooted at 0."""
    rows = plans.get("sql_recursive_hierarchy").fn(spark, sf_small).collect()
    n_sup = (
        load_table(spark, sf_small, "supplier").count()
    )
    assert len(rows) == n_sup  # every node reachable, none duplicated
    for r in rows:
        k = r["s_suppkey"]
        want = 0 if k == 0 else int(math.floor(math.log2(k))) + 1
        assert r["depth"] == want, (k, r["depth"], want)


def test_hierarchy_driver_path_matches_distributed(spark, sf_small, monkeypatch):
    """The gated driver-side BFS must match the distributed frontier
    loop bit-for-bit (all-integer depths), with the spy asserting each
    gate setting routes to the path it names."""
    from relational_query_engine_sql_spark.plans import queries_advanced as qa

    calls = []
    real = qa._driver_hierarchy_depths
    monkeypatch.setattr(
        qa,
        "_driver_hierarchy_depths",
        lambda s, d, rows=None: calls.append(1) or real(s, d, rows=rows),
    )
    fn = plans.get("sql_recursive_hierarchy").fn

    monkeypatch.setenv("SPARK_GRAFT_HIERARCHY_DRIVER_MAX_ROWS", "0")
    dist = fn(spark, sf_small)
    dist_rows = sorted(
        (r["s_suppkey"], r["depth"]) for r in dist.collect()
    )
    assert calls == []  # gate 0 → distributed loop

    monkeypatch.setenv("SPARK_GRAFT_HIERARCHY_DRIVER_MAX_ROWS", "250000")
    drv = fn(spark, sf_small)
    drv_rows = sorted((r["s_suppkey"], r["depth"]) for r in drv.collect())
    assert calls == [1]  # small table → driver BFS

    assert drv_rows == dist_rows
    assert [(f.name, f.dataType) for f in drv.schema] == [
        (f.name, f.dataType) for f in dist.schema
    ]


def test_pagerank_fixed_driver_path_matches_distributed(
    spark, sf_small, monkeypatch
):
    """The gated driver-side float loop must reproduce the distributed
    keyed-join loop's ROUNDED ranks (the query's observable — both
    paths sum in an arbitrary-but-fixed order under 6 dp rounding,
    exactly the property the cross-engine oracle already relies on)."""
    fn = plans.get("graph_pagerank_fixed").fn

    monkeypatch.setenv("SPARK_GRAFT_PAGERANK_DRIVER_MAX_EDGES", "0")
    dist = fn(spark, sf_small)
    dist_rows = sorted((r["node"], r["rank"]) for r in dist.collect())

    monkeypatch.setenv("SPARK_GRAFT_PAGERANK_DRIVER_MAX_EDGES", "100000")
    drv = fn(spark, sf_small)
    drv_rows = sorted((r["node"], r["rank"]) for r in drv.collect())

    assert drv_rows == dist_rows
    assert [(f.name, f.dataType) for f in drv.schema] == [
        (f.name, f.dataType) for f in dist.schema
    ]


def test_triangle_count_matches_local_enumeration(spark, sf_small):
    """Pin the oriented-wedge join against a driver-side brute force
    over the same (small) derived edge set."""
    li = load_table(spark, sf_small, "lineitem")
    edges = {
        (r["a"], r["b"])
        for r in li.select(
            (F.col("l_partkey") % 200).alias("a"),
            (F.col("l_suppkey") % 200).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    want = sum(
        1
        for a, b in edges
        for c in adj.get(b, ())
        if (a, c) in edges
    )
    got = (
        plans.get("graph_triangle_count").fn(spark, sf_small).collect()[0][
            "n_triangles"
        ]
    )
    assert got == want and got > 0


def test_pack_context_windows_bins_contiguous(spark, sf_small):
    """Within each source shard, bin ids must start at 0 and be
    contiguous (concat-and-chop leaves no empty windows), and a doc
    straddles iff its span crosses a 512 boundary."""
    out = plans.get("pack_context_windows").fn(spark, sf_small)
    per_shard = (
        out.groupBy("source")
        .agg(
            F.min("bin_id").alias("lo"),
            F.max("bin_id").alias("hi"),
            F.countDistinct("bin_id").alias("n"),
        )
        .collect()
    )
    assert per_shard
    for r in per_shard:
        assert r["lo"] == 0
        assert r["n"] == r["hi"] + 1, r  # contiguous window ids
    # at least one straddler exists with 512-token windows over
    # multi-hundred-token docs, and straddlers exist only where a doc
    # has >1 token (trivially true) — sanity, not vacuous
    assert out.filter(F.col("straddles")).count() > 0


def test_histogram_buckets_cover_all_rows(spark, sf_small):
    """Bucket counts must sum to the table row count (width_bucket
    maps every non-null price into [1, n+1])."""
    out = plans.get("ext_histogram_buckets").fn(spark, sf_small)
    total = out.agg(F.sum("n")).collect()[0][0]
    n_orders = load_table(spark, sf_small, "orders").count()
    assert total == n_orders


def test_ngram_topk_bounded_and_ranked(spark, sf_small):
    out = plans.get("text_ngram_topk").fn(spark, sf_small).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["rnk"])
        assert len(rows) <= 10
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        counts = [r["n_docs"] for r in rows]
        assert counts == sorted(counts, reverse=True)


def test_anomaly_zscore_needs_min_history(spark, sf_small):
    """No event may be flagged before its user has >= 10 prior
    observations in frame — i.e. the first 10 events of every user
    never appear in the output."""
    ev = load_table(spark, sf_small, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    early = (
        ev.select("event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("event_id")
    )
    out = plans.get("ts_anomaly_zscore").fn(spark, sf_small)
    assert out.join(early, "event_id", "inner").count() == 0


def test_containment_dominates_jaccard(spark, sf_small):
    """For any pair, containment >= jaccard (min(|A|,|B|) <= |A∪B|),
    and every Jaccard-threshold pair appears in the containment set
    at the same threshold."""
    from relational_query_engine_sql_spark.datapipe.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingles,
    )

    docs = load_table(spark, sf_small, "documents")
    sh = shingles(docs)
    jac = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in jaccard_pairs(sh, 0.4).collect()
    }
    cont = {
        (r["d1"], r["d2"]): r["containment"]
        for r in containment_pairs(sh, 0.4).collect()
    }
    assert jac, "need non-vacuous pair set"
    for pair, j in jac.items():
        assert pair in cont and cont[pair] >= j - 1e-9, (pair, j)


def _plan(spark, sf, name: str) -> str:
    return (
        plans.get(name)
        .fn(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_winsorize_broadcasts_cutpoints(spark, sf_small):
    """The per-group cut points must reach the fact stream as a
    broadcast join — a shuffle join here would re-partition the whole
    fact table for a 5-row build side."""
    plan = _plan(spark, sf_small, "feat_winsorize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_contribution_share_avoids_global_window(spark, sf_small):
    """percent-of-total must NOT plan as a partition-less Window (that
    funnels every group through one task at scale); the scaffold is a
    1-row broadcast instead."""
    plan = _plan(spark, sf_small, "a9_contribution_share")
    assert "Window" not in plan
    assert "Broadcast" in plan


def test_pagerank_plan_has_no_cartesian(spark, sf_small):
    plan = _plan(spark, sf_small, "graph_pagerank_fixed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phrase_match_prefilters_each_leg(spark, sf_small):
    """Each join leg must carry its term filter below the join (the
    posting-list bound): the executed plan joins two FILTERED streams,
    never the full token stream against itself."""
    plan = _plan(spark, sf_small, "search_phrase_match")
    assert plan.count("Filter") >= 2
    assert "CartesianProduct" not in plan


def test_shuffle_hash_hint_is_honored(spark, sf_small):
    plan = _plan(spark, sf_small, "j14_shuffle_hash_hint")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
