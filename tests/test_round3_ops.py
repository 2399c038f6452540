"""Round-3 operator properties: partitioned-layout pruning, semantic
dedup clustering, TF-IDF ranking, temperature-mix quotas, skew
profile invariants, unpivot shape, and the correlated-subquery
decorrelation pin. Value-level cross-engine equality is covered by the
oracle registry (tools/driver_sim.py); these tests pin the properties
the oracle can't see — physical plan shape and semantic invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from relational_query_engine_sql_spark import plans
from relational_query_engine_sql_spark.plans.queries_similarity import (
    N_PLANTED,
    PLANT_OFFSET,
)
from relational_query_engine_sql_spark.sources import load_table


def _executed_plan(spark, sf, name: str) -> str:
    return (
        plans.get(name)
        .fn(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_partitioned_read_prunes_directories(spark, sf_small):
    """The partitioned round-trip's filtered read must prune at the
    directory level: PartitionFilters carries the predicate and the
    scan's data-filter list does not re-apply it row-wise."""
    plan = _executed_plan(spark, sf_small, "src_partitioned_pruning")
    assert "PartitionFilters: [" in plan
    part_filters = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "o_orderpriority" in part_filters
    # the partition predicate must NOT degrade into a post-scan Filter
    # on the partition column (directory pruning already proved it)
    data_filters = (
        plan.split("PushedFilters:", 1)[1].split("]", 1)[0]
        if "PushedFilters:" in plan
        else ""
    )
    assert "o_orderpriority" not in data_filters


def test_semantic_clusters_label_planted_pairs(spark, sf_small):
    """Every planted clone must land in its source vector's cluster
    with the source id (the smaller) as the canonical label."""
    out = plans.get("dedup_semantic_clusters").fn(spark, sf_small)
    labels = {r["node"]: r["label"] for r in out.collect()}
    for vid in range(N_PLANTED):
        assert labels.get(vid + PLANT_OFFSET) == vid
        assert labels.get(vid) == vid


def test_tfidf_ranking_is_dense_and_descending(spark, sf_small):
    out = plans.get("search_tfidf_terms").fn(spark, sf_small)
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, terms in by_doc.items():
        terms.sort(key=lambda r: r["rnk"])
        assert [t["rnk"] for t in terms] == list(range(1, len(terms) + 1))
        scores = [t["score"] for t in terms]
        assert scores == sorted(scores, reverse=True), doc
        assert len(terms) <= 3


def test_temperature_mix_quota_is_sublinear(spark, sf_small):
    """Per-domain sample counts must equal min(n_d, 10·⌊√n_d⌋) — the
    whole point of temperature sampling is that dominant domains get
    capped while small domains keep everything."""
    import math

    docs = load_table(spark, sf_small, "documents")
    n_by_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    out = plans.get("sample_temperature_mix").fn(spark, sf_small)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in n_by_source.items():
        assert got.get(src, 0) == min(n, 10 * math.floor(math.sqrt(n))), src


def test_skew_profile_invariants(spark, sf_small):
    row = plans.get("dq_skew_profile").fn(spark, sf_small).collect()
    assert len(row) == 1
    r = row[0]
    li = load_table(spark, sf_small, "lineitem")
    assert r["total_rows"] == li.count()
    assert r["n_keys"] == li.select("l_orderkey").distinct().count()
    assert 1 <= r["p50_cnt"] <= r["p90_cnt"] <= r["p99_cnt"] <= r["max_cnt"]
    # skew_x100 = 100·max/avg ≥ 100 by construction
    assert r["skew_x100"] >= 100


def test_unpivot_emits_one_row_per_metric(spark, sf_small):
    out = plans.get("ext_unpivot").fn(spark, sf_small)
    counts = {
        r["l_returnflag"]: r["n"]
        for r in out.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts and all(n == 3 for n in counts.values())


def test_correlated_scalar_decorrelates_to_join(spark, sf_oracle):
    """Catalyst must rewrite the correlated scalar subquery into an
    aggregate + join — per-outer-row re-execution (or a nested-loop
    join) would be the 100 TB killer."""
    plan = _executed_plan(spark, sf_oracle, "ext_correlated_scalar")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan or "join" in plan


def test_zorder_layout_tightens_both_dimensions(spark, sf_small, tmp_path):
    """Writing z-sorted must shrink per-file bounding boxes in BOTH
    dims vs an unsorted write — the property parquet row-group pruning
    consumes. Compare the mean x-range width across 8 output files."""
    from relational_query_engine_sql_spark.operators.layout import zorder_key

    o = load_table(spark, sf_small, "orders").select(
        F.col("o_custkey").alias("x"), F.col("o_orderkey").alias("y")
    )

    def mean_area(df, path):
        df.write.mode("overwrite").parquet(path)
        import pyspark.sql.functions as FF

        parts = spark.read.parquet(path).withColumn(
            "_f", FF.input_file_name()
        )
        rows = (
            parts.groupBy("_f")
            .agg(
                (FF.max("x") - FF.min("x")).alias("wx"),
                (FF.max("y") - FF.min("y")).alias("wy"),
            )
            .collect()
        )
        return sum(r["wx"] * r["wy"] for r in rows) / len(rows)

    plain = mean_area(o.repartition(16), str(tmp_path / "plain"))
    zsorted = (
        zorder_key(o, "x", "y")
        .repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .drop("z")
    )
    zed = mean_area(zsorted, str(tmp_path / "zed"))
    # 16 files = 4 z-prefix bits = 2 halvings per dimension: the mean
    # bounding-box AREA (the quantity two-predicate pruning sees) must
    # shrink by well over 4x; random placement leaves it unchanged.
    assert zed < plain / 4, (zed, plain)


def test_zvalue_sql_and_column_agree(spark):
    """The generated SQL text and the Column expression must encode
    the identical Morton interleave."""
    from relational_query_engine_sql_spark.operators.layout import (
        zvalue,
        zvalue_sql,
    )

    df = spark.range(500).select(
        (F.col("id") * 7 % 65536).alias("x"),
        (F.col("id") * 13 % 65536).alias("y"),
    )
    got = df.select(
        zvalue(F.col("x"), F.col("y")).alias("a"),
        F.expr(zvalue_sql("x", "y")).alias("b"),
    )
    assert got.filter(F.col("a") != F.col("b")).count() == 0


def test_leakage_safe_split_keeps_clusters_together(spark, sf_small):
    out = plans.get("split_leakage_safe").fn(spark, sf_small)
    # every cluster maps to exactly one split — the leakage guarantee
    multi = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert multi == 0
    # all three splits exist and cover every doc
    docs = load_table(spark, sf_small, "documents")
    assert out.count() == docs.count()
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}


def test_negative_pairs_are_valid_and_deterministic(spark, sf_small):
    q = plans.get("sample_negative_pairs")
    a = q.fn(spark, sf_small)
    assert a.filter(F.col("doc_id") == F.col("neg_id")).count() == 0
    # j in {1, 2} and at most 2 negatives per doc
    assert a.filter(~F.col("j").isin(1, 2)).count() == 0
    over = (
        a.groupBy("doc_id").count().filter(F.col("count") > 2).count()
    )
    assert over == 0
    # pure function of the corpus: two runs agree exactly
    b = q.fn(spark, sf_small)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_nfc_normalize_unifies_composed_and_decomposed(spark):
    """The motivating property: the same word in composed (U+00E9) and
    decomposed ('e'+U+0301) forms hashes differently raw, identically
    after NFC — so exact dedup catches the pair only post-normalize."""
    from pyspark.sql import functions as F

    from relational_query_engine_sql_spark.datapipe.dedup import exact_dedup
    from relational_query_engine_sql_spark.datapipe.textstats import (
        nfc_normalize,
    )

    docs = spark.createDataFrame(
        [(1, "caf\u00e9 au lait"), (2, "cafe\u0301 au lait")],  # composed / decomposed — escapes, not raw bytes, so an NFC-normalizing editor can't silently merge them
        "doc_id long, text string",
    )
    raw = exact_dedup(docs).collect()
    assert len(raw) == 2  # byte-different → not deduped
    normed = docs.select(
        "doc_id", nfc_normalize("text").alias("text")
    )
    post = exact_dedup(normed).collect()
    assert len(post) == 1 and post[0]["n_copies"] == 2
    # NULL passes through
    nul = spark.createDataFrame(
        [(3, None)], "doc_id long, text string"
    ).select(nfc_normalize("text").alias("t"))
    assert nul.first()["t"] is None
