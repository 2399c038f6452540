"""eval_whiten_ann_recall + nearest_centroid_buckets: the reindex
assignment must pick the cosine-nearest bucket centroid, and the eval
row's two in-plan invariants (reindex >= stale index, n_hit monotone
in nprobe) must hold on the test corpus."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_nearest_centroid_reassigns_mislabeled_vector(spark):
    from relational_query_engine_sql_spark.datapipe.similarity import (
        nearest_centroid_buckets,
    )

    # two well-separated directions; vec 4 sits on bucket 0's axis but
    # carries a stale label 1 — one assignment step must move it. The
    # mislabeled vector is tiny so it barely perturbs bucket 1's mean.
    rows = [
        (0, 0, [10.0, 0.0, 0.0]),
        (1, 0, [9.0, 1.0, 0.0]),
        (2, 1, [0.0, 0.0, 10.0]),
        (3, 1, [0.0, 1.0, 9.0]),
        (4, 1, [1.0, 0.0, 0.0]),  # stale: nearest centroid is bucket 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label long, v array<double>")
    got = {
        r["vec_id"]: r["label"]
        for r in nearest_centroid_buckets(emb).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 0}


def test_reassignment_is_total_and_within_bucket_universe(spark, sf_small):
    from relational_query_engine_sql_spark.datapipe.similarity import (
        as_double,
        nearest_centroid_buckets,
    )
    from relational_query_engine_sql_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    out = nearest_centroid_buckets(emb)
    n = emb.count()
    assert out.count() == n  # every vector assigned exactly once
    assert out.select("vec_id").distinct().count() == n
    old = {r["label"] for r in emb.select("label").distinct().collect()}
    new = {r["label"] for r in out.select("label").distinct().collect()}
    assert new <= old  # no invented buckets (losing one is legal Lloyd)


def test_whiten_recall_flags_hold(spark, sf_small):
    from relational_query_engine_sql_spark.plans import all_queries

    rows = all_queries()["eval_whiten_ann_recall"](spark, sf_small).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3, 4}
    assert all(r["k"] == 10 for r in rows)
    assert all(r["reindex_no_worse"] for r in rows)
    assert all(r["multiprobe_monotone"] for r in rows)
