"""Lloyd's k-means trainer (datapipe/kmeans.py): determinism of the
seeding, inertia improvement over rounds, and coverage of buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from relational_query_engine_sql_spark.datapipe.kmeans import (
    train_kmeans,
    train_kmeans_multi,
)
from relational_query_engine_sql_spark.sources import load_table


def _planted(spark):
    """3 tight clusters around orthogonal-ish corners of R^4."""
    centers = [
        [10.0, 0.0, 0.0, 0.0],
        [0.0, 10.0, 0.0, 0.0],
        [0.0, 0.0, 10.0, 0.0],
    ]
    rows = []
    i = 0
    for ci, c in enumerate(centers):
        for j in range(20):
            jitter = [((i * 7 + d * 3 + j) % 5 - 2) * 0.05 for d in range(4)]
            rows.append((i, [c[d] + jitter[d] for d in range(4)], ci))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_kmeans_recovers_planted_clusters(spark):
    emb = _planted(spark)
    got = train_kmeans(emb, k=3, iters=4).collect()
    truth = {r["vec_id"]: r["label"] for r in emb.collect()}
    # trained clusters must be a relabeling of the planted ones
    mapping = {}
    for r in got:
        t = truth[r["vec_id"]]
        mapping.setdefault(r["cluster"], set()).add(t)
    assert all(len(v) == 1 for v in mapping.values()), mapping
    assert len(mapping) == 3


def test_kmeans_inertia_improves_over_seed_assignment(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    seed = train_kmeans(emb, k=10, iters=0)
    trained = train_kmeans(emb, k=10, iters=3)
    inertia0 = seed.agg(F.sum("dist")).collect()[0][0]
    inertia3 = trained.agg(F.sum("dist")).collect()[0][0]
    assert inertia3 < inertia0


def test_multi_matches_independent_runs(spark):
    """Shared-trajectory snapshots are VALUE-identical (ids, clusters
    and float dists) to separate train_kmeans runs — the optimization
    that lets an invariant probe pay one trajectory instead of two."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    snaps = train_kmeans_multi(emb, k=10, iters=(1, 3))
    for i in (1, 3):
        want = sorted(map(tuple, train_kmeans(emb, k=10, iters=i).collect()))
        got = sorted(map(tuple, snaps[i].collect()))
        assert got == want, f"iters={i} snapshot drifted"


def test_kmeans_seed_determinism(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = {
        (r["vec_id"], r["cluster"])
        for r in train_kmeans(emb, k=10, iters=2).collect()
    }
    b = {
        (r["vec_id"], r["cluster"])
        for r in train_kmeans(emb, k=10, iters=2).collect()
    }
    assert a == b
    assert len({c for _, c in a}) <= 10
