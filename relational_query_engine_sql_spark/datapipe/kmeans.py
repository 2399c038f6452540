"""Lloyd's k-means over an embedding column — IVF index training.

``similarity.ivf_topk`` probes pre-assigned buckets; this operator
TRAINS those buckets. It is the repo's second iterative DataFrame
algorithm (with ``operators/graph.connected_components``): a fixed
number of Lloyd rounds, each expressed as

  assign:  vectors × broadcast(centroids) → squared-L2 via
           ``zip_with`` + ``aggregate`` (JVM higher-order functions,
           no Python), argmin by ``min(struct(dist, cluster))`` —
           ONE shuffle keyed by vector id;
  update:  assignments ⋈ long-form positions → groupBy
           (cluster, pos) mean → re-assembled centroid arrays —
           shuffles bounded by k × dim, i.e. broadcast-sized.

Seeding is deterministic (the k vectors with smallest md5(id) — a
hash-spread sample, no RNG), so runs are reproducible up to
floating-point reduction order in the means. Clusters that lose all
members vanish (standard Lloyd behavior) — callers wanting exactly k
buckets re-seed; IVF probing only needs buckets to be balanced-ish,
not exactly k.

At 100 TB: per-round cost is one pass over the vectors plus a
k×dim-sized aggregate; centroids stay broadcast-sized for any
realistic k (≤ 2^16). The n×k assignment blow-up never materializes —
distances reduce inside the higher-order aggregate before the
argmin shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .similarity import as_double


def _sqdist(v, c):
    diffs = F.zip_with(v, c, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def train_kmeans(
    emb: DataFrame,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train k-means; returns assignments (id_col, cluster, dist).

    ``cluster`` is the seed ordinal (0..k-1); ``dist`` the squared L2
    distance to the final centroid.
    """
    return train_kmeans_multi(emb, k, (iters,), id_col, vec_col)[iters]


def train_kmeans_multi(
    emb: DataFrame,
    k: int = 10,
    iters: tuple[int, ...] = (5,),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, DataFrame]:
    """Assignments after EACH requested round count, from ONE shared
    Lloyd trajectory: ``{i: assignments-after-i-rounds for i in iters}``.

    Seeding is deterministic and the update step is a fixed aggregate,
    so the trajectory through round max(iters) is the same frames a
    separate ``train_kmeans(iters=i)`` run would walk — the snapshots
    are value-identical to independent runs while sharing every seed /
    assign / update pass (an invariant probe comparing 1-round vs
    3-round inertia pays 1 trajectory instead of 2; pinned in
    tests/test_kmeans.py). Intermediate snapshots are localCheckpointed
    because the following round's update re-reads them.
    """
    targets = sorted({int(i) for i in iters})
    if not targets or targets[0] < 0:
        raise ValueError(f"round counts must be >= 0: {iters}")
    v = emb.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    )
    seeds = (
        v.withColumn("_h", F.md5(F.col("id").cast("string")))
        .orderBy("_h", "id")
        .limit(k)
    )
    centroids = seeds.select(
        (F.row_number().over(W.orderBy("_h", "id")) - 1).alias("cluster"),
        F.col("v").alias("c"),
    ).localCheckpoint(eager=True)

    pos = v.select("id", F.posexplode("v")).toDF("id", "pos", "val")

    out: dict[int, DataFrame] = {}
    # the assignment against the CURRENT centroids, when a snapshot
    # already built it — the next round's update reuses it instead of
    # re-running the broadcast-assign pass
    carried: DataFrame | None = None

    def snapshot(r: int) -> None:
        nonlocal carried
        fin = _assign(v, centroids)
        if r < targets[-1]:
            fin = fin.localCheckpoint(eager=True)
            carried = fin
        out[r] = fin.select(F.col("id").alias(id_col), "cluster", "dist")

    if targets[0] == 0:
        snapshot(0)
    for r in range(1, targets[-1] + 1):
        assigned = carried if carried is not None else _assign(v, centroids)
        carried = None
        centroids = (
            assigned.select("id", "cluster")
            .join(pos, "id")
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("cval"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s["cval"],
                ).alias("c")
            )
            .localCheckpoint(eager=True)
        )
        if r in targets:
            snapshot(r)
    return out


def _assign(v: DataFrame, centroids: DataFrame) -> DataFrame:
    scored = v.crossJoin(F.broadcast(centroids)).select(
        "id",
        F.struct(
            _sqdist(F.col("v"), F.col("c")).alias("dist"),
            F.col("cluster").alias("cluster"),
        ).alias("_dc"),
    )
    best = scored.groupBy("id").agg(F.min("_dc").alias("_dc"))
    return best.select(
        "id",
        F.col("_dc.cluster").alias("cluster"),
        F.col("_dc.dist").alias("dist"),
    )
