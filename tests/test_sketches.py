"""Sketch guarantees the oracle can't express: CMS never
under-counts and stays within the classical error bound; the KMV
estimate lands near truth; KMV merges distributively (the property
that makes it a sketch rather than a sample)."""

from __future__ import annotations

import pyspark.sql.functions as F

from relational_query_engine_sql_spark.datapipe.sketches import (
    CMS_WIDTH,
    cms_build,
    cms_estimate,
    kmv_estimate,
    kmv_sketch,
)
from relational_query_engine_sql_spark.sources import load_table


def test_cms_never_undercounts_and_bounds_error(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    n_total = li.count()
    sketch = cms_build(li, "l_partkey")
    exact = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    both = exact.join(
        cms_estimate(exact.select("k"), sketch, "k"), "k"
    ).collect()
    assert both
    overshoots = []
    for r in both:
        assert r["cms_est"] >= r["exact_cnt"], r
        overshoots.append(r["cms_est"] - r["exact_cnt"])
    # classical bound: overshoot < e·N/w with prob 1-(1/2)^4 per key;
    # assert the MEDIAN respects it comfortably (loose, deterministic)
    overshoots.sort()
    assert overshoots[len(overshoots) // 2] <= 2.72 * n_total / CMS_WIDTH

    # sketch size is bounded by construction
    assert sketch.count() <= 4 * CMS_WIDTH


def test_cms_sketch_is_mergeable(spark, sf_small):
    """CMS cells sum across disjoint splits: sketch(A∪B) =
    cellwise sketch(A)+sketch(B). That's what lets each executor
    build partials map-side."""
    li = load_table(spark, sf_small, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = (
        cms_build(a, "l_partkey")
        .unionByName(cms_build(b, "l_partkey"))
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(li, "l_partkey")
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_cms_weighted_build_equals_raw_build(spark, sf_small):
    """Building the sketch from a per-key count table (weight path,
    used by sketch_cms_heavy_hitters to avoid a second raw scan) must
    produce cell-for-cell the same sketch as the raw-row build."""
    li = load_table(spark, sf_small, "lineitem")
    raw = cms_build(li, "l_partkey")
    counts = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    weighted = cms_build(counts, "k", weight="c")
    diff = (
        weighted.exceptAll(raw).count() + raw.exceptAll(weighted).count()
    )
    assert diff == 0


def test_kmv_estimate_accuracy(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    truth = li.select("l_partkey").distinct().count()
    hashes = [r["h"] for r in kmv_sketch(li, "l_partkey", k=64).collect()]
    est = kmv_estimate(hashes, k=64)
    # standard error ≈ 1/√(k-2) ≈ 12.7%; allow 3σ
    assert abs(est - truth) / truth < 0.40, (est, truth)


def test_kmv_merges_distributively(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    ka = [r["h"] for r in kmv_sketch(a, "l_partkey", k=64).collect()]
    kb = [r["h"] for r in kmv_sketch(b, "l_partkey", k=64).collect()]
    merged = sorted(set(ka) | set(kb))[:64]
    whole = [r["h"] for r in kmv_sketch(li, "l_partkey", k=64).collect()]
    assert merged == whole


def test_hll_estimate_within_error_envelope(spark, sf_small):
    from relational_query_engine_sql_spark.datapipe.sketches import (
        HLL_M,
        hll_estimate,
        hll_sketch,
    )

    li = load_table(spark, sf_small, "lineitem")
    regs = hll_sketch(li, "l_partkey").collect()
    assert len(regs) <= HLL_M
    est = hll_estimate([r["r"] for r in regs])
    exact = li.select("l_partkey").distinct().count()
    # published stderr is 1.04/sqrt(m) ~= 6.5%; allow 3 sigma
    assert abs(est - exact) / exact < 3 * 1.04 / HLL_M**0.5


def test_hll_merge_equals_direct_build(spark, sf_small):
    from relational_query_engine_sql_spark.datapipe.sketches import (
        hll_merge,
        hll_sketch,
    )

    li = load_table(spark, sf_small, "lineitem")
    direct = hll_sketch(li, "l_partkey")
    shards = [
        hll_sketch(li.filter(F.col("l_orderkey") % 3 == s), "l_partkey")
        for s in range(3)
    ]
    merged = hll_merge(hll_merge(shards[0], shards[1]), shards[2])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_small_range_uses_linear_counting(spark, sf_small):
    from relational_query_engine_sql_spark.datapipe.sketches import (
        hll_estimate,
        hll_sketch,
    )

    nat = load_table(spark, sf_small, "nation")  # 25 distinct keys
    regs = hll_sketch(nat, "n_nationkey").collect()
    est = hll_estimate([r["r"] for r in regs])
    # tiny cardinality: the linear-counting branch must be near-exact
    assert abs(est - 25) < 3


def test_quantile_sample_rank_error_bound(spark, sf_small):
    """Bottom-k priority sampling: the estimate at quantile q must sit
    within the sampling rank-error envelope. For a uniform k-sample
    the empirical CDF at the picked element deviates from q by
    ~sqrt(q(1-q)/k); assert 4 sigma, deterministic for fixed data."""
    import math

    from relational_query_engine_sql_spark.datapipe.sketches import (
        bottomk_sample,
        sample_quantiles,
    )

    li = load_table(spark, sf_small, "lineitem")
    n = li.count()
    smp = bottomk_sample(
        li, "l_extendedprice", ["l_orderkey", "l_linenumber"], k=256
    )
    ranks = {"p25": 64, "p50": 128, "p75": 192, "p90": 230, "p99": 253}
    est = {r["pq"]: r["est"] for r in sample_quantiles(smp, ranks).collect()}
    assert set(est) == set(ranks)
    k = 256
    for pq, r in ranks.items():
        below = li.filter(
            F.col("l_extendedprice").cast("double") <= est[pq]
        ).count()
        # the r-th order statistic's CDF value is Beta(r, k+1-r):
        # mean r/(k+1) (NOT q — rank discretization biases the tail,
        # e.g. rank 253 of 256 estimates 0.984, not 0.99), sd below
        mean = r / (k + 1)
        sigma = math.sqrt(r * (k + 1 - r) / ((k + 1) ** 2 * (k + 2)))
        assert abs(below / n - mean) <= 4 * sigma + 1 / k, (
            pq, below / n, mean, sigma
        )


def test_quantile_sample_merges_distributively(spark):
    """Bottom-k(∪ shard bottom-k) == bottom-k(all) — on a SKEWED
    synthetic frame (one shard holds 90% of rows) so the law is
    exercised where per-shard samples are unbalanced, not just on the
    registry's uniform lineitem shards."""
    from relational_query_engine_sql_spark.datapipe.sketches import (
        bottomk_sample,
    )

    rows = [(i, i % 10 if i % 10 else 0, float(i % 997)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, shard int, x double")
    skewed = df.withColumn(
        "shard", F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 4)
    )
    direct = bottomk_sample(skewed, "x", ["id"], k=64)
    from pyspark.sql import Window as W

    pr = F.md5(F.col("id").cast("string"))
    w = W.partitionBy("shard").orderBy("pr", "v")
    per_shard = (
        skewed.select("shard", F.col("x").alias("v"), pr.alias("pr"))
        .select("shard", "v", "pr", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 64)
        .select("v", "pr")
    )
    merged = per_shard.orderBy("pr", "v").limit(64)
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_theta_intersect_estimates_track_truth(spark, sf_small):
    """The theta intersection estimate must land near the exact
    overlap on every year pair (k=64 → RSE ≈ 1/√62 ≈ 13%; the
    data is fixed, so assert a loose deterministic envelope), and
    the Jaccard estimate must stay in [0, 1]."""
    from relational_query_engine_sql_spark.plans import get

    rows = get("sketch_theta_intersect").fn(spark, sf_small).collect()
    assert len(rows) == 21  # C(7 years, 2)
    for r in rows:
        assert 0.0 <= r["jaccard_est"] <= 1.0, r
        assert r["exact_inter"] > 0, r
        rel = abs(r["inter_est"] - r["exact_inter"]) / r["exact_inter"]
        assert rel < 0.6, r  # 4-5 sigma at k=64, fixed data


def test_theta_full_sketch_pairs_are_exact(spark):
    """Groups smaller than k keep their entire hash set, θ becomes
    the THETA_FULL sentinel, and the 'estimates' collapse to exact
    set algebra — the small-group fast path."""
    from relational_query_engine_sql_spark.datapipe.sketches import (
        group_bottomk,
        theta_pair_overlap,
    )

    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(20, 50)]
    df = spark.createDataFrame(rows, "g string, k int")
    hashed = df.select(
        "g", F.md5(F.col("k").cast("string")).alias("h")
    ).distinct()
    out = theta_pair_overlap(group_bottomk(hashed, k=64), k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r["theta"] == "g"
    assert r["inter_k"] == 10 and r["inter_est"] == 10.0
    assert r["n_a"] == 30 and r["n_b"] == 30
    assert abs(r["jaccard_est"] - 10 / 50) < 1e-12


def test_theta_zero_overlap_pair_survives_with_zero(spark):
    """Disjoint groups must still emit their pair row (left joins, not
    inner) with zero intersection and zero Jaccard."""
    from relational_query_engine_sql_spark.datapipe.sketches import (
        group_bottomk,
        theta_pair_overlap,
    )

    rows = [("a", i) for i in range(200)] + [
        ("b", i) for i in range(1000, 1200)
    ]
    df = spark.createDataFrame(rows, "g string, k int")
    hashed = df.select(
        "g", F.md5(F.col("k").cast("string")).alias("h")
    ).distinct()
    out = theta_pair_overlap(group_bottomk(hashed, k=64), k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r["inter_k"] == 0
    assert r["jaccard_est"] == 0.0 and r["inter_est"] == 0.0


def test_hll_group_rollup_equals_direct_coarse_grain(spark, sf_small):
    """Hypertable-rollup law: per-hour register tables merged by
    per-bucket max must equal the registers built directly at the
    daily grain — in-engine twin of sketch_hll_hourly_rollup's
    cross-engine hash proof."""
    from relational_query_engine_sql_spark.datapipe.sketches import (
        hll_group_sketches,
    )

    ev = load_table(spark, sf_small, "events").select(
        F.to_date("ts").alias("d"),
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "user_id",
    )
    hourly = hll_group_sketches(ev, "user_id", ["d", "hr"])
    rolled = (
        hourly.groupBy("d", "bucket").agg(F.max("r").alias("r"))
    )
    direct = hll_group_sketches(ev, "user_id", ["d"])
    assert rolled.exceptAll(direct).count() == 0
    assert direct.exceptAll(rolled).count() == 0
    # bounded state: at most 256 registers per day
    per_day = rolled.groupBy("d").count().agg(F.max("count")).first()[0]
    assert per_day <= 256
