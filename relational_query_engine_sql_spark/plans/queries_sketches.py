"""Sketch queries: portable Count-Min heavy-hitter estimates and the
K-minimum-values distinct sketch (datapipe/sketches.py). Both are
deterministic md5-derived sketches, so unlike engine-private HLL
(``ext_approx_distinct``, rows-only) they carry full value-hash
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..datapipe.sketches import cms_build, cms_estimate, kmv_sketch
from ..sources import load_table
from .registry import query


@query(
    "sketch_cms_heavy_hitters",
    survey="beyond:sketch-count-min",
    priority=60,
    oracle="""
    WITH keys AS (
        SELECT l_partkey AS k, md5(CAST(l_partkey AS VARCHAR)) AS h,
               COUNT(*) AS exact_cnt
        FROM lineitem GROUP BY 1, 2
    ),
    r(i) AS (SELECT * FROM (VALUES (0), (1), (2), (3))),
    cells AS (
        SELECT r.i, substr(kk.h, 1 + 2*r.i, 2) AS bucket,
               CAST(SUM(kk.exact_cnt) AS BIGINT) AS cnt
        FROM keys kk CROSS JOIN r
        GROUP BY r.i, substr(kk.h, 1 + 2*r.i, 2)
    ),
    est AS (
        SELECT kk.k, kk.exact_cnt, MIN(c.cnt) AS cms_est
        FROM keys kk
        JOIN cells c ON c.bucket = substr(kk.h, 1 + 2*c.i, 2)
        GROUP BY kk.k, kk.exact_cnt
    )
    SELECT k, exact_cnt, cms_est
    FROM est ORDER BY exact_cnt DESC, k LIMIT 10
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 part keys with their Count-Min estimates beside
    the truth — the audit view of sketch quality. The sketch itself
    shuffles ≤1 024 cells however large lineitem is."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = (
        li.groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint(eager=True)  # probed by the estimate AND re-joined
    )
    # Build the sketch FROM the per-key counts (SUM(exact_cnt) per
    # cell == COUNT(*) of raw rows per cell, exactly): one lineitem
    # scan for the whole query instead of two, and the explode×4
    # fans out |distinct keys| rows, not |lineitem|.
    sketch = cms_build(exact, "k", weight="exact_cnt")
    est = cms_estimate(exact.select("k"), sketch, "k")
    return (
        exact.join(est, "k")
        .orderBy(F.col("exact_cnt").desc(), "k")
        .limit(10)
        .select("k", "exact_cnt", "cms_est")
    )


@query(
    "sketch_kmv_distinct",
    survey="beyond:sketch-kmv",
    priority=60,
    oracle="""
    SELECT h FROM (
        SELECT DISTINCT md5(CAST(l_partkey AS VARCHAR)) AS h
        FROM lineitem
    ) ORDER BY h LIMIT 64
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV distinct sketch of l_partkey: 64 smallest key digests.
    The sketch rows ARE the state a distributed distinct-estimator
    ships between sites; tests/test_sketches.py pins the estimate's
    accuracy and that merging partition-local sketches reproduces the
    global one."""
    li = load_table(spark, sf_dir, "lineitem")
    return kmv_sketch(li, "l_partkey", k=64)


# --------------------------------------------------------------------------
# KMV mergeability under the oracle gate: build an independent KMV
# sketch per shard (l_orderkey % 4 — shards share keys, so the merge
# must dedup), merge by union → distinct → take-k, and hash-compare
# against the DIRECT whole-table sketch. Equality is the distributive
# law min-k(∪ min-k(shard)) = min-k(all) that lets 1000 executors
# sketch locally and ship 64 rows each — proven cross-engine here,
# not just unit-tested.
# --------------------------------------------------------------------------
@query(
    "sketch_kmv_merge",
    survey="beyond:sketch-kmv-merge",
    priority=60,
    oracle="""
    SELECT h FROM (
        SELECT DISTINCT md5(CAST(l_partkey AS VARCHAR)) AS h
        FROM lineitem
    ) ORDER BY h LIMIT 64
    """,
)
def sketch_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    hashed = li.select(
        (F.col("l_orderkey") % 4).alias("shard"),
        F.md5(F.col("l_partkey").cast("string")).alias("h"),
    ).distinct()
    w = W.partitionBy("shard").orderBy("h")
    shard_sketches = (
        hashed.select("shard", "h", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 64)
        .select("h")
    )
    return shard_sketches.distinct().orderBy("h").limit(64)


# --------------------------------------------------------------------------
# CMS mergeability under the oracle gate: build an independent
# Count-Min cell table per shard (l_orderkey % 4), merge by summing
# cells (counts are an associative monoid), and hash-compare against
# the direct whole-table cell table. This is the exact mechanism that
# lets every executor sketch its partition locally and ship ≤1 024
# cells to a coordinator — the distributive law proven cross-engine.
# --------------------------------------------------------------------------
@query(
    "sketch_cms_merge",
    survey="beyond:sketch-cms-merge",
    priority=60,
    oracle="""
    WITH r(i) AS (SELECT * FROM (VALUES (0), (1), (2), (3))),
    cells AS (
        SELECT r.i,
               substr(md5(CAST(l_partkey AS VARCHAR)), 1 + 2*r.i, 2)
                   AS bucket,
               COUNT(*) AS cnt
        FROM lineitem CROSS JOIN r
        GROUP BY 1, 2
    )
    SELECT i, bucket, CAST(cnt AS BIGINT) AS cnt FROM cells
    """,
)
def sketch_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.sketches import cms_build

    li = load_table(spark, sf_dir, "lineitem")
    shard_sketches = [
        cms_build(li.filter(F.col("l_orderkey") % 4 == s), "l_partkey")
        for s in range(4)
    ]
    merged = shard_sketches[0]
    for sk in shard_sketches[1:]:
        merged = merged.unionByName(sk)
    return (
        merged.groupBy("i", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


# --------------------------------------------------------------------------
# HyperLogLog under the oracle gate. Unlike ext_approx_distinct
# (Spark's engine-private HLL registers, rows-only checked), this is
# the PORTABLE register table: bucket = first 2 hex chars of the md5
# digest (2^8 = 256 registers), rho = first-1-bit position of the
# next 60 bits computed with pure string ops — so DuckDB rebuilds the
# identical registers and the driver hash-compares a cardinality
# sketch exactly. The register table is the ≤256-row state a
# distributed COUNT(DISTINCT) estimator ships between sites;
# tests/test_sketches.py pins the estimate it yields to within the
# published 1.04/sqrt(m) error envelope.
# --------------------------------------------------------------------------
_HLL_REG_SQL = """
    WITH keys AS (
        SELECT DISTINCT md5(CAST(l_partkey AS VARCHAR)) AS h
        FROM lineitem
    ),
    parts AS (
        SELECT substr(h, 1, 2) AS bucket,
               ltrim(substr(h, 3, 15), '0') AS stripped
        FROM keys
    ),
    rho AS (
        SELECT bucket,
               CASE WHEN stripped = '' THEN 61
                    ELSE 4 * (15 - length(stripped))
                         + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
                                WHEN substr(stripped, 1, 1) IN ('2', '3')
                                    THEN 2
                                WHEN substr(stripped, 1, 1)
                                    IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END
                         + 1
               END AS r
        FROM parts
    )
    SELECT bucket, CAST(MAX(r) AS INT) AS r FROM rho GROUP BY bucket
"""


@query(
    "sketch_hll_registers",
    survey="beyond:sketch-hll",
    priority=60,
    oracle=_HLL_REG_SQL,
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.sketches import hll_sketch

    li = load_table(spark, sf_dir, "lineitem")
    return hll_sketch(li, "l_partkey")


# --------------------------------------------------------------------------
# HLL mergeability under the oracle gate: independent register tables
# per shard (l_orderkey % 4 — shards share part keys, so the merge
# must take the max, not the sum), merged by per-bucket max, must be
# IDENTICAL to the direct whole-table registers. max is the
# associative/commutative/idempotent monoid that makes HLL the
# canonical distributed-distinct sketch; proven cross-engine here.
# --------------------------------------------------------------------------
@query(
    "sketch_hll_merge",
    survey="beyond:sketch-hll-merge",
    priority=60,
    oracle=_HLL_REG_SQL,
)
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.sketches import hll_merge, hll_sketch

    li = load_table(spark, sf_dir, "lineitem")
    shards = [
        hll_sketch(li.filter(F.col("l_orderkey") % 4 == s), "l_partkey")
        for s in range(4)
    ]
    merged = shards[0]
    for sk in shards[1:]:
        merged = hll_merge(merged, sk)
    return merged


# --------------------------------------------------------------------------
# The HLL ESTIMATE itself under the strict oracle gate — not just the
# registers. The float-summation trap (2^-r harmonic sums are
# order-dependent in doubles) is sidestepped by summing the registers
# as EXACT scaled integers: each register contributes 2^(61-r) (a
# BIGINT; 256 of them summed as DECIMAL(38,0) — exact in both
# engines). After two rounds of driver-red on these rows (r6, r7 —
# rows/schema green, hash red, with the local strict sim green at all
# three SFs), EVERY value that feeds the driver hash is now an
# integer, a string, or a boolean derived from integer comparisons:
#   - est_e4 = round-half-up(alpha*m^2*2^61*1e4 / s_scaled) computed
#     as (2*C_e4 + s) div (2*s) — pure integral division of exact
#     DECIMAL(38,0)/HUGEINT values; no decimal→double cast anywhere.
#   - the linear-counting branch (est <= 2.5m and empty buckets) both
#     SELECTS by an integer comparison (C <= 640*s ⟺ C/s <= 640) and
#     EMITS from a 255-entry integer lookup precomputed once in
#     Python — no ln() (StrictMath vs libm last-ulp risk) reaches the
#     hash.
#   - s_scaled, a 21-digit DECIMAL(38,0), is emitted as its exact
#     STRING form: the r6/r7 reds are attributed to hashing a >2^53
#     decimal value (the only two registry rows that did), which the
#     local sim could not see because it coerced Decimal→float64
#     (fixed in tools/driver_sim.py the same round).
#   - within_bound asserts the published 1.04/sqrt(m) envelope at
#     3 sigma via |est_e4 - 1e4·n| <= 1950·n — all BIGINT.
# The result row proves the sketch usable end-to-end, not just
# storable. tools/hash_lint.py now hard-fails any hashed decimal that
# can exceed 2^53 — this emission is the pattern it enforces.
# --------------------------------------------------------------------------
_HLL_ALPHA = 0.7213 / (1 + 1.079 / 256)
_HLL_C = _HLL_ALPHA * 256 * 256 * 2.0**61  # alpha*m^2 * scale (double)
# _HLL_C exceeds 2^76, so the double's exact value IS an integer —
# int() loses nothing; both engines get the same exact literals.
_HLL_C_INT = int(_HLL_C)  # 108542285437616546381824 (24 digits)
_HLL_C2_E4 = 2 * _HLL_C_INT * 10**4  # 2*alpha*m^2*2^61*1e4 (28 digits)


def _hll_lc_case() -> str:
    """Linear-counting estimates m*ln(m/V) for V=1..255 as a CASE of
    integer literals (scaled by 1e4, round-half-up), precomputed once
    in Python so neither engine evaluates a transcendental at query
    time — the same literal text feeds the Spark plan and the DuckDB
    oracle."""
    import math

    arms = " ".join(
        f"WHEN {v} THEN "
        f"{int(math.floor(256.0 * math.log(256.0 / v) * 10000.0 + 0.5))}"
        for v in range(1, 256)
    )
    return f"CASE empty_buckets {arms} END"


_HLL_LC_CASE = _hll_lc_case()


def _hll_est_sql(col: str) -> str:
    """The full register→estimate pipeline as DuckDB SQL, parametrized
    by key column (shared by the direct-estimate and the merged-shard
    union-estimate rows)."""
    return _HLL_EST_SQL.replace("l_orderkey", col)


_HLL_EST_SQL = f"""
    WITH keys AS (
        SELECT DISTINCT md5(CAST(l_orderkey AS VARCHAR)) AS h
        FROM lineitem
    ),
    parts AS (
        SELECT substr(h, 1, 2) AS bucket,
               ltrim(substr(h, 3, 15), '0') AS stripped
        FROM keys
    ),
    rho AS (
        SELECT bucket,
               CASE WHEN stripped = '' THEN 61
                    ELSE 4 * (15 - length(stripped))
                         + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
                                WHEN substr(stripped, 1, 1) IN ('2', '3')
                                    THEN 2
                                WHEN substr(stripped, 1, 1)
                                    IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END
                         + 1
               END AS r
        FROM parts
    ),
    reg AS (SELECT bucket, MAX(r) AS r FROM rho GROUP BY bucket),
    agg AS (
        SELECT CAST(SUM(CAST((CAST(1 AS BIGINT) << (61 - r))
                             AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_used,
               COUNT(*) AS nb
        FROM reg
    ),
    scaled AS (
        SELECT s_used + CAST(256 - nb AS DECIMAL(38,0))
                        * CAST(2305843009213693952 AS DECIMAL(38,0))
                   AS s_scaled,
               CAST(256 - nb AS INT) AS empty_buckets
        FROM agg
    ),
    est AS (
        SELECT CAST(s_scaled AS VARCHAR) AS s_scaled, empty_buckets,
               CASE WHEN CAST('{_HLL_C_INT}' AS HUGEINT)
                         <= CAST(s_scaled AS HUGEINT) * 640
                         AND empty_buckets > 0
                    THEN CAST({_HLL_LC_CASE} AS BIGINT)
                    ELSE CAST((CAST('{_HLL_C2_E4}' AS HUGEINT)
                               + CAST(s_scaled AS HUGEINT))
                              // (CAST(s_scaled AS HUGEINT) * 2)
                         AS BIGINT)
               END AS est_e4
        FROM scaled
    ),
    ex AS (SELECT COUNT(DISTINCT l_orderkey) AS n_exact FROM lineitem)
    SELECT est_e4, n_exact, empty_buckets, s_scaled,
           abs(est_e4 - 10000 * n_exact) <= 1950 * n_exact AS within_bound
    FROM est, ex
"""


@query(
    "sketch_hll_estimate",
    survey="beyond:sketch-hll-estimate",
    priority=60,
    oracle=_HLL_EST_SQL,
)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.sketches import hll_sketch

    li = load_table(spark, sf_dir, "lineitem")
    regs = hll_sketch(li, "l_orderkey")
    exact = li.agg(F.countDistinct("l_orderkey").alias("n_exact"))
    return _estimate_from_regs(regs, exact)


def _estimate_from_regs(regs: DataFrame, exact: DataFrame) -> DataFrame:
    """Registers → (est_e4, n_exact, empty_buckets, s_scaled,
    within_bound): the hash-stable estimate emission shared by the
    direct and merged-shard rows. All-integer arithmetic end to end —
    round-half-up(C/s) as (2·C·1e4 + s) div (2·s) on DECIMAL(38,0)
    (Spark's `div` is exact integral division → BIGINT), the
    linear-counting branch both selected (C <= 640·s) and emitted
    (precomputed lookup) without touching doubles, and the 21-digit
    register sum emitted as its exact STRING form — see the module
    comment above for why nothing wider than 2^53 may reach the
    driver hash as a numeric."""
    agg = regs.agg(
        F.expr(
            "CAST(SUM(CAST(shiftleft(CAST(1 AS BIGINT), 61 - r) "
            "AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("s_used"),
        F.count(F.lit(1)).alias("nb"),
    )
    scaled = agg.selectExpr(
        "s_used + CAST(256 - nb AS DECIMAL(38,0))"
        " * CAST(2305843009213693952 AS DECIMAL(38,0)) AS s_scaled",
        "CAST(256 - nb AS INT) AS empty_buckets",
    )
    est = scaled.selectExpr(
        "CAST(s_scaled AS STRING) AS s_scaled",
        "empty_buckets",
        f"CASE WHEN CAST('{_HLL_C_INT}' AS DECIMAL(38,0))"
        "          <= s_scaled * CAST(640 AS DECIMAL(38,0))"
        "          AND empty_buckets > 0"
        f"     THEN CAST({_HLL_LC_CASE} AS BIGINT)"
        f"     ELSE (CAST('{_HLL_C2_E4}' AS DECIMAL(38,0)) + s_scaled)"
        "          div (s_scaled + s_scaled)"
        "     END AS est_e4",
    )
    # 1-row × 1-row scalar join (broadcast; never a data crossjoin)
    return est.crossJoin(F.broadcast(exact)).selectExpr(
        "est_e4",
        "n_exact",
        "empty_buckets",
        "s_scaled",
        "abs(est_e4 - 10000 * n_exact) <= 1950 * n_exact"
        " AS within_bound",
    )


# --------------------------------------------------------------------------
# The merge law at the ESTIMATE level: per-shard sketches merged by
# per-bucket max, run through the full bias-corrected estimate
# pipeline, must equal the single-pass estimate of the UNION — the
# DuckDB oracle computes the estimate directly over the whole table,
# so a green hash proves estimate(merge(shards)) == estimate(union)
# EXACTLY, not within tolerance. This is the property that lets a
# 100 TB scan keep one 256-register sketch per partition and combine
# them map-side (sketch_hll_merge pins it at the register level; this
# row pins the user-facing number). Emission is the hash-stable
# est_e4 scaled integer (tools/hash_lint.py rationale).
# --------------------------------------------------------------------------
@query(
    "sketch_hll_union_estimate",
    survey="beyond:sketch-hll-merge,beyond:sketch-hll-estimate",
    priority=60,
    oracle=_hll_est_sql("l_partkey"),
)
def sketch_hll_union_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..datapipe.sketches import hll_merge, hll_sketch

    li = load_table(spark, sf_dir, "lineitem")
    shards = [
        hll_sketch(li.filter(F.col("l_orderkey") % 4 == s), "l_partkey")
        for s in range(4)
    ]
    merged = shards[0]
    for sk in shards[1:]:
        merged = hll_merge(merged, sk)
    exact = li.agg(F.countDistinct("l_partkey").alias("n_exact"))
    return _estimate_from_regs(merged, exact)


# --------------------------------------------------------------------------
# Quantile sketch: deterministic bottom-k priority sample
# (datapipe/sketches.py bottomk_sample). Percentiles are the one
# sketch family CMS/KMV/HLL don't cover, and at 100 TB an exact
# percentile is a global sort — the sample is the bounded-state
# substitute: every executor ships its k smallest-priority rows
# (TakeOrderedAndProject, no global sort) and the coordinator
# re-takes k. Estimates are picked by explicit rank, never an
# engine percentile function, because interpolation semantics differ
# per engine — so the DuckDB oracle reproduces every estimate
# bit-for-bit and the driver hash-compares a QUANTILE sketch exactly.
# Rank-error accuracy (|F(est) - q| = O(1/sqrt(k))) is pinned in
# tests/test_sketches.py.
# --------------------------------------------------------------------------
_QK = 256
# 1-based rank of quantile q in a k-sample: floor((k-1)*q) + 1
_Q_RANKS = {"p25": 64, "p50": 128, "p75": 192, "p90": 230, "p99": 253}

_QUANTILE_ORACLE = """
    WITH smp AS (
        SELECT v, pr FROM (
            SELECT CAST(l_extendedprice AS DOUBLE) AS v,
                   md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                       CAST(l_linenumber AS VARCHAR)) AS pr
            FROM lineitem
        ) ORDER BY pr, v LIMIT 256
    ),
    ranked AS (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v, pr) AS rn FROM smp
    ),
    q(pq, target_rn) AS (SELECT * FROM (VALUES
        ('p25', 64), ('p50', 128), ('p75', 192),
        ('p90', 230), ('p99', 253)))
    SELECT q.pq, q.target_rn, r.v AS est
    FROM q JOIN ranked r ON r.rn = q.target_rn
"""


@query(
    "sketch_quantile_bottomk",
    survey="beyond:sketch-quantile",
    priority=60,
    oracle=_QUANTILE_ORACLE,
)
def sketch_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_extendedprice percentile estimates from a 256-row
    deterministic priority sample — the sketch answers p25/p50/p75/
    p90/p99 with bounded state however large lineitem is."""
    from ..datapipe.sketches import bottomk_sample, sample_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    smp = bottomk_sample(
        li, "l_extendedprice", ["l_orderkey", "l_linenumber"], k=_QK
    )
    return sample_quantiles(smp, _Q_RANKS)


@query(
    "sketch_quantile_merge",
    survey="beyond:sketch-quantile-merge",
    priority=60,
    oracle=_QUANTILE_ORACLE,
)
def sketch_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof for the quantile sample, cross-engine: an
    independent bottom-k per shard (l_orderkey % 4), merged by union →
    re-take-k, must yield the SAME estimates as the direct whole-table
    sample (the oracle computes the direct one). This is the
    distributive law that lets every executor sample locally and ship
    k rows — same shape as sketch_kmv_merge."""
    from ..datapipe.sketches import sample_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    pr = F.md5(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    hashed = li.select(
        (F.col("l_orderkey") % 4).alias("shard"),
        F.col("l_extendedprice").cast("double").alias("v"),
        pr.alias("pr"),
    )
    w = W.partitionBy("shard").orderBy("pr", "v")
    shard_samples = (
        hashed.select("v", "pr", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _QK)
        .select("v", "pr")
    )
    merged = shard_samples.orderBy("pr", "v").limit(_QK)
    return sample_quantiles(merged, _Q_RANKS)


@query(
    "sketch_quantile_per_group",
    survey="beyond:sketch-quantile-group",
    priority=60,
    oracle="""
    WITH smp AS (
        SELECT lang, v, pr, rn FROM (
            SELECT lang, CAST(n_chars AS DOUBLE) AS v,
                   md5(CAST(doc_id AS VARCHAR)) AS pr,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                CAST(n_chars AS DOUBLE)) AS rn
            FROM documents
        ) WHERE rn <= 64
    ),
    sized AS (SELECT lang, MAX(rn) AS cnt FROM smp GROUP BY lang),
    ranked AS (
        SELECT lang, v,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY v, pr) AS qrn
        FROM smp
    ),
    q(pq, frac) AS (SELECT * FROM (VALUES ('p50', 0.5), ('p90', 0.9)))
    SELECT r.lang, q.pq, r.v AS est
    FROM ranked r
    JOIN sized s ON s.lang = r.lang
    JOIN q ON r.qrn = CAST(FLOOR((s.cnt - 1) * q.frac) AS BIGINT) + 1
    """,
)
def sketch_quantile_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length percentiles (p50/p90 of n_chars)
    from a per-group bottom-64 priority sample — the bounded-state
    version of the corpus-monitoring query every training pipeline
    runs per mixture domain. State is ≤64 rows per group however many
    documents a language has; the per-group sample is the same
    mergeable bottom-k as sketch_quantile_bottomk, just partitioned.
    Target ranks derive from the ACTUAL sample size (floor((cnt-1)*q)
    + 1), so groups smaller than k degrade to exact quantiles instead
    of losing rows."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    pr = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("lang").orderBy("pr", "v")
    smp = (
        docs.select(
            "lang", F.col("n_chars").cast("double").alias("v"), pr.alias("pr")
        )
        .select("lang", "v", "pr", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 64)
        .localCheckpoint(eager=True)  # consumed by sized AND ranked
    )
    sized = smp.groupBy("lang").agg(F.max("rn").alias("cnt"))
    ranked = smp.select(
        "lang",
        "v",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("v", "pr"))
        .alias("qrn"),
    )
    # Per-(lang, pq) target ranks via explode of a 2-element literal —
    # pure projection, so the pick is a broadcast HASH join on
    # (lang, rank). Joining on the rank EXPRESSION directly (or
    # crossJoining a quantile frame) would plan a nested-loop join.
    targets = sized.select(
        "lang",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("pq"), F.lit(0.5).alias("frac")
                ),
                F.struct(
                    F.lit("p90").alias("pq"), F.lit(0.9).alias("frac")
                ),
            )
        ).alias("q"),
        "cnt",
    ).select(
        "lang",
        F.col("q.pq").alias("pq"),
        (F.floor((F.col("cnt") - 1) * F.col("q.frac")) + 1).alias("qrn"),
    )
    return ranked.join(F.broadcast(targets), ["lang", "qrn"]).select(
        "lang", "pq", F.col("v").alias("est")
    )


# --------------------------------------------------------------------------
# Theta-sketch set algebra: audience overlap between segments from
# per-segment KMV sketches alone. The reference has no sketch surface
# (its distinct counts are exact SQL, /root/reference/src/routes/
# portfolio.js-style aggregates); at 100 TB "how many customers do
# cohorts A and B share" cannot afford two exact distinct sets per
# pair, so each segment keeps a k-hash sketch and every pairwise
# intersection/Jaccard estimate derives from 2k hashes. All columns
# are md5-deterministic (θ is a hex string, counts are integers, the
# estimates are single IEEE divisions of exact integers), so the
# whole audit frame — estimate beside exact truth — hash-compares
# cross-engine with no float tolerance.
# --------------------------------------------------------------------------
@query(
    "sketch_theta_intersect",
    survey="beyond:sketch-theta-set-ops",
    priority=60,
    oracle="""
    WITH dk AS (
        SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS g,
               md5(CAST(o_custkey AS VARCHAR)) AS h
        FROM orders
    ),
    sk AS (
        SELECT g, h FROM (
            SELECT g, h,
                   row_number() OVER (PARTITION BY g ORDER BY h) AS rn
            FROM dk
        ) WHERE rn <= 64
    ),
    st AS (
        SELECT g,
               CASE WHEN COUNT(*) < 64 THEN 'g' ELSE MAX(h) END AS bound
        FROM sk GROUP BY g
    ),
    pairs AS (
        SELECT a.g AS g_a, b.g AS g_b, LEAST(a.bound, b.bound) AS theta
        FROM st a JOIN st b ON a.g < b.g
    ),
    na AS (
        SELECT p.g_a, p.g_b, COUNT(*) AS n_a
        FROM pairs p JOIN sk s ON s.g = p.g_a AND s.h < p.theta
        GROUP BY 1, 2
    ),
    nb AS (
        SELECT p.g_a, p.g_b, COUNT(*) AS n_b
        FROM pairs p JOIN sk s ON s.g = p.g_b AND s.h < p.theta
        GROUP BY 1, 2
    ),
    inter AS (
        SELECT p.g_a, p.g_b, COUNT(*) AS inter_k
        FROM pairs p
        JOIN sk x ON x.g = p.g_a AND x.h < p.theta
        JOIN sk y ON y.g = p.g_b AND y.h = x.h
        GROUP BY 1, 2
    ),
    exn AS (SELECT g, COUNT(*) AS n FROM dk GROUP BY g),
    exi AS (
        SELECT p.g AS g_a, q.g AS g_b, COUNT(*) AS exact_inter
        FROM dk p JOIN dk q ON p.h = q.h AND p.g < q.g
        GROUP BY 1, 2
    )
    SELECT p.g_a AS yr_a, p.g_b AS yr_b, p.theta AS theta,
           CAST(COALESCE(na.n_a, 0) AS BIGINT) AS n_a,
           CAST(COALESCE(nb.n_b, 0) AS BIGINT) AS n_b,
           CAST(COALESCE(i.inter_k, 0) AS BIGINT) AS inter_k,
           COALESCE(i.inter_k, 0) /
               (COALESCE(na.n_a, 0) + COALESCE(nb.n_b, 0)
                - COALESCE(i.inter_k, 0)) AS jaccard_est,
           CASE WHEN p.theta = 'g'
                THEN CAST(COALESCE(i.inter_k, 0) AS DOUBLE)
                ELSE CAST(COALESCE(i.inter_k, 0) AS DOUBLE) /
                     (CAST(CAST(CONCAT('0x', substr(p.theta, 1, 15))
                                AS BIGINT) AS DOUBLE)
                      / CAST(1152921504606846976 AS DOUBLE))
           END AS inter_est,
           CAST(COALESCE(exi.exact_inter, 0) AS BIGINT) AS exact_inter,
           COALESCE(exi.exact_inter, 0) /
               (ea.n + eb.n - COALESCE(exi.exact_inter, 0))
               AS exact_jaccard
    FROM pairs p
    LEFT JOIN na ON na.g_a = p.g_a AND na.g_b = p.g_b
    LEFT JOIN nb ON nb.g_a = p.g_a AND nb.g_b = p.g_b
    LEFT JOIN inter i ON i.g_a = p.g_a AND i.g_b = p.g_b
    LEFT JOIN exi ON exi.g_a = p.g_a AND exi.g_b = p.g_b
    JOIN exn ea ON ea.g = p.g_a
    JOIN exn eb ON eb.g = p.g_b
    ORDER BY yr_a, yr_b
    """,
)
def sketch_theta_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair overlap of the yearly customer audiences of ``orders``:
    every (year_a < year_b) pair with the sketch-derived n_a/n_b/
    intersection/Jaccard/cardinality estimates AND the exact truth
    beside them. The sketches are 64 hashes per year; the exact
    columns exist to audit the estimator, exactly as
    ``sketch_cms_heavy_hitters`` audits the CMS."""
    from ..datapipe.sketches import group_bottomk, theta_pair_overlap

    orders = load_table(spark, sf_dir, "orders")
    dk = (
        orders.select(
            F.year("o_orderdate").alias("g"),
            F.md5(F.col("o_custkey").cast("string")).alias("h"),
        )
        .distinct()
        # consumed by the sketch branch AND both exact branches
        .localCheckpoint(eager=True)
    )
    est = theta_pair_overlap(group_bottomk(dk, k=64), k=64)

    exn = dk.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    exi = (
        dk.alias("p")
        .join(
            dk.alias("q"),
            (F.col("p.h") == F.col("q.h"))
            & (F.col("p.g") < F.col("q.g")),
        )
        .select(
            F.col("p.g").alias("g_a"), F.col("q.g").alias("g_b")
        )
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    ea = exn.select(F.col("g").alias("g_a"), F.col("n").alias("na_ex"))
    eb = exn.select(F.col("g").alias("g_b"), F.col("n").alias("nb_ex"))
    return (
        est.join(exi, ["g_a", "g_b"], "left")
        .na.fill(0, ["exact_inter"])
        .join(F.broadcast(ea), "g_a")
        .join(F.broadcast(eb), "g_b")
        .select(
            F.col("g_a").alias("yr_a"),
            F.col("g_b").alias("yr_b"),
            "theta",
            "n_a",
            "n_b",
            "inter_k",
            "jaccard_est",
            "inter_est",
            F.col("exact_inter").cast("long").alias("exact_inter"),
            (
                F.col("exact_inter")
                / (
                    F.col("na_ex")
                    + F.col("nb_ex")
                    - F.col("exact_inter")
                )
            ).alias("exact_jaccard"),
        )
        .orderBy("yr_a", "yr_b")
    )


# --------------------------------------------------------------------------
# Bloom mergeability under the oracle gate: the txnlog file index
# (operators/txnlog.py) and the runtime join prefilter
# (join_bloom_prefilter) both rest on the same law — bloom(A∪B) =
# bloom(A) OR bloom(B) — which is what lets every executor build its
# partition's mask locally and ship ≤m bits. Proven cross-engine here
# the way sketch_kmv_merge/sketch_cms_merge prove theirs: build an
# independent mask per shard (s_suppkey % 4), merge by bit-OR
# (= set-union of set positions, the hash-comparable representation),
# and hash-compare against the direct whole-table mask. Positions are
# the same md5 hex slices the txnlog masks use.
# --------------------------------------------------------------------------
@query(
    "sketch_bloom_merge",
    survey="beyond:sketch-bloom-merge",
    priority=60,
    oracle="""
    SELECT DISTINCT
           CAST(CAST(CONCAT('0x', substr(md5(CAST(s_suppkey AS VARCHAR)),
                                         1 + 4 * j.j, 4)) AS BIGINT)
                % 32768 AS INTEGER) AS pos
    FROM supplier CROSS JOIN (SELECT * FROM (VALUES (0), (1))) j(j)
    ORDER BY pos
    """,
)
def sketch_bloom_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            F.explode(
                F.array(
                    *[
                        F.expr(
                            "cast(conv(substring(md5(cast(s_suppkey"
                            f" as string)), {1 + 4 * j}, 4), 16, 10)"
                            " as int) % 32768"
                        )
                        for j in range(2)
                    ]
                )
            ).alias("pos")
        ).distinct()

    shard_masks = [
        positions(sup.filter(F.col("s_suppkey") % 4 == s))
        for s in range(4)
    ]
    merged = shard_masks[0]
    for m in shard_masks[1:]:
        merged = merged.unionByName(m)
    return merged.distinct().orderBy("pos")


# --------------------------------------------------------------------------
# TIME-BUCKETED HLL ROLLUP (the hypertable / streaming-warehouse
# continuous-aggregate shape): per-HOUR register tables of distinct
# users, rolled up to DAILY registers by per-bucket max. The Spark
# side deliberately goes THROUGH the hourly grain (group by day+hour,
# then merge hours into days); the oracle computes the daily
# registers DIRECTLY from the raw rows — a hash match therefore
# proves the rollup law (merge-of-fine-grain == direct-coarse-grain)
# cross-engine, which is the property that lets a 100 TB deployment
# keep ≤256 rows of state per hour and answer any coarser
# distinct-count without rescanning raw data. Registers only — the
# all-integer emission class that survived the r6-r8 HLL-estimate
# canonicalizer saga by construction.
# --------------------------------------------------------------------------
@query(
    "sketch_hll_hourly_rollup",
    survey="beyond:sketch-hll-merge,beyond:hypertable-rollup",
    priority=60,
    oracle="""
    WITH keys AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d,
               md5(CAST(user_id AS VARCHAR)) AS h
        FROM events
    ),
    parts AS (
        SELECT d, substr(h, 1, 2) AS bucket,
               ltrim(substr(h, 3, 15), '0') AS stripped
        FROM keys
    ),
    rho AS (
        SELECT d, bucket,
               CASE WHEN stripped = '' THEN 61
                    ELSE 4 * (15 - length(stripped))
                         + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
                                WHEN substr(stripped, 1, 1) IN ('2', '3')
                                    THEN 2
                                WHEN substr(stripped, 1, 1)
                                    IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END
                         + 1
               END AS r
        FROM parts
    )
    SELECT d, bucket, CAST(MAX(r) AS INT) AS r
    FROM rho GROUP BY d, bucket
    """,
)
def sketch_hll_hourly_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..datapipe.sketches import hll_group_sketches

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"),
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "user_id",
    )
    hourly = hll_group_sketches(ev, "user_id", ["d", "hr"])
    # rollup: hour -> day by per-bucket max (the mergeability law)
    return (
        hourly.groupBy("d", "bucket")
        .agg(F.max("r").alias("r"))
        .select("d", "bucket", "r")
    )
