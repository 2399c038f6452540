"""Training-set assembly operators: leakage-safe splits and negative
sampling — the last mile between a cleaned corpus and a training run.

- ``split_leakage_safe``: hash-based train/val/test assignment that
  routes every NEAR-DUP CLUSTER (not every doc) to one split. Naive
  per-doc hashing leaks: two near-duplicates land in train and test
  and the eval set is contaminated. Here docs first get their
  connected-component cluster id (same Jaccard edge set as
  ``dedup_cluster_components``), and the split decision hashes the
  CLUSTER id, so duplicates move together. Plan: the CC label frame
  (keyed joins, O(diameter) rounds) + one projection — no extra
  shuffle beyond what clustering already does.

- ``sample_negative_pairs``: deterministic random negatives for
  contrastive training. Docs are hash-bucketed (md5 prefix) and
  paired with their successors in hash order — hash order is
  uncorrelated with content, so the successor is a uniformly random
  other doc, yet the pairing is a pure function of the corpus (fully
  reproducible, oracle-checkable). One window shuffle keyed by
  bucket; every LEAD offset rides the same sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources import load_table, spread
from .queries_text import _SHINGLE_CTE, JACCARD_THRESHOLD
from .registry import query

# 16 hex values: 12/2/2 → 75% train, 12.5% val, 12.5% test
_SPLIT_CASE = """CASE
        WHEN SUBSTR(md5(CAST(cluster_id AS STRING)), 1, 1)
             IN ('c', 'd') THEN 'val'
        WHEN SUBSTR(md5(CAST(cluster_id AS STRING)), 1, 1)
             IN ('e', 'f') THEN 'test'
        ELSE 'train' END"""

_CC_CTE = (
    _SHINGLE_CTE.replace("WITH words", "WITH RECURSIVE words", 1)
    + f"""
    , common AS (
        SELECT a.id AS d1, b.id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    pairs AS (
        SELECT d1, d2
        FROM common
        JOIN counts n1 ON common.d1 = n1.id
        JOIN counts n2 ON common.d2 = n2.id
        WHERE c * 1.0 / (n1.n + n2.n - c) >= {JACCARD_THRESHOLD}
    ),
    sym AS (
        SELECT d1 AS a, d2 AS b FROM pairs
        UNION ALL
        SELECT d2, d1 FROM pairs
    ),
    reach(node, root) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node
    ),
    cc AS (SELECT node, MIN(root) AS label FROM reach GROUP BY node),
    clustered AS (
        SELECT d.doc_id, COALESCE(cc.label, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
    )
"""
)


@query(
    "split_leakage_safe",
    survey="beyond:train-split",
    priority=60,
    oracle=_CC_CTE
    + f"""
    SELECT doc_id, cluster_id, {_SPLIT_CASE} AS split
    FROM clustered
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.dedup import jaccard_pairs, shingles
    from ..operators.graph import connected_components

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    sh = shingles(docs)
    cc = connected_components(
        jaccard_pairs(sh, JACCARD_THRESHOLD), "d1", "d2"
    )
    clustered = docs.join(
        cc, docs["doc_id"] == cc["node"], "left"
    ).select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
    )
    return clustered.withColumn("split", F.expr(_SPLIT_CASE))


N_NEGATIVES = 2


@query(
    "sample_negative_pairs",
    survey="beyond:negative-sampling",
    priority=60,
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id,
               SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    leads AS (
        SELECT doc_id, bucket,
               LEAD(doc_id, 1) OVER w AS n1,
               LEAD(doc_id, 2) OVER w AS n2
        FROM ranked
        WINDOW w AS (PARTITION BY bucket ORDER BY h, doc_id)
    )
    SELECT doc_id, neg_id, j FROM (
        SELECT doc_id, n1 AS neg_id, 1 AS j FROM leads
        UNION ALL
        SELECT doc_id, n2, 2 FROM leads
    ) WHERE neg_id IS NOT NULL
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    ranked = docs.select(
        "doc_id",
        F.substring(h, 1, 2).alias("bucket"),
        h.alias("h"),
    )
    w = W.partitionBy("bucket").orderBy("h", "doc_id")
    leads = ranked.select(
        "doc_id",
        F.lead("doc_id", 1).over(w).alias("n1"),
        F.lead("doc_id", 2).over(w).alias("n2"),
    )
    out = leads.select(
        "doc_id", F.col("n1").alias("neg_id"), F.lit(1).alias("j")
    ).unionByName(
        leads.select(
            "doc_id", F.col("n2").alias("neg_id"), F.lit(2).alias("j")
        )
    )
    return out.filter(F.col("neg_id").isNotNull())


# --------------------------------------------------------------------------
# Winsorization: clip a feature column to its per-group [p05, p95] —
# the standard outlier guard before normalization in a feature
# pipeline. Percentiles are exact interpolated quantiles (same
# definition in Spark's percentile and DuckDB's quantile_cont); the
# per-group cut points are a tiny aggregate broadcast back onto the
# stream, so the plan is one groupBy + one broadcast join however
# large the fact side grows.
# --------------------------------------------------------------------------
@query(
    "feat_winsorize",
    survey="beyond:winsorize",
    priority=60,
    oracle="""
    WITH cuts AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(LEAST(GREATEST(e.value, c.lo), c.hi), 6) AS v_clipped
    FROM events e JOIN cuts c USING (event_type)
    """,
)
def feat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    return ev.join(F.broadcast(cuts), "event_type").select(
        "event_id",
        "event_type",
        F.round(
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")),
            6,
        ).alias("v_clipped"),
    )


# --------------------------------------------------------------------------
# Deterministic per-group downsampling: keep k documents per source,
# chosen by md5 hash order — unbiased w.r.t. content, reproducible
# across runs/engines, and expressible as one window per group (the
# group-limit pattern). At 100 TB this is the standard "cap each
# domain's contribution" step before mixture weighting.
# --------------------------------------------------------------------------
_PER_GROUP_K = 20


@query(
    "sample_per_group_k",
    survey="beyond:per-group-sample",
    priority=60,
    oracle=f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) t WHERE rn <= {_PER_GROUP_K}
    """,
)
def sample_per_group_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _PER_GROUP_K)
        .select("doc_id", "source")
    )


# --------------------------------------------------------------------------
# Length-bucketed batch assignment: sort docs by token count within
# each source shard and cut into fixed-size batches — the dynamic-
# batching layout that minimizes padding waste in tokenized inference/
# training (similar lengths batch together). Closed-form from one
# window row_number; batch padding waste would be max(len)-len within
# the batch, so the sort IS the optimization.
# --------------------------------------------------------------------------
_BATCH_SIZE = 16


@query(
    "batch_by_length",
    survey="beyond:length-batching",
    priority=60,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               LENGTH(string_split_regex(TRIM(text), '\\s+')) AS n_tok
        FROM documents
    )
    SELECT doc_id, source, n_tok,
           CAST((ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_tok, doc_id
           ) - 1) // {_BATCH_SIZE} AS BIGINT) AS batch_id
    FROM toks
    """,
)
def batch_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    w = W.partitionBy("source").orderBy("n_tok", "doc_id")
    return toks.select(
        "doc_id",
        "source",
        "n_tok",
        F.floor((F.row_number().over(w) - 1) / _BATCH_SIZE)
        .cast("long")
        .alias("batch_id"),
    )


# --------------------------------------------------------------------------
# Exact-proportion stratified split: within every stratum (source),
# rank docs by content-blind md5 order and cut at exact 80/10/10
# boundaries — unlike hash-threshold splits (approximate proportions)
# this guarantees the per-stratum counts, which evaluation-set
# construction usually requires. One window per stratum; the rank is
# deterministic so both engines cut identically.
# --------------------------------------------------------------------------
@query(
    "split_stratified_exact",
    survey="beyond:stratified-split",
    priority=60,
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN rn <= (8 * n) // 10 THEN 'train'
                WHEN rn <= (9 * n) // 10 THEN 'val'
                ELSE 'test' END AS split
    FROM ranked
    """,
)
def split_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = W.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "source",
        F.when(F.col("rn") <= F.floor(8 * F.col("n") / 10), "train")
        .when(F.col("rn") <= F.floor(9 * F.col("n") / 10), "val")
        .otherwise("test")
        .alias("split"),
    )


# --------------------------------------------------------------------------
# Group-mean imputation: nulls filled with their group's mean over the
# observed values — the standard feature-prep step. The driver data
# has no organic nulls, so both engines first derive the same gapped
# column (every 17th event id nulled); the imputation itself is one
# grouped aggregate broadcast back over the stream. The mean divides
# two exact decimal sums as doubles, so both engines round the same
# imputed value.
# --------------------------------------------------------------------------
@query(
    "feat_impute_group_mean",
    survey="beyond:impute",
    priority=60,
    oracle="""
    WITH gapped AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS v
        FROM events
    ),
    mu AS (
        SELECT event_type,
               CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(v) AS g_mean
        FROM gapped GROUP BY event_type
    )
    SELECT g.event_id, g.event_type,
           ROUND(COALESCE(g.v, m.g_mean), 6) AS v_filled,
           g.v IS NULL AS was_imputed
    FROM gapped g JOIN mu m USING (event_type)
    """,
)
def feat_impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    gapped = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 17 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    mu = gapped.groupBy("event_type").agg(
        (
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double")
            / F.count("v")
        ).alias("g_mean")
    )
    return gapped.join(F.broadcast(mu), "event_type").select(
        "event_id",
        "event_type",
        F.round(F.coalesce("v", "g_mean"), 6).alias("v_filled"),
        F.col("v").isNull().alias("was_imputed"),
    )


# --------------------------------------------------------------------------
# Robust (median/MAD) outlier score: |x - median| / MAD per group —
# immune to the outliers a mean/stddev z-score absorbs into its own
# baseline. Two grouped exact-percentile passes (median of values,
# then median of absolute deviations) + one broadcast join; at scale
# the percentile would switch to approx_percentile with the same
# plan shape.
# --------------------------------------------------------------------------
@query(
    "feat_robust_zscore_mad",
    survey="beyond:robust-zscore",
    priority=60,
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type,
               quantile_cont(ABS(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(ABS(e.value - m.med) / d.mad, 4) AS robust_z
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE ROUND(ABS(e.value - m.med) / d.mad, 4) > 3.0
    """,
)
def feat_robust_zscore_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    z = F.round(
        F.abs(F.col("value") - F.col("med")) / F.col("mad"), 4
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select("event_id", "event_type", z.alias("robust_z"))
        .filter(F.col("robust_z") > 3.0)
    )


# --------------------------------------------------------------------------
# Feature hashing (the "hashing trick"): categorical features map to a
# fixed 64-bucket vector via an engine-neutral md5 bucket + sign, so
# the feature space is bounded however many distinct categories exist
# — the standard way to featurize unbounded-cardinality categoricals
# at 100 TB without building a vocabulary. Long-form output (user,
# bucket, value); the signed sum is an exact integer aggregate.
# --------------------------------------------------------------------------
_HASH_BUCKETS = 64


@query(
    "feat_hash_bucketize",
    survey="beyond:feature-hashing",
    priority=60,
    oracle=f"""
    WITH feats AS (
        SELECT user_id, UNNEST([
            'et:' || event_type,
            'hod:' || CAST(HOUR(ts) AS VARCHAR)
        ]) AS feat
        FROM events
    ),
    hashed AS (
        SELECT user_id,
               ((strpos('0123456789abcdef',
                        substr(md5(feat), 31, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                          substr(md5(feat), 32, 1)) - 1))
                   % {_HASH_BUCKETS} AS bucket,
               CASE WHEN (strpos('0123456789abcdef',
                                 substr(md5(feat), 1, 1)) - 1) % 2 = 0
                    THEN 1 ELSE -1 END AS sign
        FROM feats
    )
    SELECT user_id, CAST(bucket AS INT) AS bucket,
           CAST(SUM(sign) AS BIGINT) AS feat_val
    FROM hashed GROUP BY user_id, bucket
    """,
)
def feat_hash_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature hashing of (event_type, hour-of-day) categoricals
    into 64 buckets per user. The bucket and sign derive from md5 hex
    digits (engine-neutral, unlike murmur-based hashCol), the signed
    sum is exact integer arithmetic, and the output is long-form so
    downstream can pivot or assemble sparse vectors. One explode + one
    groupBy — map-side combinable; state per task is ≤ users×buckets."""
    ev = load_table(spark, sf_dir, "events")
    feats = ev.select(
        "user_id",
        F.explode(
            F.array(
                F.concat(F.lit("et:"), F.col("event_type")),
                F.concat(
                    F.lit("hod:"), F.hour("ts").cast("string")
                ),
            )
        ).alias("feat"),
    )
    h = F.md5(F.col("feat"))
    bucket = (
        F.conv(F.substring(h, 31, 2), 16, 10).cast("int")
        % _HASH_BUCKETS
    )
    sign = F.when(
        F.conv(F.substring(h, 1, 1), 16, 10).cast("int") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        feats.select("user_id", bucket.alias("bucket"), sign.alias("sign"))
        .groupBy("user_id", "bucket")
        .agg(F.sum("sign").alias("feat_val"))
    )


# --------------------------------------------------------------------------
# Temporal split with embargo: the time-series answer to leakage-safe
# splitting — train strictly precedes test, separated by a purge gap
# so windowed features computed at train time cannot peek across the
# boundary (the finance "purged/embargoed split"). Boundaries derive
# from the corpus's own [min, max] span in exact microsecond
# arithmetic, so they are identical in both engines and the split is
# reproducible from the data alone.
# --------------------------------------------------------------------------


@query(
    "split_temporal_embargo",
    survey="beyond:temporal-split",
    priority=60,
    oracle="""
    WITH span AS (
        SELECT MIN(EPOCH_US(ts)) AS lo, MAX(EPOCH_US(ts)) AS hi
        FROM events
    ),
    b AS (
        SELECT lo + CAST(FLOOR((hi - lo) * 0.7) AS BIGINT) AS train_end,
               lo + CAST(FLOOR((hi - lo) * 0.8) AS BIGINT) AS test_start
        FROM span
    ),
    assigned AS (
        SELECT CASE WHEN EPOCH_US(e.ts) < b.train_end THEN 'train'
                    WHEN EPOCH_US(e.ts) < b.test_start THEN 'embargo'
                    ELSE 'test' END AS split,
               e.ts
        FROM events e CROSS JOIN b
    )
    SELECT split, COUNT(*) AS n, MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM assigned GROUP BY split
    """,
)
def split_temporal_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train / embargo / test assignment at the 70% and 80% points of
    the corpus time span. The boundary frame is one broadcast row;
    assignment is a map-side CASE — no shuffle beyond the final
    3-group rollup. Unlike hash splits (split_leakage_safe), rows are
    ordered in time: every train row precedes every test row and a
    10%-of-span purge gap separates them, so look-ahead features
    can't leak."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    b = span.select(
        (
            F.col("lo")
            + F.floor((F.col("hi") - F.col("lo")) * 0.7).cast("long")
        ).alias("train_end"),
        (
            F.col("lo")
            + F.floor((F.col("hi") - F.col("lo")) * 0.8).cast("long")
        ).alias("test_start"),
    )
    us = F.unix_micros("ts")
    assigned = ev.crossJoin(F.broadcast(b)).select(
        F.when(us < F.col("train_end"), F.lit("train"))
        .when(us < F.col("test_start"), F.lit("embargo"))
        .otherwise(F.lit("test"))
        .alias("split"),
        "ts",
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "feat_quantile_binning",
    survey="pipeline:feature-binning",
    priority=60,
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               ntile(10) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey
               ) AS bin
        FROM orders
    )
    SELECT o_orderpriority, bin, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM ranked GROUP BY o_orderpriority, bin
    """,
)
def feat_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quantile) feature binning, the discretization
    a training pipeline applies to heavy-tailed numerics: ntile(10)
    per priority group with a fully deterministic sort (value, then
    key — engines must agree on every tie). PARTITION BY keeps the
    window parallel — each group sorts independently, so the op
    scales by group count instead of serializing through one global
    sort (the equal-WIDTH variant is ext_histogram_buckets). Bin
    edges (lo/hi) are raw passthrough values, never rounded."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(10).over(w).alias("bin"),
        )
        .groupBy("o_orderpriority", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )
