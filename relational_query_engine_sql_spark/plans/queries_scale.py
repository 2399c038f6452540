"""Scale-technique operators: the shuffle-hygiene machinery a 100 TB
deployment leans on, each expressed as an oracle-checked query so the
technique is proven semantics-preserving, not just described.

- ``ext_salted_join``: skew-busting salted equi-join. A shuffle join
  on a low-cardinality hot key (5 event types) can use at most
  |distinct keys| reducers regardless of cluster size; salting
  multiplies the key space so each hot key spreads across ``buckets``
  tasks. The oracle is the PLAIN join — proving replication adds and
  drops nothing.

- ``join_bloom_prefilter``: the runtime-filter pattern built by hand —
  a deterministic Bloom filter over the (selective) build-side keys is
  aggregated into ≤m bit positions, broadcast, and applied map-side to
  the probe scan BEFORE the shuffle; an exact semi-join then removes
  false positives. At 100 TB this is the difference between shuffling
  the full fact table and shuffling the ~1% that can possibly match.
  The oracle is the exact EXISTS semi-join.

- ``scd2_user_state``: slowly-changing-dimension type-2 history build
  from an event change log — consecutive-duplicate compression (keep a
  row only when the tracked attribute changes) then validity intervals
  via LEAD. Two window passes over the same (user, time) ordering —
  one shuffle, both windows pipelined in the same stage.

- ``feat_target_encode``: leakage-safe leave-one-out target encoding,
  the classic categorical-feature trick — each row's category is
  encoded as the mean target of all OTHER rows in the category,
  closed-form ``(sum - own) / (n - 1)``. Implemented as a map-side
  combinable groupBy + broadcast join back (NOT a per-category window:
  with 5 hot categories a window would bottleneck 5 reducers — the
  same ceiling ``ext_salted_join`` exists to break).

- ``dq_benford_digits``: Benford's-law first-digit audit for fraud /
  data-generation screening. First digit extracted via integer string
  form (engine-neutral — no log10-of-value boundary risk), expected
  shares from log10(1+1/d). Single map-side-combinable aggregate: the
  shuffle carries 9 groups however large the input.

- ``sample_weighted_priority``: deterministic weighted sampling —
  priority = hash-uniform(id) / weight, keep the k smallest. Larger
  weights systematically draw smaller priorities, so selection
  probability grows with weight (hash-priority sampling: same family
  as Efraimidis–Spirakis u^(1/w) but with an exactly-reproducible
  IEEE-division key instead of a transcendental pow, so both engines
  produce bit-identical priorities). Fully distributed: a global
  top-k, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources import load_table
from .numeric import money_sum, sql_money_sum
from .registry import query

# --------------------------------------------------------------------------
# Salted join: identical rows to the plain join, multiplied parallelism.
# --------------------------------------------------------------------------


@query(
    "ext_salted_join",
    survey="ext:salted-join,J1",
    oracle="""
    WITH dim AS (
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(*) AS type_w
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(e.value * d.type_w AS DECIMAL(27,6))), 4)
                AS DOUBLE) AS weighted_total
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
)
def ext_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact(events) ⋈ per-type weight dim through operators.skew.
    salted_join — the oracle is the PLAIN join+aggregate, so the green
    row proves the salted rewrite is semantics-preserving. The dim here
    is derived (per-type mean value) purely so the oracle can rebuild
    it; the technique targets real mid-size dims that exceed the
    broadcast threshold while the fact key stays low-cardinality."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("type_w")
    )
    joined = salted_join(ev, dim, "event_type", salt_col="event_id")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum(F.col("value") * F.col("type_w"), 4).alias(
            "weighted_total"
        ),
    )


# --------------------------------------------------------------------------
# Bloom-filter pre-join pruning: shuffle only what can match.
# --------------------------------------------------------------------------

_BLOOM_BITS = 4096
_BLOOM_HASHES = 3
_BLOOM_PRICE_MIN = 490_000.0  # ~2% of orders qualify


def _bloom_positions(key: F.Column) -> F.Column:
    """k deterministic bit positions for a key — xxhash64 seeded by
    hash index. Array-typed so build (explode) and probe (contains)
    share one definition."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(_BLOOM_BITS))
            for i in range(_BLOOM_HASHES)
        ]
    )


@query(
    "join_bloom_prefilter",
    survey="ext:bloom-runtime-filter,J5",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_items,
           {sql_money_sum("l_extendedprice * (1 - l_discount)", 2)}
               AS revenue
    FROM lineitem l
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderkey = l.l_orderkey
          AND o.o_totalprice > {_BLOOM_PRICE_MIN}
    )
    GROUP BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem revenue for high-value orders, with the probe side
    pre-filtered through a hand-built Bloom filter before the exact
    semi-join. The filter is an aggregated bit-position set (≤4096
    ints however large the build side — explode → distinct →
    collect_set keeps it distributed until the final bounded row),
    broadcast to the probe scan as a map-side predicate. False
    positives are removed by the exact semi-join, so the result —
    and the oracle — is the plain EXISTS. This is what
    spark.sql.optimizer.runtime.bloomFilter does automatically for
    qualifying shapes; building it by hand makes the technique
    available to compositions the optimizer won't reach (e.g. through
    a mapInPandas boundary)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    build = orders.filter(F.col("o_totalprice") > _BLOOM_PRICE_MIN).select(
        "o_orderkey"
    )
    # Dense bitmask: m bits packed into m/64 longs. An int-set with
    # array_contains would cost O(k·m) linear scans per probe row
    # (measured 2.05 s at sf0.1); indexed element_at on the packed
    # array is O(k) — same filter, ~4x cheaper probe stage.
    # shiftleft() needs a literal bit count, so single-bit masks come
    # from an indexed powers-of-two array instead (O(1) element_at).
    pow2 = F.array(
        *[
            # bit 63 as the signed two's-complement long
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(64)
        ]
    )
    word = F.shiftright(F.col("pos"), 6).cast("int")
    bit = F.element_at(
        pow2, F.col("pos").bitwiseAND(F.lit(63)).cast("int") + 1
    )
    mask = (
        build.select(
            F.explode(_bloom_positions(F.col("o_orderkey"))).alias("pos")
        )
        .select(word.alias("word"), bit.alias("bit"))
        .groupBy("word")
        .agg(F.bit_or("bit").alias("m"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "m"))
            ).alias("mm")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(_BLOOM_BITS // 64 - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("mm"), i), F.lit(0).cast("long")
                ),
            ).alias("bloom_mask")
        )
    )
    probe = li.crossJoin(F.broadcast(mask)).filter(
        # all k positions set ⇒ possible member; any clear ⇒ certain miss
        F.forall(
            _bloom_positions(F.col("l_orderkey")),
            lambda p: F.element_at(
                F.col("bloom_mask"), F.shiftright(p, 6).cast("int") + 1
            ).bitwiseAND(
                F.element_at(
                    pow2, p.bitwiseAND(F.lit(63)).cast("int") + 1
                )
            )
            != 0,
        )
    )
    exact = probe.join(F.broadcast(build), probe.l_orderkey == build.o_orderkey, "left_semi")
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
        ).alias("revenue"),
    )


# --------------------------------------------------------------------------
# SCD type-2 history build from a change log.
# --------------------------------------------------------------------------


@query(
    "scd2_user_state",
    survey="ext:scd2-history,W3",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts AS valid_from, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id
           ) AS valid_to,
           CAST(LEAD(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id
           ) IS NULL AS INT) AS is_current
    FROM changes
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history of each user's event_type state:
    consecutive duplicates compressed, [valid_from, valid_to) intervals
    from LEAD, open interval flagged current. Reference analog: the
    reference keeps only current state (schema.sql's single-row
    holdings); SCD2 is the lakehouse-standard upgrade that preserves
    history for point-in-time joins (j13 consumes exactly this shape).
    Both windows share one (user_id, time) ordering — a single
    shuffle, state bounded to one row per window."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().cast("int").alias(
            "is_current"
        ),
    )


# --------------------------------------------------------------------------
# Leave-one-out target encoding: groupBy + broadcast join, not a window.
# --------------------------------------------------------------------------


@query(
    "feat_target_encode",
    survey="beyond:target-encoding,A1",
    oracle="""
    WITH g AS (
        SELECT event_type,
               SUM(CAST(value AS DECIMAL(27,6))) AS s,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(CAST(g.s - CAST(e.value AS DECIMAL(27,6)) AS DOUBLE)
                 / (g.n - 1), 6) AS loo_mean
    FROM events e JOIN g USING (event_type)
    """,
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe target encoding of event_type by mean(value) of
    all OTHER rows: (group_sum − own) / (group_n − 1). Category sums
    travel as exact decimals so both engines subtract identical
    quantities. Deliberately groupBy+broadcast-join rather than a
    per-category window — the category key is low-cardinality, so a
    window would serialize each category through one reducer while the
    partial-aggregating groupBy stays fully parallel."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(27,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return ev.join(F.broadcast(g), "event_type").select(
        "event_id",
        "event_type",
        F.round(
            (F.col("s") - F.col("value").cast("decimal(27,6)")).cast(
                "double"
            )
            / (F.col("n") - 1),
            6,
        ).alias("loo_mean"),
    )


# --------------------------------------------------------------------------
# Benford first-digit audit.
# --------------------------------------------------------------------------


@query(
    "dq_benford_digits",
    survey="beyond:dq-benford,A1",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
        SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
    )
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS obs_share,
           ROUND(LOG10(1 + 1.0 / digit), 6) AS exp_share
    FROM obs
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs the
    Benford expectation — the standard synthetic-data / fraud screen.
    The digit comes from the integer's string form (identical
    formatting in both engines), never floor(log10(x)) whose boundary
    behaviour is ulp-sensitive. One 9-group aggregate: map-side
    combine reduces however many rows to 9 partials per task."""
    digits = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    # total via broadcast single-row scaffold, not a global window —
    # house style: an unpartitioned window moves everything to one
    # task even when (as here) the input is already tiny.
    total = obs.agg(F.sum("n").alias("_total"))
    return obs.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("_total"), 6).alias(
            "obs_share"
        ),
        F.round(F.log10(1 + 1.0 / F.col("digit")), 6).alias("exp_share"),
    )


# --------------------------------------------------------------------------
# Deterministic weighted sampling: hash-priority, global top-k.
# --------------------------------------------------------------------------

_SAMPLE_K = 25
_HEX = "0123456789abcdef"


@query(
    "sample_weighted_priority",
    survey="beyond:weighted-sampling",
    oracle=f"""
    WITH pri AS (
        SELECT doc_id, n_chars,
               (SELECT SUM((strpos('{_HEX}',
                            substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
                           * POWER(16, 12 - i))
                FROM generate_series(1, 12) t(i))
               / POWER(16, 12) / n_chars AS priority
        FROM documents
    )
    SELECT doc_id, n_chars, priority
    FROM pri ORDER BY priority, doc_id LIMIT {_SAMPLE_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional document sample (weight = n_chars),
    deterministic: priority = md5-uniform(doc_id) / weight, keep the
    k=25 smallest. The priority uses only hex-fold, division and
    IEEE-correctly-rounded ops, so DuckDB reproduces it bit-exactly
    (an exact Efraimidis–Spirakis u^(1/w) key would hit cross-engine
    pow() ulp skew). Global top-k = per-partition top-k then a
    25-row merge — no global sort at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    v = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("double")
    pri = docs.select(
        "doc_id",
        "n_chars",
        (v / F.lit(float(16**12)) / F.col("n_chars")).alias("priority"),
    )
    return pri.orderBy("priority", "doc_id").limit(_SAMPLE_K)


# --------------------------------------------------------------------------
# Point-in-time dimension lookup against the SCD2 history.
# --------------------------------------------------------------------------

_SCD2_CTE = """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts AS valid_from, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    hist AS (
        SELECT user_id, event_type AS state, valid_from,
               LEAD(valid_from) OVER (
                   PARTITION BY user_id ORDER BY valid_from, event_id
               ) AS valid_to
        FROM changes
    )
"""


@query(
    "j15_scd2_point_in_time",
    survey="beyond:point-in-time-join,J7",
    priority=60,
    oracle=_SCD2_CTE
    + """
    SELECT p.event_id AS purchase_id, p.user_id, p.ts,
           h.state AS prior_state, h.valid_from AS state_since
    FROM events p
    LEFT JOIN hist h
      ON h.user_id = p.user_id
     AND h.valid_from < p.ts
     AND (h.valid_to IS NULL OR h.valid_to >= p.ts)
    WHERE p.event_type = 'purchase'
    """,
)
def j15_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase joins the SCD2
    state interval in effect STRICTLY BEFORE it (the state the user
    was in when they bought — the feature-store correctness rule that
    prevents training-time leakage). Intervals are half-open and
    disjoint, so the (user equi-key + residual range) join matches at
    most one row; a user's first-ever event yields NULL prior state.
    The equi-key carries the shuffle — the range predicate is a
    residual filter, never a BNLJ."""
    hist = scd2_user_state(spark, sf_dir).select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("prior_state"),
        F.col("valid_from").alias("state_since"),
        "valid_to",
    )
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    joined = p.join(
        hist,
        (p.user_id == hist.h_user)
        & (hist.state_since < p.ts)
        & (hist.valid_to.isNull() | (hist.valid_to >= p.ts)),
        "left",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        "prior_state",
        "state_since",
    )


# --------------------------------------------------------------------------
# Chi-square independence test on a contingency table.
# --------------------------------------------------------------------------


@query(
    "stats_chi_square",
    survey="beyond:chi-square,A1",
    priority=60,
    oracle="""
    WITH obs AS (
        SELECT event_type,
               CAST((CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) + 4) % 7
                    AS INTEGER) AS dow,
               COUNT(*) AS o
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
    ct AS (SELECT dow, SUM(o) AS c FROM obs GROUP BY 1),
    n AS (SELECT SUM(o) AS n FROM obs),
    terms AS (
        SELECT CAST(
                 (obs.o - rt.r * 1.0 * ct.c / n.n)
               * (obs.o - rt.r * 1.0 * ct.c / n.n)
               / (rt.r * 1.0 * ct.c / n.n) AS DECIMAL(27,6)) AS t
        FROM obs JOIN rt USING (event_type) JOIN ct USING (dow)
        CROSS JOIN n
    )
    SELECT CAST(ROUND(SUM(t), 4) AS DOUBLE) AS chi2,
           (SELECT (COUNT(DISTINCT event_type) - 1)
                 * (COUNT(DISTINCT dow) - 1)
            FROM obs) AS df
    FROM terms
    """,
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of event_type ×
    day-of-week — 'is traffic mix stable across the week', the
    canonical drift/independence screen. Everything reduces to the
    contingency counts (one map-side-combinable aggregate; the shuffle
    carries ≤ r×c groups however large the input); expected counts and
    per-cell terms are deterministic double arithmetic on exact
    integers, quantized to decimal before the final 35-term sum. The
    day-of-week comes from epoch arithmetic, not locale-dependent
    date-part functions."""
    ev = load_table(spark, sf_dir, "events")
    dow = (
        (F.floor(F.unix_timestamp("ts") / 86400).cast("long") + 4) % 7
    ).cast("int")
    obs = ev.groupBy(
        F.col("event_type"), dow.alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    e = F.col("r") * 1.0 * F.col("c") / F.col("n")
    terms = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            ((F.col("o") - e) * (F.col("o") - e) / e)
            .cast("decimal(27,6)")
            .alias("t")
        )
    )
    df_count = obs.agg(
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("dow") - 1)
        ).alias("df")
    )
    chi2 = terms.agg(
        F.round(F.sum("t"), 4).cast("double").alias("chi2")
    )
    return chi2.crossJoin(F.broadcast(df_count)).select("chi2", "df")
