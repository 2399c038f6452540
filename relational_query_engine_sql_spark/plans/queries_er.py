"""Entity resolution (record linkage) — the dirty-catalog pipeline:
normalize → exact collapse → blocked fuzzy match → cluster →
per-entity rollup.

Skew is the defining problem here: the driver's part catalog has only
64 distinct names over up to hundreds of thousands of rows, so any
pairwise matcher that runs on RECORDS goes quadratic inside the hot
name groups (measured: 3.1M name-equal pairs at sf0.1). The
scale-correct shape — and the one implemented — collapses exact
duplicates FIRST (one keyed aggregate, linear), runs the fuzzy stage
on DISTINCT names only (weights carried as counts), and lets
connected components stitch fuzzy-linked name groups into entities.
At 100 TB the fuzzy stage's input is the distinct-value table, orders
of magnitude smaller than the record stream; blocking on the first
name token keeps its self-join an equi-join.

Clean TPC-H data has no typos, so the catalog is derived: parts UNION
a clone of every 20th part with a deterministic single-character
deletion near the end of the name (the first token — the blocking
key — is untouched, so planted variants stay inside their block; both engines build the
same derivation — the derived-table pattern from queries_tpch.py).
The oracle resolves components with a recursive CTE, as
dedup_semantic_clusters does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table, spread
from .registry import query

_ER_OFFSET = 10_000_000
_ER_EVERY = 20  # clone every 20th part (5% planted dirty rows)
_ER_MAXDIST = 2

_DIRTY_SQL = f"""
    base AS (
        SELECT p_partkey AS rec_id, TRIM(p_name) AS name FROM part
    ),
    dirty AS (
        SELECT rec_id, name FROM base
        UNION ALL
        SELECT rec_id + {_ER_OFFSET},
               SUBSTR(name, 1, LEN(name) - 3)
               || SUBSTR(name, LEN(name) - 1, 2)
        FROM base WHERE rec_id % {_ER_EVERY} = 0
    )
"""


def _dirty_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = spread(load_table(spark, sf_dir, "part"), spark).select(
        F.col("p_partkey").alias("rec_id"), F.trim("p_name").alias("name")
    )
    ln = F.length("name")
    typo = F.concat(
        F.substring(F.col("name"), 1, ln - 3),
        F.col("name").substr(ln - 1, F.lit(2)),
    )
    clones = part.filter(F.col("rec_id") % _ER_EVERY == 0).select(
        (F.col("rec_id") + _ER_OFFSET).alias("rec_id"), typo.alias("name")
    )
    return part.unionByName(clones)


@query(
    "er_resolve_entities",
    survey="beyond:entity-resolution",
    priority=60,
    oracle=f"""
    WITH RECURSIVE {_DIRTY_SQL},
    names AS (
        SELECT name, MIN(rec_id) AS nid, COUNT(*) AS n_recs
        FROM dirty GROUP BY name
    ),
    keyed AS (
        SELECT name, nid, n_recs,
               split_part(name, ' ', 1) AS tok1,
               LEN(name) AS ln
        FROM names
    ),
    links AS (
        SELECT a.nid AS s, b.nid AS d
        FROM keyed a
        JOIN keyed b
          ON a.tok1 = b.tok1
         AND a.nid < b.nid
         AND ABS(a.ln - b.ln) <= {_ER_MAXDIST}
        WHERE levenshtein(a.name, b.name) <= {_ER_MAXDIST}
    ),
    edges AS (
        SELECT s AS a, d AS b FROM links
        UNION
        SELECT d, s FROM links
    ),
    reach AS (
        SELECT a AS node, b AS peer FROM edges
        UNION
        SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.peer
    ),
    labels AS (
        SELECT node, LEAST(node, MIN(peer)) AS label
        FROM reach GROUP BY node
    )
    SELECT COALESCE(l.label, k.nid) AS entity,
           COUNT(*) AS n_names,
           CAST(SUM(k.n_recs) AS BIGINT) AS n_records
    FROM keyed k
    LEFT JOIN labels l ON l.node = k.nid
    GROUP BY 1
    """,
)
def er_resolve_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolved entities over the dirty catalog: one row per entity
    cluster with its distinct-name and record counts. Every planted
    typo variant resolves into its source name's entity (edit
    distance 1, shared blocking token)."""
    from ..operators.graph import connected_components

    names = (
        _dirty_catalog(spark, sf_dir)
        .groupBy("name")
        .agg(
            F.min("rec_id").alias("nid"),
            F.count(F.lit(1)).alias("n_recs"),
        )
        # pin the distinct-name table (the whole point of the
        # names-first design is that it is TINY — 128 rows at sf0.1,
        # bounded by the value domain at any SF): without the cut both
        # the edge generator and the final rollup re-scan and
        # re-aggregate the record stream
        .localCheckpoint(eager=True)
    )
    keyed = names.select(
        "name",
        "nid",
        "n_recs",
        F.split(F.col("name"), " ").getItem(0).alias("tok1"),
        F.length("name").alias("ln"),
    )
    a = keyed.select(
        F.col("nid").alias("s"),
        F.col("name").alias("name_a"),
        "tok1",
        F.col("ln").alias("ln_a"),
    )
    b = keyed.select(
        F.col("nid").alias("d"),
        F.col("name").alias("name_b"),
        "tok1",
        F.col("ln").alias("ln_b"),
    )
    links = (
        a.join(b, ["tok1"])
        .filter(
            (F.col("s") < F.col("d"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= _ER_MAXDIST)
            & (F.levenshtein("name_a", "name_b") <= _ER_MAXDIST)
        )
        .select("s", "d")
    )
    labels = connected_components(links, src="s", dst="d")
    return (
        keyed.join(labels, keyed["nid"] == labels["node"], "left")
        .select(
            F.coalesce("label", "nid").alias("entity"),
            "n_recs",
        )
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n_names"),
            F.sum("n_recs").alias("n_records"),
        )
    )


# --------------------------------------------------------------------------
# Survivorship (golden-record construction) — the step after entity
# resolution in any MDM/CDC pipeline: merge every entity's record
# versions into one best row, per-attribute "latest non-null wins".
# The derived dirty feed: customers as version 1 UNION an update for
# every 10th customer as version 2 carrying a fresher balance but a
# MISSING segment (the classic partial update). The merge is ONE
# keyed aggregate — per column, max_by(value, version) restricted to
# non-null values via a null ordering key (rows whose ordering key is
# NULL are skipped by max_by in both engines) — so survivorship costs
# a single shuffle regardless of version depth.
# --------------------------------------------------------------------------
@query(
    "er_survivorship",
    survey="beyond:survivorship,S5",
    priority=60,
    oracle="""
    WITH versions AS (
        SELECT c_custkey, 1 AS ver, c_name, c_nationkey, c_acctbal,
               c_mktsegment
        FROM customer
        UNION ALL
        SELECT c_custkey, 2, c_name, c_nationkey, c_acctbal + 100.0,
               CAST(NULL AS VARCHAR)
        FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey,
           MAX_BY(c_name, CASE WHEN c_name IS NOT NULL
                               THEN ver END) AS c_name,
           MAX_BY(c_nationkey, CASE WHEN c_nationkey IS NOT NULL
                                    THEN ver END) AS c_nationkey,
           MAX_BY(c_acctbal, CASE WHEN c_acctbal IS NOT NULL
                                  THEN ver END) AS c_acctbal,
           MAX_BY(c_mktsegment, CASE WHEN c_mktsegment IS NOT NULL
                                     THEN ver END) AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_versions
    FROM versions
    GROUP BY c_custkey
    """,
)
def er_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spread(load_table(spark, sf_dir, "customer"), spark)
    v1 = cust.select(
        "c_custkey",
        F.lit(1).alias("ver"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    v2 = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit(2).alias("ver"),
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
    )

    def best(c: str):
        return F.max_by(
            F.col(c), F.when(F.col(c).isNotNull(), F.col("ver"))
        ).alias(c)

    return (
        v1.unionByName(v2)
        .groupBy("c_custkey")
        .agg(
            best("c_name"),
            best("c_nationkey"),
            best("c_acctbal"),
            best("c_mktsegment"),
            F.count(F.lit(1)).alias("n_versions"),
        )
    )


# --------------------------------------------------------------------------
# k-anonymity audit: how re-identifiable is a release keyed by the
# quasi-identifiers (nation, market segment, balance rounded to
# 1000s)? Rows whose QI group has fewer than k members are at risk.
# One keyed aggregate + one scalar rollup — integer outputs only, so
# the audit is bit-deterministic. The balance bucket floors an exact
# 2-decimal double divided by 1000; exact multiples of 1000 are
# representable, so both engines bucket identically.
# --------------------------------------------------------------------------
_KANON_K = 5


@query(
    "dq_k_anonymity",
    survey="beyond:privacy-audit",
    priority=60,
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               COUNT(*) AS grp
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT {_KANON_K} AS k,
           COUNT(*) AS n_groups,
           CAST(COALESCE(SUM(CASE WHEN grp < {_KANON_K} THEN 1 END), 0)
                AS BIGINT) AS n_risky_groups,
           CAST(COALESCE(SUM(CASE WHEN grp < {_KANON_K} THEN grp END), 0)
                AS BIGINT) AS n_risky_rows,
           CAST(MIN(grp) AS BIGINT) AS min_group
    FROM qi
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("grp"))
    risky = F.col("grp") < _KANON_K
    return qi.agg(
        F.lit(_KANON_K).alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(
            F.sum(F.when(risky, 1)), F.lit(0)
        ).cast("long").alias("n_risky_groups"),
        F.coalesce(
            F.sum(F.when(risky, F.col("grp"))), F.lit(0)
        ).cast("long").alias("n_risky_rows"),
        F.min("grp").cast("long").alias("min_group"),
    )


# --------------------------------------------------------------------------
# Clean-room join: two parties share only SALTED HASHES of the join
# key (orders side and customer side both compute
# md5(salt || custkey)), and the analysis joins on the token — the
# standard privacy-preserving data-collaboration pattern. The point
# the query proves: a deterministic keyed tokenization PRESERVES the
# join (token equality ⟺ key equality, modulo negligible md5
# collisions), so aggregates over the tokenized join equal the
# raw-key join's aggregates. Plan shape is identical to the raw join
# — the token is just as shuffle-keyable; revenue quantizes to
# decimal before summing.
# --------------------------------------------------------------------------
@query(
    "sec_cleanroom_join",
    survey="beyond:cleanroom-join",
    priority=60,
    oracle="""
    WITH a AS (
        SELECT md5('cr-salt|' || CAST(o_custkey AS VARCHAR)) AS token,
               o_totalprice
        FROM orders
    ),
    b AS (
        SELECT md5('cr-salt|' || CAST(c_custkey AS VARCHAR)) AS token,
               c_mktsegment
        FROM customer
    )
    SELECT b.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(a.o_totalprice AS DECIMAL(27,6))), 2)
                AS DOUBLE) AS revenue
    FROM a JOIN b USING (token)
    GROUP BY b.c_mktsegment
    """,
)
def sec_cleanroom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    def token(col: str):
        return F.md5(
            F.concat(F.lit("cr-salt|"), F.col(col).cast("string"))
        ).alias("token")

    a = load_table(spark, sf_dir, "orders").select(
        token("o_custkey"), "o_totalprice"
    )
    b = load_table(spark, sf_dir, "customer").select(
        token("c_custkey"), "c_mktsegment"
    )
    return (
        a.join(b, "token")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(27,6)")), 2
            )
            .cast("double")
            .alias("revenue"),
        )
    )
