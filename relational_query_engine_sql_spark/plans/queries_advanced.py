"""Advanced analytics operators: recursion, graph motifs, anomaly
detection, histograms, and LLM context packing.

- ``sql_recursive_hierarchy``: the recursive-CTE operator class
  (DuckDB ``WITH RECURSIVE`` oracle) expressed Spark-side as an
  iterative frontier-join loop — Spark SQL has no recursive CTE, so
  the engine provides the same semantics as O(depth) keyed equi-joins.
  The hierarchy is derived (parent = ⌊suppkey/2⌋, a binary tree over
  the supplier table) so both engines recurse over identical data.
  At 100 TB the frontier join is a plain shuffle equi-join per level
  and depth is logarithmic in table size; each level's result feeds
  AQE, which broadcasts the frontier while it is small.

- ``graph_triangle_count``: triangle motif counting on a derived
  undirected graph — the canonical "does your join planner survive a
  self-join fan-out" test. Edges are oriented a<b and triangles are
  counted as a<b<c paths closed by a third edge, so each triangle is
  produced exactly once and the worst skew (high-degree hubs
  generating wedge explosion) is capped by the orientation — the
  standard degree-ordering trick from the Suri/Vassilvitskii MR
  triangle literature, expressed as two shuffle equi-joins.

- ``ts_anomaly_zscore``: rolling z-score anomaly detection over the
  events stream — per-user ROWS-frame mean/stddev of the trailing 20
  values (excluding current), flag |z| > 3. One window shuffle keyed
  by user; at 100 TB the per-user state is a bounded 20-row frame, so
  memory is O(frame), not O(history).

- ``ext_histogram_buckets``: equi-width histogram via Spark's
  ``width_bucket`` against the oracle's explicit floor arithmetic —
  same double math on both sides. A single map-side-combinable
  aggregate: the scan emits (bucket, 1) and the shuffle carries at
  most n_buckets+2 groups regardless of input size.

- ``pack_context_windows``: concat-and-chop LLM packing — documents
  are laid end-to-end per source shard in deterministic order and
  sliced into fixed 512-token context windows; a document whose span
  crosses a boundary straddles two bins (exactly what block-packing
  training pipelines do). Pure window cumulative sums — no Python,
  no sequential fold: bin ids are closed-form from the exclusive
  running token total. Partitioned by source so each shard packs
  independently — the 100 TB layout keys the window by shard, never
  a global sort.

- ``text_ngram_topk``: top-k bigrams per language by document
  frequency — array slicing + zip builds bigrams JVM-side (no
  explode-join), rank ties broken lexicographically so the result is
  deterministic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# --------------------------------------------------------------------------
# Recursive hierarchy: iterative frontier loop vs WITH RECURSIVE.
# --------------------------------------------------------------------------


@query(
    "sql_recursive_hierarchy",
    survey="ext:recursive-cte",
    oracle="""
    WITH RECURSIVE h AS (
        SELECT s_suppkey, 0 AS depth
        FROM supplier WHERE s_suppkey = 0
        UNION ALL
        SELECT s.s_suppkey, h.depth + 1
        FROM supplier s
        JOIN h ON CAST(FLOOR(s.s_suppkey / 2) AS BIGINT) = h.s_suppkey
        WHERE s.s_suppkey > 0
    )
    SELECT s_suppkey, depth FROM h
    """,
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth of every node in the derived parent=⌊k/2⌋ supplier tree.

    Spark has no recursive CTE, so the recursion unrolls into a
    frontier loop: level i joins the (small) level-i frontier against
    the child table on the parent key. Termination is data-driven
    (empty frontier), depth is O(log n) levels. Reference analog: the
    reference engine's SQL surface is non-recursive too
    (sql/schema.sql has no hierarchical tables); this is the standard
    extension an analytics engine adds on top.
    """
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.floor(F.col("s_suppkey") / 2).cast("long").alias("parent"),
    )
    frontier = sup.filter(F.col("s_suppkey") == 0).select(
        "s_suppkey", F.lit(0).alias("depth")
    )
    levels = [frontier]
    while True:
        nxt = (
            sup.filter(F.col("s_suppkey") > 0)
            .join(
                frontier.select(
                    F.col("s_suppkey").alias("parent"),
                    F.col("depth").alias("pdepth"),
                ),
                "parent",
            )
            .select("s_suppkey", (F.col("pdepth") + 1).alias("depth"))
        )
        # The frontier is at most half the remaining tree; a count()
        # per level is the loop condition (log n of them total).
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
    return reduce(lambda a, b: a.unionByName(b), levels)


# --------------------------------------------------------------------------
# Triangle counting on a derived co-key graph.
# --------------------------------------------------------------------------

_TRI_NODES = 200

_EDGE_SQL = f"""
    edges AS (
        SELECT DISTINCT
               l_partkey % {_TRI_NODES} AS a,
               l_suppkey % {_TRI_NODES} AS b
        FROM lineitem
        WHERE l_partkey % {_TRI_NODES} < l_suppkey % {_TRI_NODES}
    )
"""


@query(
    "graph_triangle_count",
    survey="beyond:graph-triangles",
    oracle=f"""
    WITH {_EDGE_SQL}
    SELECT COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.b = e2.a
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count triangles a<b<c. Orientation (every edge stored a<b)
    means each triangle closes exactly one wedge, and wedge counts are
    bounded by out-degree under the orientation — the skew cap that
    makes this plan survive hub nodes at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_partkey") % _TRI_NODES).alias("a"),
            (F.col("l_suppkey") % _TRI_NODES).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a"))
    tris = wedges.join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    )
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))


# --------------------------------------------------------------------------
# Rolling z-score anomaly detection over events.
# --------------------------------------------------------------------------

_Z_FRAME = 20
_Z_MIN_OBS = 10
_Z_CUT = 3.0


@query(
    "ts_anomaly_zscore",
    survey="beyond:anomaly-zscore",
    oracle=f"""
    WITH scored AS (
        SELECT event_id, user_id, value,
               AVG(value) OVER w AS mu,
               STDDEV_SAMP(value) OVER w AS sigma,
               COUNT(*) OVER w AS n_obs
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {_Z_FRAME} PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_id, user_id,
           ROUND((value - mu) / sigma, 4) AS z
    FROM scored
    WHERE n_obs >= {_Z_MIN_OBS} AND sigma > 0
      AND ABS(ROUND((value - mu) / sigma, 4)) > {_Z_CUT}
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is > 3 rolling standard deviations from the
    trailing-20 mean of their user's stream. The boundary predicate
    compares the ROUNDED z on both sides so a 1-ulp summation
    difference between engines cannot flip membership."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_FRAME, -1)
    )
    scored = ev.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_obs"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        scored.filter(
            (F.col("n_obs") >= _Z_MIN_OBS) & (F.col("sigma") > 0)
        )
        .select("event_id", "user_id", z.alias("z"))
        .filter(F.abs(F.col("z")) > _Z_CUT)
    )


# --------------------------------------------------------------------------
# Equi-width histogram via width_bucket.
# --------------------------------------------------------------------------

_H_LO, _H_HI, _H_N = 0.0, 600_000.0, 24


@query(
    "ext_histogram_buckets",
    survey="ext:histogram",
    oracle=f"""
    SELECT CAST(LEAST(FLOOR(CAST(o_totalprice AS DOUBLE)
                            / {(_H_HI - _H_LO) / _H_N}) + 1,
                      {_H_N + 1}) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    """,
)
def ext_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket on the Spark side vs explicit floor arithmetic in
    the oracle — identical double math (bucket width is exactly
    25000.0). The aggregate is map-side combinable into at most
    n_buckets+2 groups, so the shuffle is O(buckets) at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket(
                F.col("o_totalprice").cast("double"),
                F.lit(_H_LO),
                F.lit(_H_HI),
                F.lit(_H_N),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Concat-and-chop context packing for LLM training.
# --------------------------------------------------------------------------

_CTX = 512


@query(
    "pack_context_windows",
    survey="beyond:context-packing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               LENGTH(string_split_regex(TRIM(text), '\\s+')) AS n_tok
        FROM documents
    ),
    laid AS (
        SELECT doc_id, source, n_tok,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS off
        FROM toks
    )
    SELECT doc_id, source,
           CAST(FLOOR(off / {_CTX}) AS BIGINT) AS bin_id,
           CAST(FLOOR(off / {_CTX}) <>
                FLOOR((off + n_tok - 1) / {_CTX}) AS BOOLEAN)
               AS straddles
    FROM laid
    WHERE n_tok > 0
    """,
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document its starting 512-token context window under
    concat-and-chop packing (documents laid end-to-end per source in
    doc_id order, then sliced every 512 tokens — block packing as used
    by GPT-style pretraining loaders). The bin id is closed-form from
    the EXCLUSIVE running token total, so the whole operator is one
    partitioned window cumsum — no sequential fold, no Python. At
    100 TB the pack key is the shard (here: source), so no global
    ordering is ever required."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    laid = toks.select(
        "doc_id",
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("off"),
    )
    first_bin = F.floor(F.col("off") / _CTX)
    last_bin = F.floor((F.col("off") + F.col("n_tok") - 1) / _CTX)
    return laid.filter(F.col("n_tok") > 0).select(
        "doc_id",
        "source",
        first_bin.cast("long").alias("bin_id"),
        (first_bin != last_bin).alias("straddles"),
    )


# --------------------------------------------------------------------------
# Top-k bigrams per language.
# --------------------------------------------------------------------------

_NGRAM_K = 10


@query(
    "text_ngram_topk",
    survey="beyond:ngram-topk",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, lang,
               string_split_regex(LOWER(TRIM(text)), '\\s+') AS ws
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, lang,
               UNNEST(list_transform(
                   list_zip(ws[1:-2], ws[2:-1]),
                   p -> p[1] || ' ' || p[2])) AS bigram
        FROM words
        WHERE LENGTH(ws) >= 2
    ),
    counted AS (
        SELECT lang, bigram, COUNT(*) AS n_docs,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY COUNT(*) DESC, bigram
               ) AS rnk
        FROM grams
        GROUP BY lang, bigram
    )
    SELECT lang, bigram, n_docs, rnk
    FROM counted
    WHERE rnk <= {_NGRAM_K}
    """,
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 bigrams per language by document frequency. Bigram
    construction is pure JVM array algebra (slice + zip), doc-level
    dedup happens before counting, and ties rank lexicographically so
    the result is deterministic. The per-lang window runs over the
    already-aggregated (lang, bigram) counts — small relative to the
    corpus — so the expensive shuffle is the single count aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    words = docs.select("doc_id", "lang", ws.alias("ws")).filter(
        F.size("ws") >= 2
    )
    n = F.size("ws")
    bigrams = words.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, n - 1),
                F.slice(F.col("ws"), 2, n - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        ).alias("bigram"),
    ).distinct()
    counted = bigrams.groupBy("lang", "bigram").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    wr = W.partitionBy("lang").orderBy(
        F.col("n_docs").desc(), F.col("bigram")
    )
    return (
        counted.select(
            "lang", "bigram", "n_docs", F.row_number().over(wr).alias("rnk")
        )
        .filter(F.col("rnk") <= _NGRAM_K)
    )


# --------------------------------------------------------------------------
# PageRank, fixed 5 iterations, on the symmetrized derived graph.
# Spark: the canonical iterative rank loop — per iteration one join of
# the rank frame against the (checkpointed) edge list and one
# aggregate keyed by destination; ranks stay O(nodes). The oracle
# replays the identical recursion in a recursive CTE with an
# iteration counter (DuckDB permits aggregation in the recursive
# term), so the cross-engine row hash pins every iteration's
# arithmetic, not just the fixpoint shape. No dangling nodes by
# construction (nodes are defined from the symmetric edge set, degree
# >= 1).
# --------------------------------------------------------------------------
_PR_ITERS = 5
_PR_DAMP = 0.85


@query(
    "graph_pagerank_fixed",
    survey="beyond:graph-pagerank",
    priority=60,
    oracle=f"""
    WITH RECURSIVE {_EDGE_SQL},
    sym AS (
        SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges
    ),
    deg AS (SELECT a, COUNT(*) AS d FROM sym GROUP BY a),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    pr AS (
        SELECT 0 AS it, a AS node, 1.0 / (SELECT n FROM nn) AS r
        FROM deg
        UNION ALL
        SELECT p.it + 1, s.b AS node,
               {1 - _PR_DAMP} / (SELECT n FROM nn)
                   + {_PR_DAMP} * SUM(p.r / d.d)
        FROM pr p
        JOIN sym s ON s.a = p.node
        JOIN deg d ON d.a = p.node
        WHERE p.it < {_PR_ITERS}
        GROUP BY p.it + 1, s.b
    )
    SELECT node, ROUND(r, 6) AS rank
    FROM pr WHERE it = {_PR_ITERS}
    """,
)
def graph_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_partkey") % _TRI_NODES).alias("a"),
            (F.col("l_suppkey") % _TRI_NODES).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)  # edges read 5x: pin them once
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    n = deg.count()
    ranks = deg.select("a", F.lit(1.0 / n).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            sym.join(ranks, "a")
            .join(deg, "a")
            .select(F.col("b").alias("node"), (F.col("r") / F.col("d")).alias("c"))
        )
        ranks = (
            contrib.groupBy("node")
            .agg(
                (
                    F.lit((1 - _PR_DAMP) / n)
                    + F.lit(_PR_DAMP) * F.sum("c")
                ).alias("r")
            )
            .select(F.col("node").alias("a"), "r")
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("a").alias("node"), F.round("r", 6).alias("rank")
    )
