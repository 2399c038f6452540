"""Skew-mitigation operators.

AQE's skew-join splitting (on in session.py) handles most runtime skew,
but a groupBy on a power-law key (a handful of keys owning most rows —
the shape of event types, hot symbols, stop-shingles at 100 TB) can
still bottleneck single reducers. Salted aggregation is the classic
fix: shard each key across ``buckets`` sub-keys, partially aggregate,
then merge the partials — two narrow shuffles instead of one skewed one.

The salt is ``pmod(hash(<salt_col>), buckets)`` — deterministic (no
rand(), which would break retry/speculation consistency and oracle
checks), and derived from a high-cardinality column so each hot key
spreads evenly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    salt_col: str,
    value_col: str | None = None,
    buckets: int = 16,
) -> DataFrame:
    """groupBy(keys) computing COUNT(*) (and SUM(value_col)) through a
    two-stage salted plan. Result is identical to the direct groupBy —
    count/sum are commutative monoids, so partial-merge is exact.

    Output: keys + n (+ total when ``value_col`` given, rounded to 4).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_col)), F.lit(buckets))
    )
    partial_aggs = [F.count(F.lit(1)).alias("_pn")]
    if value_col is not None:
        # decimal partials: the two-stage sum stays exact and
        # order-independent (bit-reproducible vs the SQL oracle).
        partial_aggs.append(
            F.sum(F.col(value_col).cast("decimal(27,6)")).alias("_ps")
        )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)

    final_aggs: list[Column] = [F.sum("_pn").alias("n")]
    if value_col is not None:
        final_aggs.append(
            F.round(F.sum("_ps"), 4).cast("double").alias("total")
        )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Inner equi-join on ``key`` through a salted plan: the fact side
    gets a deterministic salt, the dim side is replicated across all
    ``buckets`` salt values, and the join key becomes (key, salt).

    Result rows are identical to ``fact.join(dim, key)`` — replication
    adds no matches (each fact row meets exactly the one dim replica
    carrying its salt) and drops none (every salt value has a replica).

    Why: a shuffle join on a low-cardinality / power-law key can use at
    most |distinct keys| reducers — 5 hot event types means 5 active
    tasks on a 1000-executor cluster. Salting multiplies the effective
    key space by ``buckets`` so each hot key spreads over ``buckets``
    tasks, at the cost of replicating the (small but
    beyond-broadcast-threshold) dim side ``buckets``×. Broadcast is
    strictly better when the dim fits in memory; salting is the tool
    for the middle regime. AQE's skew splitting covers sort-merge
    spills, not the key-cardinality ceiling — salting fixes the
    ceiling itself.

    The salt is ``pmod(hash(salt_col), buckets)`` — deterministic (no
    rand(): retries/speculative tasks must re-derive identical salts).
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_col)), F.lit(buckets))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    # shuffle_hash hint: the point of the demonstration is the
    # distributed-shuffle plan (a tiny test dim would otherwise be
    # auto-broadcast, which makes salting moot).
    joined = salted_fact.join(
        replicated_dim.hint("shuffle_hash"), [key, "_salt"]
    )
    return joined.drop("_salt")
