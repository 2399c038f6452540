"""Privacy-preserving release: ε-differentially-private noisy counts.

The standard Laplace mechanism for count queries (sensitivity 1,
noise ~ Laplace(1/ε)) with the noise SEEDED from a hash of the group
key instead of an RNG: u = md5-uniform in (0,1), noise = the Laplace
inverse CDF at u. Seeding makes the release reproducible and
cross-engine testable — a production release swaps the seed source
for a CSPRNG and keeps the plan (one keyed aggregate + per-row
expression arithmetic, no extra shuffle, no Python).

Noise determinism: u has 16 bits of granularity from 4 md5 hex
digits (offset by 1/2 LSB so ln never sees 0), the inverse CDF is
one ln() and one multiply, and the result is rounded to 6 dp before
the noisy count is formed — the same rounded-before-use policy every
float query in the registry follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_DP_EPS = 1.0  # Laplace scale b = 1/ε


def _u_spark(key):
    """md5-seeded uniform in (0,1): 4 hex digits + half-LSB offset."""
    h = F.md5(F.concat(F.lit("dp|"), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("double") + 0.5
    ) / 65536.0


_HX = "0123456789abcdef"


def _u_sql(key_expr: str) -> str:
    h = f"md5('dp|' || CAST({key_expr} AS VARCHAR))"
    digits = " + ".join(
        f"(strpos('{_HX}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({digits}) + 0.5) / 65536.0"


@query(
    "dp_noisy_counts",
    survey="beyond:differential-privacy",
    priority=60,
    oracle=f"""
    WITH counts AS (
        SELECT c_nationkey, COUNT(*) AS n_true
        FROM customer GROUP BY c_nationkey
    ),
    seeded AS (
        SELECT c_nationkey, n_true, {_u_sql('c_nationkey')} AS u
        FROM counts
    ),
    noised AS (
        SELECT c_nationkey, n_true,
               ROUND(CASE WHEN u < 0.5
                          THEN (1.0 / {_DP_EPS}) * LN(2 * u)
                          ELSE -(1.0 / {_DP_EPS}) * LN(2 * (1 - u)) END,
                     6) AS noise
        FROM seeded
    )
    SELECT c_nationkey, n_true, noise,
           ROUND(n_true + noise, 6) AS n_noisy
    FROM noised
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 DP release of per-nation customer counts; the true count
    rides along as the evaluation column (a real release drops it)."""
    counts = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    b = 1.0 / _DP_EPS
    u = _u_spark(F.col("c_nationkey"))
    noise = F.round(
        F.when(u < 0.5, b * F.log(2 * u)).otherwise(
            -b * F.log(2 * (1 - u))
        ),
        6,
    )
    return counts.select(
        "c_nationkey",
        "n_true",
        noise.alias("noise"),
        F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
    )
