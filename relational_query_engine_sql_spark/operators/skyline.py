"""Distributed 2-D skyline (Pareto frontier) operator.

A point survives the skyline under (minimize ``lo``, maximize ``hi``)
iff no other point weakly improves both dimensions and strictly
improves at least one:

    dominated(a) := exists b with b.lo <= a.lo AND b.hi >= a.hi
                    AND (b.lo < a.lo OR b.hi > a.hi)

Exact duplicates on (lo, hi) do not dominate each other — all copies
of a frontier point survive, matching the NOT EXISTS relational
formulation.

The naive plan is a quadratic dominance self-join (the classic
skyline-at-scale killer — BroadcastNestedLoopJoin over the full
table). This module uses the standard two-phase distributed algorithm
instead:

1. **Local prefilter** (map-side, zero shuffle): each partition drops
   its locally-dominated rows with a vectorized sort + running-max
   inside ``mapInPandas``. Local dominance implies global dominance,
   and dominance is transitive, so the survivor set always contains
   the exact global skyline. For non-adversarial data the local
   skyline is tiny (O(log n) expected for independent dimensions), so
   ~all of a 100 TB input dies map-side.
2. **Exact global pass** (skyline-sized): group survivors by ``lo``,
   take each group's max ``hi``, and keep the groups whose max ``hi``
   strictly exceeds the running max over all strictly-smaller ``lo``
   (one window over the distinct-``lo`` rows — already collapsed far
   below input size). Joining survivors back against the frontier
   keys (broadcast — frontiers are small by nature) restores the full
   rows, including (lo, hi)-duplicates.

Phase 2 alone is exact; phase 1 only shrinks its input, so
correctness never depends on the prefilter dropping anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def local_skyline_prefilter(df: DataFrame, lo: str, hi: str) -> DataFrame:
    """Drop rows dominated WITHIN their partition (exact semantics,
    conservative globally). Map-side only — no shuffle."""
    schema = df.schema

    def _part(it):
        # each Arrow batch is filtered independently: dominance inside
        # a batch implies global dominance, so per-batch filtering is
        # still conservative (and keeps peak memory at batch size)
        for pdf in it:
            if not len(pdf):
                continue
            s = pdf.sort_values([lo, hi], ascending=[True, False])
            # survivor test, vectorized: a row lives iff its hi equals
            # its lo-group's max AND that max strictly beats the
            # running max over all strictly-smaller lo groups
            grp_max = s.groupby(lo, sort=False)[hi].transform("max")
            firsts = ~s[lo].duplicated()  # group head = group max (desc)
            heads = s.loc[firsts, [lo, hi]]
            prev_by_lo = dict(
                zip(heads[lo], heads[hi].cummax().shift(1))
            )
            prev = s[lo].map(prev_by_lo)
            keep = (s[hi] == grp_max) & (prev.isna() | (s[hi] > prev))
            out = s[keep]
            if len(out):
                yield out

    return df.mapInPandas(_part, schema)


def skyline(df: DataFrame, lo: str, hi: str) -> DataFrame:
    """Exact global skyline of ``df`` under (min ``lo``, max ``hi``).

    Null measures are excluded (dominance is undefined on null).
    Returns the original rows (all columns), duplicates preserved.
    """
    base = df.filter(F.col(lo).isNotNull() & F.col(hi).isNotNull())
    survivors = local_skyline_prefilter(base, lo, hi)

    groups = survivors.groupBy(lo).agg(F.max(hi).alias("_sky_hi"))
    w = Window.orderBy(F.col(lo).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        groups.withColumn("_prev", F.max("_sky_hi").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_sky_hi") > F.col("_prev")))
        .select(F.col(lo).alias("_sky_lo"), "_sky_hi")
    )
    return survivors.join(
        F.broadcast(frontier),
        on=[
            F.col(lo) == F.col("_sky_lo"),
            F.col(hi) == F.col("_sky_hi"),
        ],
    ).select(*df.columns)
