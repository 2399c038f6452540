"""Z-order (Morton) data layout: multi-dimensional clustering.

Sorting a 100 TB fact table by ONE key gives tight parquet row-group
min/max bounds on that key only; filters on a second key still scan
everything. Interleaving the bits of two keys into a Morton code and
sorting by THAT bounds every z-prefix "page" in BOTH dimensions at
once (a z-prefix bucket is a quadtree cell), so row-group statistics
prune scans on either column. This is the layout trick behind
Delta/Iceberg Z-ORDER clustering, expressed here as plain Spark
column algebra — shift/mask terms the codegen fuses into one
projection, no UDF.

Raw keys interleave badly when their value ranges differ (a 150-value
key zipped against a 6 000-value key contributes only dead high bits),
so dimensions are first NORMALIZED to a common ``Z_BITS``-bit grid
with pure integer arithmetic — ``((v - min) * (2^bits - 1)) div
(max - min)`` — the distributed analog of the rank-first step real
Z-ORDER implementations use. Min/max come from one aggregate whose
single row broadcasts; integer division keeps both engines
bit-identical.

The bit-interleave and normalization expressions are generated ONCE
and rendered both as PySpark Columns and as the equivalent SQL string
(:func:`zvalue_sql`), so the engine and the DuckDB oracle can never
drift on formula transcription.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 8  # bits per dimension after normalization (2 dims → 16-bit z)


def zvalue_nd(cols: list[Column], bits: int = Z_BITS) -> Column:
    """Morton code of N ``bits``-wide non-negative ints: column j's
    bit i lands at position i*N + j (round-robin interleave — the
    direct N-dimensional generalization; each z-prefix bucket is a
    2^N-tree cell bounding EVERY dimension at once). N*bits must fit
    a signed long, so N <= 7 at the default 8-bit grid."""
    n = len(cols)
    assert 2 <= n * bits <= 62, (n, bits)
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("long"), i).bitwiseAND(1), i * n + j
        )
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Two-dimensional Morton code (thin wrapper over zvalue_nd)."""
    return zvalue_nd([x, y], bits)


def zvalue_nd_sql(names: list[str], bits: int = Z_BITS) -> str:
    """The identical N-dim Morton expression as portable SQL text."""
    n = len(names)
    terms = [
        f"(({c} >> {i}) & 1) << {i * n + j}"
        for j, c in enumerate(names)
        for i in range(bits)
    ]
    return " | ".join(f"({t})" for t in terms)


def zvalue_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """Two-dimensional Morton SQL (thin wrapper over zvalue_nd_sql)."""
    return zvalue_nd_sql([x, y], bits)


def norm_expr(v: str, vmin: str, vmax: str, bits: int = Z_BITS) -> str:
    """SQL text: min/max-normalize ``v`` onto the 2^bits grid with
    integer arithmetic only (DuckDB ``//`` == Spark ``div``)."""
    top = (1 << bits) - 1
    return (
        f"CASE WHEN {vmax} = {vmin} THEN 0 "
        f"ELSE (({v} - {vmin}) * {top}) // ({vmax} - {vmin}) END"
    )


def zorder_key_nd(
    df: DataFrame, cols: list[str], bits: int = Z_BITS
) -> DataFrame:
    """Attach the normalized N-dimensional Morton key as column ``z``.

    One aggregate computes every dimension's min/max (single row,
    broadcast back); the normalization and interleave are a pure
    projection. Sorting/range-partitioning on ``z`` before a write
    yields a layout whose per-file stats bound EVERY listed column —
    Delta's multi-column ``OPTIMIZE ZORDER BY (a, b, c)``."""
    aggs = []
    for j, c in enumerate(cols):
        aggs.append(F.min(c).alias(f"_zmn{j}"))
        aggs.append(F.max(c).alias(f"_zmx{j}"))
    stats = df.agg(*aggs)
    top = (1 << bits) - 1
    with_stats = df.crossJoin(F.broadcast(stats))
    normed = [
        F.expr(
            f"CASE WHEN _zmx{j} = _zmn{j} THEN 0 "
            f"ELSE (({c} - _zmn{j}) * {top}) div (_zmx{j} - _zmn{j}) END"
        )
        for j, c in enumerate(cols)
    ]
    drop = [f"_zmn{j}" for j in range(len(cols))] + [
        f"_zmx{j}" for j in range(len(cols))
    ]
    return with_stats.withColumn("z", zvalue_nd(normed, bits)).drop(*drop)


def zorder_key(
    df: DataFrame, x: str, y: str, bits: int = Z_BITS
) -> DataFrame:
    """Two-dimensional clustered key (thin wrapper over the N-dim
    form, kept for the established call sites)."""
    return zorder_key_nd(df, [x, y], bits)


def zorder_page_profile(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = Z_BITS,
    prefix_shift: int = 10,
) -> DataFrame:
    """Layout audit: group rows into z-prefix pages (quadtree cells)
    and report each page's bounding box in both dimensions.

    ``page = z >> prefix_shift`` — a pure projection + one keyed
    aggregate, so the audit runs at scan speed. Tight min/max ranges
    per page in BOTH x and y are exactly what parquet row-group
    pruning consumes after a z-ordered write; the companion test
    writes the sorted layout and checks per-file bounds really shrink
    vs an unsorted write."""
    zed = zorder_key(df, x, y, bits)
    return zed.groupBy(
        F.shiftright(F.col("z"), prefix_shift).alias("page")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(x).alias("x_min"),
        F.max(x).alias("x_max"),
        F.min(y).alias("y_min"),
        F.max(y).alias("y_max"),
    )
