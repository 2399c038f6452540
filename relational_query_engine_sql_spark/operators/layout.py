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


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton code of two ``bits``-wide non-negative ints: x's bit i
    lands at position 2i, y's at 2i+1."""
    terms = [
        F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(1), 2 * i)
        for i in range(bits)
    ] + [
        F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(1), 2 * i + 1
        )
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zvalue_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """The identical Morton expression as portable SQL text."""
    terms = [f"(({x} >> {i}) & 1) << {2 * i}" for i in range(bits)] + [
        f"(({y} >> {i}) & 1) << {2 * i + 1}" for i in range(bits)
    ]
    return " | ".join(f"({t})" for t in terms)


def norm_expr(v: str, vmin: str, vmax: str, bits: int = Z_BITS) -> str:
    """SQL text: min/max-normalize ``v`` onto the 2^bits grid with
    integer arithmetic only (DuckDB ``//`` == Spark ``div``)."""
    top = (1 << bits) - 1
    return (
        f"CASE WHEN {vmax} = {vmin} THEN 0 "
        f"ELSE (({v} - {vmin}) * {top}) // ({vmax} - {vmin}) END"
    )


def zorder_key(
    df: DataFrame, x: str, y: str, bits: int = Z_BITS
) -> DataFrame:
    """Attach the normalized Morton key as column ``z``.

    One aggregate computes the per-dimension min/max (single row,
    broadcast back); the normalization and interleave are a pure
    projection. Sorting/range-partitioning on ``z`` before a write
    yields the clustered layout."""
    stats = df.agg(
        F.min(x).alias("_xmin"),
        F.max(x).alias("_xmax"),
        F.min(y).alias("_ymin"),
        F.max(y).alias("_ymax"),
    )
    top = (1 << bits) - 1
    with_stats = df.crossJoin(F.broadcast(stats))
    xn = F.expr(
        f"CASE WHEN _xmax = _xmin THEN 0 "
        f"ELSE (({x} - _xmin) * {top}) div (_xmax - _xmin) END"
    )
    yn = F.expr(
        f"CASE WHEN _ymax = _ymin THEN 0 "
        f"ELSE (({y} - _ymin) * {top}) div (_ymax - _ymin) END"
    )
    return with_stats.withColumn("z", zvalue(xn, yn, bits)).drop(
        "_xmin", "_xmax", "_ymin", "_ymax"
    )


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
