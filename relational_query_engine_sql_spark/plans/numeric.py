"""Deterministic cross-engine aggregation idioms.

``ROUND(SUM(<double expr>), k)`` is NOT reproducible across engines —
or even across runs of one engine — when the sum lands within an ulp
of a rounding boundary: IEEE addition is order-sensitive and shuffle
fetch order varies. The fix is to quantize each summand to DECIMAL
first: the double→decimal cast is deterministic (a binary double is
never exactly halfway between two 6-decimal values, so both engines
round identically), the decimal SUM is exact and order-independent,
and rounding an exact decimal ties away from zero in both engines.
The final cast back to double keeps result schemas engine-neutral.

Used by every money/measure sum in the oracle-checked registry's
``plans/`` modules. The operator-layer copies of the idiom
(``operators/skew.py``, ``streaming/events.py``,
``datapipe/multimodal.py``) inline the same cast chain on purpose:
importing from ``plans`` there would invert the package dependency
direction (plans → operators, never the reverse).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"


def money_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double expression, rounded to
    ``scale`` — bit-reproducible against the SQL emitted by
    :func:`sql_money_sum`."""
    return F.round(F.sum(col.cast(DEC)), scale).cast("double")


def sql_money_sum(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`money_sum`."""
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(27,6))), {scale}) AS DOUBLE)"
    )
