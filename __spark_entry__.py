"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the query registry in
``relational_query_engine_sql_spark.plans`` — one named entry per
implemented SURVEY.md §2 operator, each with matching DuckDB oracle SQL
where the semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from relational_query_engine_sql_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1 grouped multi-aggregate — the reference's
    /api/stocks/:symbol/stats shape, TPC-H Q1 form) on sf0.001."""
    return plans.get("a1_pricing_summary").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same column aliases)."""
    return plans.all_oracles()
