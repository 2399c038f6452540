"""Bucketed tables: shuffle-free repeated joins.

The SCALE.md "what we would add on a real cluster" item, implemented:
writing both sides of a hot join bucketed (and sorted) by the join key
lets every subsequent join between them run as a zero-Exchange
sort-merge — at 100 TB the dominant fact-fact join cost simply
disappears from all downstream pipelines that reuse the layout.

Spark's built-in (non-Hive) catalog supports bucketed parquet via
``saveAsTable``; bucket metadata lives in the session catalog, so the
layout is an *ingest-time* contract. ``assert_no_shuffle_join``
verifies the property from the executed plan — the same check the
tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    buckets: int = 8,
) -> None:
    """Persist ``df`` as a managed bucketed+sorted parquet table.

    Drops any prior table AND its leftover warehouse directory first —
    a crashed writer can leave files behind that the catalog no longer
    knows about, and saveAsTable refuses locations that already exist.
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    if warehouse:
        shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left).join(spark.table(right), on)


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the physical join plan contains a shuffle Exchange.

    Co-bucketed sides satisfy SortMergeJoin's distribution requirement
    directly; any ``Exchange hashpartitioning`` means the bucket layout
    was not used.
    """
    plan = executed_plan(df)
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "bucketed join still shuffles:\n" + plan
        )
