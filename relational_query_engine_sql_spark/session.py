"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set fleet-wide on a real
cluster: AQE on (runtime shuffle-partition coalescing + skew-join
handling), Arrow for any pandas interchange, UTC session timezone so
results compare bit-for-bit against the DuckDB oracle, and shuffle
partitions sized to cores rather than the 200 default (on a 1000-executor
cluster this would instead be ~2-3x total cores, or left to AQE's
coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "relational_query_engine_sql_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Right-size shuffles for local mode; a cluster deployment would
        # raise this and let AQE coalesce down.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        # AQE: runtime re-planning — coalesce small shuffle partitions,
        # convert to broadcast when runtime stats allow, split skewed
        # partitions. Essential at 100 TB, harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas_udf / toPandas interchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Managed tables (bucketed writes) land in /tmp, never the repo.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", f"/tmp/spark-warehouse-{os.getuid()}"
            ),
        )
        # Quiet + lean for headless runs.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Local mode puts driver AND all executor threads in one JVM —
    # Spark's 1g default heap GC-thrashes under a 32-thread shuffle and
    # OOMs on shingle-scale intermediates. The target hosts have
    # 128 GiB; 24g keeps long multi-query sessions (bench, driver
    # correctness pass) out of GC pressure as cached panels and
    # localCheckpoint blocks accumulate. Override with
    # $SPARK_DRIVER_MEMORY. (Only effective for the process that
    # CREATES the JVM — set before first getOrCreate.)
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
