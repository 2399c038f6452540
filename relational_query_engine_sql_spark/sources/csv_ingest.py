"""CSV bulk-ingest for daily OHLCV.

The reference implies a gitignored ``SP500History.csv`` bulk source
(``/root/reference/.gitignore:5``) but commits no loader — rows arrive
one at a time over REST (``/root/reference/src/routes/stocks.js:126-155``,
each POST doing symbol-uppercase normalization + idempotent symbol
registration). This module is that implied loader, batch-shaped:

* explicit schema (never inferred — a schema drift at 100 TB must fail
  the job, not silently retype a column),
* PERMISSIVE parse with a quarantined ``_corrupt_record`` side-channel
  instead of dropping bad rows on the floor,
* the reference's per-row normalizations applied set-wise:
  ``upper(symbol)`` (src/routes/stocks.js:147) and PK dedup on
  (symbol, timestamp) — re-ingesting the same file is a no-op, the
  batch analog of ``ON CONFLICT DO NOTHING`` (src/routes/stocks.js:137-142).

Scale: one CSV file is one split per 128 MB (maxPartitionBytes); the
parquet sink partitions by symbol so downstream per-symbol scans
(SURVEY.md §4 "index" replacement) prune to one directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import DOMAIN_SCHEMAS

# OHLCV CSV layout: header row, ISO dates. Matches DOMAIN_SCHEMAS["stocks"]
# plus the permissive-mode corrupt-record capture column.
_CSV_SCHEMA = T.StructType(
    list(DOMAIN_SCHEMAS["stocks"].fields)
    + [T.StructField("_corrupt_record", T.StringType(), True)]
)


def read_ohlcv_csv(
    spark: SparkSession, path: str, strict: bool = False
) -> DataFrame:
    """Read an OHLCV CSV into the canonical stocks schema.

    ``strict=True`` fails the job on any malformed row (FAILFAST);
    default PERMISSIVE keeps malformed rows visible via
    :func:`corrupt_rows` instead of silently nulling them.
    """
    reader = (
        spark.read.schema(_CSV_SCHEMA)
        .option("header", "true")
        .option("dateFormat", "yyyy-MM-dd")
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return reader.csv(path)


def corrupt_rows(raw: DataFrame) -> DataFrame:
    """Quarantine side of a PERMISSIVE read: the raw text of every row
    that failed to parse. Spark disallows referencing only the
    internal corrupt-record column of a raw CSV scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the
    scan is cached first, per the error's own guidance."""
    return (
        raw.cache()
        .filter(F.col("_corrupt_record").isNotNull())
        .select("_corrupt_record")
    )


def clean_ohlcv(raw: DataFrame) -> DataFrame:
    """Good rows, reference-normalized: uppercase symbol
    (src/routes/stocks.js:147), PK-deduped on (symbol, timestamp) so
    re-ingest is idempotent (ON CONFLICT DO NOTHING,
    src/routes/stocks.js:137-142)."""
    return (
        raw.filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
        .filter(F.col("symbol").isNotNull() & F.col("timestamp").isNotNull())
        .withColumn("symbol", F.upper("symbol"))
        .dropDuplicates(["symbol", "timestamp"])
    )


def ingest_ohlcv_csv(
    spark: SparkSession, csv_path: str, parquet_dir: str
) -> DataFrame:
    """CSV → symbol-partitioned parquet. Returns the cleaned frame.

    Partitioning by symbol replaces the reference's (symbol, timestamp)
    b-tree PK index for selective probes: a per-symbol query prunes to
    one partition directory, and min/max stats on timestamp skip row
    groups within it.
    """
    cleaned = clean_ohlcv(read_ohlcv_csv(spark, csv_path))
    (
        cleaned.write.mode("overwrite")
        .partitionBy("symbol")
        .parquet(parquet_dir)
    )
    return cleaned


def symbol_registry(cleaned: DataFrame) -> DataFrame:
    """Derive the StockSymbols dimension (sql/schema.sql:83-89 seeds it
    with INSERT…SELECT DISTINCT symbol ON CONFLICT DO NOTHING)."""
    return cleaned.select("symbol").distinct()
