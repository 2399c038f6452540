"""JSONL (newline-delimited JSON) source/sink.

The interchange format of training-data pipelines: one JSON object per
line, gzip-friendly, streamable. Spark's native ``json`` reader/writer
handles it scalably (per-file splits, schema projection, predicate
pushdown on top-level fields after parse), so this module is a thin
contract layer:

* **writes are explicit-schema and column-ordered** — a JSONL corpus is
  consumed by tools that key on field names; column order and types are
  pinned, never inferred drift;
* **reads validate against an expected schema** — ``_corrupt_record``
  rows (malformed lines) are quarantined to a side output instead of
  silently nulling columns, mirroring the CSV ingest contract
  (``csv_ingest.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write a frame as JSONL, one object per line. Partitioned files —
    a 100 TB corpus writes in parallel and reads back with one split
    per file chunk."""
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with a fixed schema.

    Returns ``(good, quarantine)``: rows whose lines parsed cleanly,
    and the raw text of lines that did not (schema mismatch or broken
    JSON). Nothing is silently dropped or nulled.
    """
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark refuses to query the corrupt-record column off a raw
        # file scan (SPARK-21610); the parse must materialize first.
        # One cached parse serves both branches — at corpus scale a
        # deployment sizes this with MEMORY_AND_DISK or splits the
        # ingest into a staging write.
        .cache()
    )
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantine
