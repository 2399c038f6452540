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
    # Parse via from_json over a text scan rather than the raw json
    # reader: Spark refuses to query the corrupt-record column off a
    # raw json file scan (SPARK-21610) unless the parse is cached, and
    # a cache pinned inside a reader is a session-lifetime leak. A text
    # scan has no such restriction — both branches re-scan the (cheap,
    # splittable) text files and parse independently; nothing persists.
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value", full, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("_s"),
    )
    good = parsed.filter(F.col(f"_s.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"_s.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(
        F.col(f"_s.{CORRUPT_COL}").isNotNull()
    ).select(F.col("value").alias("raw_line"))
    return good, quarantine
