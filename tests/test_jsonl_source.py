"""JSONL source/sink: lossless round-trip + malformed-line quarantine."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from relational_query_engine_sql_spark.sources.jsonl import (
    read_jsonl,
    write_jsonl,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def test_jsonl_roundtrip_documents(spark, sf_oracle):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").select(
        *[f.name for f in DOC_SCHEMA.fields]
    )
    out = tempfile.mkdtemp(prefix="rqe-jsonl-") + "/docs"
    write_jsonl(docs, out)
    good, quarantine = read_jsonl(spark, out, DOC_SCHEMA)
    assert quarantine.count() == 0
    # lossless: same row multiset (md5 over all fields)
    fp = lambda df: df.select(
        F.md5(F.concat_ws("\x1f", *[F.col(f.name).cast("string")
                                    for f in DOC_SCHEMA.fields])).alias("h")
    ).agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint"))
          ).collect()[0][0]
    assert docs.count() == good.count()
    assert fp(docs) == fp(good)


def test_jsonl_quarantines_malformed_lines(spark):
    d = tempfile.mkdtemp(prefix="rqe-jsonl-bad-")
    path = os.path.join(d, "part-000.jsonl")
    with open(path, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", '
                '"source": "s", "n_chars": 2}\n')
        f.write("this is not json\n")
        f.write('{"doc_id": 2, "text": "also ok", "lang": "en", '
                '"source": "s", "n_chars": 7}\n')
    good, quarantine = read_jsonl(spark, d, DOC_SCHEMA)
    assert good.count() == 2
    q = quarantine.collect()
    assert len(q) == 1 and "not json" in q[0]["raw_line"]
