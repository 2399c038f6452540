"""Explicit StructType schemas.

Two groups (FIXTURES.md):

* DOMAIN_SCHEMAS — mirror of the reference's PostgreSQL DDL
  (``/root/reference/sql/schema.sql:1-117``), mapped per SURVEY.md §1.2:
  VARCHAR/TEXT → string, DECIMAL(p,s) → decimal(p,s), SERIAL → int
  surrogate keys pre-assigned in fixtures, DATE → date,
  TIMESTAMP → timestamp, BOOLEAN → boolean. CHECK/FK constraints are
  enforced at the write path, not by the schema.

* DRIVER_TABLES — the driver's TPC-H-ish parquet tables
  (/root/testdata/sf*/, TESTDATA.md); schemas come from the files
  themselves, we only keep the canonical name list here.

Schemas are declared, never inferred — a fixed schema is what makes
100 TB scans prunable (ReadSchema) and keeps the write path honest.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- driver test tables (read from parquet; names only) -------------------

DRIVER_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# --- domain tables (reference sql/schema.sql) ------------------------------

_dec = T.DecimalType

DOMAIN_SCHEMAS: dict[str, T.StructType] = {
    # sql/schema.sql:1-10 — daily OHLCV fact table, PK (symbol, timestamp)
    "stocks": T.StructType(
        [
            T.StructField("symbol", T.StringType(), False),
            T.StructField("timestamp", T.DateType(), False),
            T.StructField("open", _dec(10, 2), True),
            T.StructField("high", _dec(10, 2), True),
            T.StructField("low", _dec(10, 2), True),
            T.StructField("close", _dec(10, 2), True),
            T.StructField("volume", T.LongType(), True),
        ]
    ),
    # sql/schema.sql:12-17
    "users": T.StructType(
        [
            T.StructField("userid", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("email", T.StringType(), False),
            T.StructField("password_hash", T.StringType(), True),
        ]
    ),
    # sql/schema.sql:19-24 — undirected edge, stored userid1 < userid2
    "friend": T.StructType(
        [
            T.StructField("userid1", T.IntegerType(), False),
            T.StructField("userid2", T.IntegerType(), False),
            T.StructField("created_at", T.TimestampType(), True),
        ]
    ),
    # sql/schema.sql:26-32 — status IN ('PENDING','ACCEPTED','REJECTED')
    "request": T.StructType(
        [
            T.StructField("requestid", T.IntegerType(), False),
            T.StructField("fromuserid", T.IntegerType(), False),
            T.StructField("touserid", T.IntegerType(), False),
            T.StructField("status", T.StringType(), False),
            T.StructField("created_at", T.TimestampType(), True),
        ]
    ),
    # sql/schema.sql:34-39
    "stocklist": T.StructType(
        [
            T.StructField("listid", T.IntegerType(), False),
            T.StructField("ownerid", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("is_public", T.BooleanType(), False),
        ]
    ),
    # sql/schema.sql:41-49 — UNIQUE(listid, userid)
    "review": T.StructType(
        [
            T.StructField("reviewid", T.IntegerType(), False),
            T.StructField("listid", T.IntegerType(), False),
            T.StructField("userid", T.IntegerType(), False),
            T.StructField("content", T.StringType(), True),
            T.StructField("created_at", T.TimestampType(), True),
            T.StructField("updated_at", T.TimestampType(), True),
        ]
    ),
    # sql/schema.sql:52-56 — many-to-many ACL
    "stocklist_shared_with": T.StructType(
        [
            T.StructField("listid", T.IntegerType(), False),
            T.StructField("userid", T.IntegerType(), False),
        ]
    ),
    # sql/schema.sql:58-63 — list membership with share weight
    "stockin": T.StructType(
        [
            T.StructField("listid", T.IntegerType(), False),
            T.StructField("symbol", T.StringType(), False),
            T.StructField("shares", _dec(38, 6), True),
        ]
    ),
    # sql/schema.sql:68-73
    "portfolio": T.StructType(
        [
            T.StructField("portfolioid", T.IntegerType(), False),
            T.StructField("userid", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("cashbalance", _dec(12, 2), False),
        ]
    ),
    # sql/schema.sql:75-81 — append-only ledger
    "transactions": T.StructType(
        [
            T.StructField("transactionid", T.IntegerType(), False),
            T.StructField("portfolioid", T.IntegerType(), False),
            T.StructField("amount", _dec(12, 2), False),
            T.StructField("detail", T.StringType(), True),
            T.StructField("createdat", T.TimestampType(), True),
        ]
    ),
    # sql/schema.sql:83-89 — symbol dimension
    "stocksymbols": T.StructType(
        [T.StructField("symbol", T.StringType(), False)]
    ),
    # sql/schema.sql:91-99 — positions; Shares INT CHECK >= 0
    "holdings": T.StructType(
        [
            T.StructField("holdingid", T.IntegerType(), False),
            T.StructField("portfolioid", T.IntegerType(), False),
            T.StructField("symbol", T.StringType(), False),
            T.StructField("shares", T.IntegerType(), False),
            T.StructField("avgprice", _dec(12, 4), True),
            T.StructField("createdat", T.TimestampType(), True),
            T.StructField("updatedat", T.TimestampType(), True),
        ]
    ),
    # sql/schema.sql:101-110 — memoized analytics results
    "statistics_cache": T.StructType(
        [
            T.StructField("portfolio_id", T.IntegerType(), False),
            T.StructField("start_date", T.DateType(), False),
            T.StructField("end_date", T.DateType(), False),
            T.StructField("symbol", T.StringType(), False),
            T.StructField("cov", T.DoubleType(), True),
            T.StructField("beta", T.DoubleType(), True),
            T.StructField("updated_at", T.TimestampType(), True),
        ]
    ),
}

# Primary keys per domain table — drives upsert/merge key selection
# (reference PK/UNIQUE constraints, sql/schema.sql).
DOMAIN_KEYS: dict[str, list[str]] = {
    "stocks": ["symbol", "timestamp"],
    "users": ["userid"],
    "friend": ["userid1", "userid2"],
    "request": ["requestid"],
    "stocklist": ["listid"],
    "review": ["reviewid"],
    "stocklist_shared_with": ["listid", "userid"],
    "stockin": ["listid", "symbol"],
    "portfolio": ["portfolioid"],
    "transactions": ["transactionid"],
    "stocksymbols": ["symbol"],
    "holdings": ["holdingid"],
    "statistics_cache": ["portfolio_id", "start_date", "end_date", "symbol"],
}
