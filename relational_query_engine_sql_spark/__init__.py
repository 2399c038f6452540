"""PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
(LingkeMeng/relational-query-engine-sql — a Node.js + PostgreSQL stock
portfolio backend, see SURVEY.md) as an idiomatic Spark DataFrame/SQL
library:

- ``session``    — tuned SparkSession builder (AQE, Arrow, UTC).
- ``schemas``    — explicit StructTypes for the domain tables
                   (mirror of the reference ``sql/schema.sql``) and the
                   driver's TPC-H-ish test tables.
- ``sources``    — parquet/CSV loaders and table catalog.
- ``operators``  — composable DataFrame operators (scans, filters,
                   joins incl. as-of latest-per-key, window returns,
                   statistical aggregates, mutation semantics).
- ``functions``  — scalar expression helpers (pair normalization,
                   ledger text build/parse, date sequences).
- ``plans``      — the named-query registry (Spark callable + DuckDB
                   oracle SQL per SURVEY.md §2 operator).
- ``datapipe``   — beyond-reference large-scale data-pipeline ops:
                   dedup (exact/MinHash-LSH/SimHash), similarity
                   search, text analysis, multimodal plumbing.
- ``streaming``  — Structured Streaming variants over the events table.
"""

__version__ = "0.1.0"
