from .catalog import load_table, load_tables, register_views, spread, table_rows
from .csv_ingest import (
    clean_ohlcv,
    corrupt_rows,
    ingest_ohlcv_csv,
    read_ohlcv_csv,
    symbol_registry,
)

__all__ = [
    "clean_ohlcv",
    "corrupt_rows",
    "ingest_ohlcv_csv",
    "load_table",
    "load_tables",
    "read_ohlcv_csv",
    "register_views",
    "spread",
    "symbol_registry",
    "table_rows",
]
