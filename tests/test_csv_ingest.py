"""CSV ingest path (sources/csv_ingest.py): the reference's implied
SP500History.csv bulk loader (/root/reference/.gitignore:5), batch-shaped.
"""

from __future__ import annotations

import pytest

from relational_query_engine_sql_spark.fixtures import make_stocks
from relational_query_engine_sql_spark.sources.csv_ingest import (
    clean_ohlcv,
    corrupt_rows,
    ingest_ohlcv_csv,
    read_ohlcv_csv,
    symbol_registry,
)


@pytest.fixture(scope="module")
def csv_dir(spark, tmp_path_factory):
    """Write the domain stocks fixture out as a single CSV file."""
    d = tmp_path_factory.mktemp("ohlcv")
    stocks = make_stocks(spark)
    pdf = stocks.toPandas()
    # lowercase symbols + a duplicated row to exercise the reference's
    # upper() normalization and ON CONFLICT-style dedup
    pdf["symbol"] = pdf["symbol"].str.lower()
    pdf = pdf._append(pdf.iloc[0])
    path = d / "SP500History.csv"
    pdf.to_csv(path, index=False, date_format="%Y-%m-%d")
    # one malformed line for the PERMISSIVE quarantine path
    with open(path, "a") as f:
        f.write("AAPL,not-a-date,1,2,3,4,notanumber\n")
    return str(path), stocks


def test_roundtrip_and_normalization(spark, csv_dir):
    path, stocks = csv_dir
    cleaned = clean_ohlcv(read_ohlcv_csv(spark, path))
    assert cleaned.schema == stocks.schema
    # dedup removed the duplicated row; corrupt row excluded
    assert cleaned.count() == stocks.count()
    # symbols re-uppercased
    assert cleaned.filter("symbol != upper(symbol)").count() == 0
    # exact content match against the source frame (pandas compare —
    # exceptAll over a PERMISSIVE-CSV+dedup plan trips a Catalyst
    # binding bug in Spark 4.1)
    key = ["symbol", "timestamp"]
    got = cleaned.toPandas().sort_values(key).reset_index(drop=True)
    want = stocks.toPandas().sort_values(key).reset_index(drop=True)
    assert got.equals(want)


def test_corrupt_quarantine(spark, csv_dir):
    path, _ = csv_dir
    bad = corrupt_rows(read_ohlcv_csv(spark, path)).collect()
    assert len(bad) == 1
    assert "not-a-date" in bad[0]["_corrupt_record"]


def test_strict_mode_fails(spark, csv_dir):
    path, _ = csv_dir
    # collect(), not count() — count() short-circuits column parsing
    # so FAILFAST would never see the malformed row
    with pytest.raises(Exception):
        read_ohlcv_csv(spark, path, strict=True).collect()


def test_ingest_partitioned_parquet(spark, csv_dir, tmp_path):
    path, stocks = csv_dir
    out = str(tmp_path / "stocks_pq")
    cleaned = ingest_ohlcv_csv(spark, path, out)
    back = spark.read.parquet(out)
    assert back.count() == cleaned.count()
    # partitioned by symbol → per-symbol scan prunes to one directory
    import os

    assert any(p.startswith("symbol=") for p in os.listdir(out))
    # re-ingest is idempotent
    again = ingest_ohlcv_csv(spark, path, out)
    assert again.count() == cleaned.count()


def test_partition_pruning_on_symbol(spark, csv_dir, tmp_path):
    """The symbol-partitioned layout must turn a per-symbol probe into
    directory pruning (PartitionFilters on the scan) — the Spark analog
    of the reference's (symbol, timestamp) b-tree index."""
    path, _ = csv_dir
    out = str(tmp_path / "pq_pruned")
    ingest_ohlcv_csv(spark, path, out)
    probe = spark.read.parquet(out).filter("symbol = 'AAPL'")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "symbol" in plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]


def test_symbol_registry(spark, csv_dir):
    path, stocks = csv_dir
    cleaned = clean_ohlcv(read_ohlcv_csv(spark, path))
    reg = sorted(r["symbol"] for r in symbol_registry(cleaned).collect())
    expect = sorted(
        r["symbol"] for r in stocks.select("symbol").distinct().collect()
    )
    assert reg == expect


def test_chart_sink_renders_bounded_svg(spark, sf_small, tmp_path):
    """S8 analog (reference chart.js): the sink writes a parseable SVG
    whose polyline has exactly min(rows, max_points) points, sliced to
    the LAST max_points labels like the reference's MAX_POINTS cap."""
    import xml.etree.ElementTree as ET

    from relational_query_engine_sql_spark.sources.chart_sink import (
        render_line_svg,
        write_chart,
    )

    series = spark.createDataFrame(
        [(f"2024-01-{d:02d}", float(d)) for d in range(1, 31)],
        "day string, close double",
    )
    path = write_chart(
        series, str(tmp_path), "t", "day", "close", "T", max_points=10
    )
    root = ET.parse(path).getroot()
    assert root.tag.endswith("svg")
    d = next(
        e.get("d") for e in root.iter() if e.tag.endswith("path")
    )
    assert d.count("L") + d.count("M") == 10  # last 10 points only
    texts = [e.text for e in root.iter() if e.tag.endswith("text")]
    assert "2024-01-30" in texts and "2024-01-21" in texts
    assert "2024-01-01" not in texts

    import pytest

    with pytest.raises(ValueError, match="no points"):
        render_line_svg([], "empty")


def test_forecast_chart_renders_two_series(spark, tmp_path):
    """Prediction-chart analog: one solid history path, one dashed
    forecast path, shared label axis, legend per series."""
    import xml.etree.ElementTree as ET

    from relational_query_engine_sql_spark.sources.chart_sink import (
        write_forecast_chart,
    )

    rows = [(f"2024-01-{d:02d}", "hist", float(d)) for d in range(1, 11)]
    rows += [(f"2024-02-{d:02d}", "pred", 10.0 + d) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "day string, series string, value double")
    path = write_forecast_chart(
        df, str(tmp_path), "p", "day", "series", "value", "T"
    )
    root = ET.parse(path).getroot()
    paths = [e for e in root.iter() if e.tag.endswith("path")]
    assert len(paths) == 2
    dashed = [e for e in paths if e.get("stroke-dasharray")]
    assert len(dashed) == 1  # exactly the pred series
    # hist path has 10 points, pred 5 — each a single pen stroke
    strokes = sorted(
        e.get("d").count("L") + e.get("d").count("M") for e in paths
    )
    assert strokes == [5, 10]
    texts = [e.text for e in root.iter() if e.tag.endswith("text")]
    assert "hist" in texts and "pred" in texts


def test_forecast_chart_caps_labels_not_rows(spark, tmp_path):
    """Regression: max_points bounds DISTINCT LABELS. With two series
    sharing every label, a row cap of 2·k would cut mid-label and drop
    one series' point at the oldest kept label; the label cap keeps
    BOTH series complete over the kept range."""
    import xml.etree.ElementTree as ET

    from relational_query_engine_sql_spark.sources.chart_sink import (
        write_forecast_chart,
    )

    rows = []
    for d in range(1, 21):  # two full-span series over 20 labels
        rows.append((f"2024-01-{d:02d}", "hist", float(d)))
        rows.append((f"2024-01-{d:02d}", "pred", d + 0.5))
    df = spark.createDataFrame(rows, "day string, series string, value double")
    path = write_forecast_chart(
        df, str(tmp_path), "cap", "day", "series", "value", "T",
        max_points=8,
    )
    root = ET.parse(path).getroot()
    paths = [e for e in root.iter() if e.tag.endswith("path")]
    strokes = sorted(
        e.get("d").count("L") + e.get("d").count("M") for e in paths
    )
    assert strokes == [8, 8]  # both series keep all 8 kept labels
    texts = [e.text for e in root.iter() if e.tag.endswith("text")]
    assert "2024-01-13" in texts and "2024-01-12" not in texts
