"""Chart sink — SURVEY §2 S8 (reference: src/routes/chart.js:9-66).

The reference's chart route runs a day/close time-series query, keeps
the last 60 points (its MAX_POINTS API cap), renders an 800×400 line
chart through the QuickChart service, and writes the image file. The
engine analog keeps the exact same pipeline shape but renders the
chart LOCALLY as SVG — a deterministic, dependency-free vector format
(no image codec libraries exist in this environment, and shipping
query results to a third-party render API is the part of the
reference that does NOT belong in a data engine).

Scale posture: everything up to the final slice is a distributed
plan (keyed day aggregate, then an O4-style top-k-desc → re-asc,
which Spark executes as TakeOrderedAndProject — per-partition top-k,
no global sort). Only the ≤``max_points`` chart rows are collected,
the same bound the reference applies before rendering
(chart.js:26-27). The render itself is O(max_points) string work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def render_line_svg(
    points: list[tuple[str, float]],
    title: str,
    width: int = 800,
    height: int = 400,
) -> str:
    """Deterministic SVG line chart (the QuickChart config analog:
    type=line, one dataset, label + numeric axis — chart.js:34-48)."""
    if not points:
        raise ValueError("no points to chart")
    pad = 50
    xs = list(range(len(points)))
    vals = [v for _, v in points]
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    w_in, h_in = width - 2 * pad, height - 2 * pad

    def px(i: int) -> float:
        return pad + (w_in * i / max(len(xs) - 1, 1))

    def py(v: float) -> float:
        return pad + h_in * (1 - (v - lo) / span)

    path = " ".join(
        f"{'M' if i == 0 else 'L'}{px(i):.2f},{py(v):.2f}"
        for i, (_, v) in enumerate(points)
    )
    # sparse x labels: first, middle, last (QuickChart auto-thins too)
    label_ids = sorted({0, len(points) // 2, len(points) - 1})
    labels = "".join(
        f'<text x="{px(i):.2f}" y="{height - pad / 2:.2f}" '
        f'font-size="12" text-anchor="middle">{points[i][0]}</text>'
        for i in label_ids
    )
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
        f'<rect width="{width}" height="{height}" fill="white"/>'
        f'<text x="{width / 2:.0f}" y="{pad / 2:.0f}" font-size="16" '
        f'text-anchor="middle">{title}</text>'
        f'<line x1="{pad}" y1="{height - pad}" x2="{width - pad}" '
        f'y2="{height - pad}" stroke="black"/>'
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{height - pad}" '
        f'stroke="black"/>'
        f'<text x="{pad / 2:.0f}" y="{py(hi):.2f}" font-size="12" '
        f'text-anchor="middle">{hi:g}</text>'
        f'<text x="{pad / 2:.0f}" y="{py(lo):.2f}" font-size="12" '
        f'text-anchor="middle">{lo:g}</text>'
        f'<path d="{path}" fill="none" stroke="blue" stroke-width="2"/>'
        f"{labels}</svg>"
    )


def write_chart(
    series: DataFrame,
    out_dir: str,
    name: str,
    label_col: str,
    value_col: str,
    title: str,
    max_points: int = 60,
) -> str:
    """Render ``series`` (already day-ordered ascending) to
    ``<out_dir>/<name>.svg`` and return the path — the reference's
    file-write + filename response (chart.js:50-58). The collect is
    bounded to the LAST ``max_points`` rows exactly as the reference
    slices (chart.js:26-27): top-k on the label descending, re-sorted
    ascending — TakeOrderedAndProject on the Spark side, never a full
    collect."""
    rows = (
        series.orderBy(series[label_col].desc())
        .limit(max_points)
        .orderBy(series[label_col].asc())
        .collect()
    )
    svg = render_line_svg(
        [(str(r[label_col]), float(r[value_col])) for r in rows], title
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.svg")
    with open(path, "w", encoding="utf-8") as f:
        f.write(svg)
    return path


PALETTE = ["blue", "green", "red", "orange"]


def render_series_svg(
    labels: list[str],
    series: list[tuple[str, list[float | None], bool]],
    title: str,
    width: int = 900,
    height: int = 450,
) -> str:
    """Multi-dataset line chart over one shared label axis — the
    reference's prediction chart (chart.js:113-152: historical solid
    line + forecast dashed line, each None-padded outside its span).
    ``series``: (name, values aligned to labels with None gaps,
    dashed)."""
    if not labels:
        raise ValueError("no labels to chart")
    pad = 50
    vals = [v for _, vs, _ in series for v in vs if v is not None]
    if not vals:
        raise ValueError("no points to chart")
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    w_in, h_in = width - 2 * pad, height - 2 * pad

    def px(i: int) -> float:
        return pad + (w_in * i / max(len(labels) - 1, 1))

    def py(v: float) -> float:
        return pad + h_in * (1 - (v - lo) / span)

    paths, legends = [], []
    for s_i, (name, values, dashed) in enumerate(series):
        color = PALETTE[s_i % len(PALETTE)]
        d, pen_down = [], False
        for i, v in enumerate(values):
            if v is None:
                pen_down = False
                continue
            d.append(f"{'L' if pen_down else 'M'}{px(i):.2f},{py(v):.2f}")
            pen_down = True
        dash = ' stroke-dasharray="4 4"' if dashed else ""
        paths.append(
            f'<path d="{" ".join(d)}" fill="none" stroke="{color}" '
            f'stroke-width="2"{dash}/>'
        )
        legends.append(
            f'<text x="{width - pad:.0f}" y="{pad + 16 * s_i:.0f}" '
            f'font-size="12" text-anchor="end" fill="{color}">{name}</text>'
        )
    label_ids = sorted({0, len(labels) // 2, len(labels) - 1})
    ticks = "".join(
        f'<text x="{px(i):.2f}" y="{height - pad / 2:.2f}" '
        f'font-size="12" text-anchor="middle">{labels[i]}</text>'
        for i in label_ids
    )
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
        f'<rect width="{width}" height="{height}" fill="white"/>'
        f'<text x="{width / 2:.0f}" y="{pad / 2:.0f}" font-size="16" '
        f'text-anchor="middle">{title}</text>'
        f'<line x1="{pad}" y1="{height - pad}" x2="{width - pad}" '
        f'y2="{height - pad}" stroke="black"/>'
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{height - pad}" '
        f'stroke="black"/>'
        f"{''.join(paths)}{''.join(legends)}{ticks}</svg>"
    )


def write_forecast_chart(
    long_df: DataFrame,
    out_dir: str,
    name: str,
    label_col: str,
    series_col: str,
    value_col: str,
    title: str,
    dashed_series: tuple[str, ...] = ("pred",),
    max_points: int = 90,
) -> str:
    """Render a LONG (label, series, value) frame — e.g. history +
    forecast — to one multi-line SVG. Bounded collect: ≤ max_points
    DISTINCT LABELS (history cap + horizon, the reference's 50+30).
    The cap is applied to a distinct-label frame and semi-joined back,
    not to raw rows of the long frame — a row cap would cut mid-label
    when several series share the newest labels, silently dropping one
    series' point at the oldest kept label."""
    from pyspark.sql import functions as F

    top_labels = (
        long_df.select(label_col)
        .distinct()
        .orderBy(F.col(label_col).desc())
        .limit(max_points)
    )
    rows = (
        long_df.join(F.broadcast(top_labels), [label_col], "left_semi")
        .orderBy(long_df[label_col].asc())
        .collect()
    )
    labels = sorted({str(r[label_col]) for r in rows})
    names = sorted({r[series_col] for r in rows})
    by = {(str(r[label_col]), r[series_col]): float(r[value_col]) for r in rows}
    series = [
        (
            n,
            [by.get((lab, n)) for lab in labels],
            n in dashed_series,
        )
        for n in names
    ]
    svg = render_series_svg(labels, series, title)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.svg")
    with open(path, "w", encoding="utf-8") as f:
        f.write(svg)
    return path
