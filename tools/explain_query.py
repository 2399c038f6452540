#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries to files.

Usage: python tools/explain_query.py --out plans/r11 --suffix after name...
Writes <out>/<name>_<suffix>.txt. Scenario queries execute their side
effects while building the returned frame; the captured plan is the
plan of the frame the driver hashes.
"""
from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from relational_query_engine_sql_spark import plans  # noqa: E402
from relational_query_engine_sql_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r11")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name="explain_query")
    for n in args.names:
        try:
            df = plans.get(n).fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.out, f"{n}_{args.suffix}.txt")
            with open(path, "w", encoding="utf-8") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
        except Exception as ex:
            print(f"FAIL {n}: {type(ex).__name__}: {ex}"[:300],
                  file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
