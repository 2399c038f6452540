#!/usr/bin/env python
"""Build an sfK-equivalent perf-probe dataset from sf0.1 (K copies).

The driver's testdata tops out at sf0.1; the at-scale claims (BM25
single-tokenize, txnlog row gates, CC gate fallback, bucket-pair
shuffle shape) need at least one larger decade. This replicates the
sf0.1 tables K times with consistent key offsets so join structure is
preserved and result sizes scale ~linearly:

- fact/dimension keys shift by copy*ceil(max_key+1) (orders/customer/
  part/supplier/lineitem stay FK-consistent within each copy);
- region/nation stay single-copy (bounded categorical dimensions —
  nationkey/regionkey are NOT shifted anywhere, mirroring how a real
  corpus grows rows, not countries);
- documents get a copy-unique token suffix so cross-copy similarity
  collapses and the true near-dup pair structure scales linearly
  (same construction as the round-6 probe);
- embeddings get per-copy deterministic tangent noise so cross-copy
  cosine drops below the dedup thresholds (pair structure linear);
- events shift event_id and user_id (state-key cardinality scales).

PERF PROBE ONLY — not a correctness oracle (the hash gate is
driver_sim on the real SFs).

Usage: python tools/make_sf_replica.py [--copies 5] [--out /tmp/sfrep0.5]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from relational_query_engine_sql_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=5)
    ap.add_argument("--out", default="/tmp/sfrep0.5")
    args = ap.parse_args()
    spark = get_spark(app_name="make_sf_replica")

    def mx(df, col):
        return df.agg(F.max(col)).collect()[0][0] + 1

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    od = spark.read.parquet(f"{SRC}/orders.parquet")
    cu = spark.read.parquet(f"{SRC}/customer.parquet")
    pa = spark.read.parquet(f"{SRC}/part.parquet")
    su = spark.read.parquet(f"{SRC}/supplier.parquet")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    dc = spark.read.parquet(f"{SRC}/documents.parquet")
    em = spark.read.parquet(f"{SRC}/embeddings.parquet")

    O, C, P, S = mx(od, "o_orderkey"), mx(cu, "c_custkey"), mx(pa, "p_partkey"), mx(su, "s_suppkey")
    E, U = mx(ev, "event_id"), mx(ev, "user_id")
    D, V = mx(dc, "doc_id"), mx(em, "vec_id")

    def rep(df, shifts: dict, extra=None):
        parts = []
        for i in range(args.copies):
            d = df
            for col, base in shifts.items():
                d = d.withColumn(col, (F.col(col) + F.lit(i * base)).cast(df.schema[col].dataType))
            if extra is not None:
                d = extra(d, i)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    os.makedirs(args.out, exist_ok=True)

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{args.out}/{name}.parquet")
        print("wrote", name, flush=True)

    write(spark.read.parquet(f"{SRC}/region.parquet"), "region")
    write(spark.read.parquet(f"{SRC}/nation.parquet"), "nation")
    write(rep(cu, {"c_custkey": C}), "customer")
    write(rep(su, {"s_suppkey": S}), "supplier")
    write(rep(pa, {"p_partkey": P}), "part")
    write(rep(od, {"o_orderkey": O, "o_custkey": C}), "orders")
    write(
        rep(li, {"l_orderkey": O, "l_partkey": P, "l_suppkey": S}),
        "lineitem",
    )
    write(rep(ev, {"event_id": E, "user_id": U}), "events")
    write(
        rep(
            dc,
            {"doc_id": D},
            extra=lambda d, i: d.withColumn(
                "text",
                F.concat(F.col("text"), F.lit(f" copyuniq{i}tok" if i else "")),
            ),
        ),
        "documents",
    )
    # tangent noise per copy: deterministic from (copy, vec_id); copy 0
    # is untouched so the original vectors (and their planted dups)
    # survive verbatim
    def emb_noise(d, i):
        if i == 0:
            return d
        return d.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, j: x
                + 0.35
                * (
                    (
                        F.pmod(
                            F.abs(F.xxhash64(F.col("vec_id"), F.lit(i), j)),
                            F.lit(2001),
                        )
                        - 1000
                    )
                    / 1000.0
                ),
            ),
        )

    write(rep(em, {"vec_id": V}, extra=emb_noise), "embeddings")
    print("done:", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
