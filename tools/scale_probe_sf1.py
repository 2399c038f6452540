#!/usr/bin/env python
"""sf1-and-beyond scaling probe for the dedup/ANN families.

SCALE.md's earlier probes measured 1x-10x of the sf0.1 volumes; this
extends them to sf1-equivalent (10x sf0.1) and one point beyond (100x
embeddings), and — the part the earlier tables lacked — records the
FORMULA-PREDICTED candidate volume next to the measured one, so the
volume-aware LSH sizing (`lsh_params`: random candidates <= 4n by
construction) and the IVF nprobe recall compensation are validated at
the next decade, not extrapolated.

Synthetic inputs (perf probe, not a correctness oracle — correctness
is the driver_sim hash gate):
- embeddings: deterministic per-id isotropic unit vectors (dim 64)
  with 2% planted near-dups at cos ~ 0.98 (noise tangent 0.2);
- documents: sf0.1 documents replicated with copy-unique token
  suffixes so cross-copy similarity collapses and the true pair
  structure scales linearly (same construction as the earlier probe).

Usage: python tools/scale_probe_sf1.py [--quick]
Prints one markdown table per family; paste into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from relational_query_engine_sql_spark.datapipe.dedup import (
    lsh_candidates,
    minhash_signature,
    shingles,
)
from relational_query_engine_sql_spark.datapipe.kmeans import train_kmeans
from relational_query_engine_sql_spark.datapipe.similarity import (
    _signlsh_bands,
    cosine_topk_numpy,
    embedding_near_dups_lsh,
    ivf_topk,
    lsh_params,
)
from relational_query_engine_sql_spark.session import get_spark

DIM = 64
DUP_FRAC = 0.02
SEED = 7


def gen_vectors(spark, n: int, clustered: bool = False):
    """n base vectors + floor(n*DUP_FRAC) planted near-dups of the
    first ids. Per-id seeded RNG keeps generation partition-order
    independent; nothing ships from the driver.

    ``clustered=False`` (sign-LSH probe): isotropic unit vectors — the
    distribution the `lsh_params` random-collision bound is derived
    for. ``clustered=True`` (IVF probe): a 64-center gaussian mixture
    — IVF's actual use case; isotropic data is its degenerate worst
    case (a random point's neighbors scatter uniformly over cells, so
    no cell assignment can help)."""
    n_dup = int(n * DUP_FRAC)

    def make(pdfs):
        for pdf in pdfs:
            ids, vecs = [], []
            for i in pdf["id"].to_numpy():
                i = int(i)
                base_id = i if i < n else i - n  # dup ids copy base 0..n_dup
                r = np.random.default_rng((SEED, base_id))
                if clustered:
                    c = np.random.default_rng(
                        (SEED, 555, base_id % 64)
                    ).standard_normal(DIM)
                    v = c / np.linalg.norm(c) + 0.35 * r.standard_normal(DIM) / np.sqrt(DIM)
                else:
                    v = r.standard_normal(DIM)
                v /= np.linalg.norm(v)
                if i >= n:
                    rn = np.random.default_rng((SEED, 1_000_000 + i))
                    g = rn.standard_normal(DIM)
                    g /= np.linalg.norm(g)
                    v = v + 0.2 * g
                    v /= np.linalg.norm(v)
                ids.append(i)
                vecs.append([float(x) for x in v])
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(n + n_dup)
        .repartition(32)
        .mapInPandas(make, "vec_id long, embedding array<double>")
    )


def probe_sign_lsh(spark, sizes):
    print("\n### sign-LSH embedding near-dup: formula vs measured\n")
    print("| vectors | bits x bands | cand bound (4n) | cand measured "
          "| planted | found | wall |")
    print("|---|---|---|---|---|---|---|")
    for n in sizes:
        n_dup = int(n * DUP_FRAC)
        total = n + n_dup
        emb = gen_vectors(spark, n).localCheckpoint(eager=True)
        bits, bands = lsh_params(total, 0.95)
        t0 = time.perf_counter()
        # candidate volume: distinct band-collision pairs (the thing
        # the formula bounds), counted from the same signature pass
        sigs = _signlsh_bands(emb, bands, bits, 42, "vec_id", "embedding")
        # DISTINCT collision pairs — what the 4n bound actually bounds
        # (a true near-dup collides in nearly every band; summing
        # per-band bucket pairs would count it ~n_bands times)
        a = sigs.toDF("v1", "band", "key")
        b = sigs.toDF("v2", "band", "key")
        cand = (
            a.join(b, ["band", "key"])
            .filter(F.col("v1") < F.col("v2"))
            .select("v1", "v2")
            .distinct()
            .count()
        )
        pairs = embedding_near_dups_lsh(emb, threshold=0.95, n=total)
        found = pairs.filter(
            (F.col("v2") - F.col("v1") == n) & (F.col("v1") < n_dup)
        ).count()
        wall = time.perf_counter() - t0
        print(
            f"| {total:,} | {bits}x{bands} | {4 * total:,} "
            f"| {int(cand):,} | {n_dup:,} | {found:,} "
            f"| {wall:.1f} s |"
        )


def probe_ivf(spark, sizes):
    print("\n### IVF recall at scale: nprobe compensation\n")
    print("| vectors | cells | nprobe | recall@10 | wall |")
    print("|---|---|---|---|---|")
    for n in sizes:
        emb = gen_vectors(spark, n, clustered=True).localCheckpoint(
            eager=True
        )
        k_cells = max(16, int((n + int(n * DUP_FRAC)) ** 0.5 // 4))
        assigned = train_kmeans(emb, k=k_cells, iters=2).withColumnRenamed(
            "cluster", "label"
        )
        tagged = emb.join(assigned.select("vec_id", "label"), "vec_id")
        tagged = tagged.localCheckpoint(eager=True)
        q = tagged.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        n_all = tagged.count()
        truth = {
            (r["query_id"], r["vec_id"])
            for r in cosine_topk_numpy(tagged, q, k=10).collect()
        }
        for nprobe in (1, 4):
            t0 = time.perf_counter()
            got = {
                (r["query_id"], r["vec_id"])
                for r in ivf_topk(tagged, q, k=10, nprobe=nprobe).collect()
            }
            wall = time.perf_counter() - t0
            rec = len(got & truth) / len(truth)
            print(
                f"| {n_all:,} | {k_cells} | {nprobe} "
                f"| {rec:.3f} | {wall:.1f} s |"
            )


def probe_minhash_docs(spark, sf_dir: str, copies: int):
    print("\n### MinHash-LSH text dedup at sf1 volume (10x sf0.1 docs)\n")
    print("| docs | candidates | verified pairs | wall |")
    print("|---|---|---|---|")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n0 = docs.count()
    rep = spark.range(copies).select(F.col("id").alias("_copy"))
    corpus = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("_copy") * 10_000_000).alias("id"),
            # copy-unique suffix token collapses cross-copy similarity
            F.concat(
                F.col("text"), F.lit(" zq"), F.col("_copy").cast("string")
            ).alias("text"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n = corpus.count()
    t0 = time.perf_counter()
    sh = shingles(corpus, id_col="id").localCheckpoint(eager=True)
    sig = minhash_signature(sh).localCheckpoint(eager=True)
    cands = lsh_candidates(sig, max_bucket_size=64)
    n_cand = cands.count()
    from relational_query_engine_sql_spark.datapipe.dedup import (
        jaccard_pairs,
    )

    verified = jaccard_pairs(sh, threshold=0.8, candidates=cands).count()
    wall = time.perf_counter() - t0
    print(f"| {n:,} ({copies}x{n0:,}) | {n_cand:,} | {verified:,} "
          f"| {wall:.1f} s |")


def probe_partition_layout(spark, sf_dir: str, copies: int):
    """The s25/s29 composition (partition layout + per-file stats +
    bloom masks) at sf1-equivalent FILE counts: `copies` commit waves
    of the sf0.1 orders table into a txnlog table partitioned by
    o_orderpriority and keyed by o_orderkey, then the three probe
    shapes the reference's dominant per-symbol pattern maps to
    (stocks.js:42-47): partition-value scan, narrow key-window scan,
    and bloom point lookup — recording files pruned and the log
    metadata bytes a planner actually reads (newest checkpoint +
    entries after it, vs the full log)."""
    import json as _json
    import tempfile

    from relational_query_engine_sql_spark.operators.txnlog import (
        TxnLogTable,
    )

    print("\n### Partition+stats+bloom layout at 10x files "
          "(s25/s29 composition)\n")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    n0 = orders.count()
    root = tempfile.mkdtemp(prefix="rqe-probe-part-")
    t = TxnLogTable(
        spark,
        f"{root}/orders",
        orders.schema,
        ["o_orderkey"],
        partition_by=["o_orderpriority"],
    )
    t0 = time.perf_counter()
    for c in range(copies):
        wave = orders.select(
            (F.col("o_orderkey") + c * 10_000_000).alias("o_orderkey"),
            "o_orderpriority",
            "o_totalprice",
        ).repartition(4)
        (t.init if c == 0 else t.append)(wave)
    build_wall = time.perf_counter() - t0
    live = t._live()
    n_files = len(live)
    parts = sorted({m["part"]["o_orderpriority"] for m in live.values()})

    # probe 1: partition value (the per-symbol scan)
    t0 = time.perf_counter()
    part_files = len(t.scan_candidates("o_orderpriority", parts[0], parts[0]))
    part_wall = time.perf_counter() - t0
    # probe 2: ~5% key window inside one wave (data-derived, the
    # registry's selectivity rule)
    lo, hi = 1, int(n0 * 4 * 0.05)  # orderkeys are 1..4n at sf0.1
    t0 = time.perf_counter()
    win_files = len(t.scan_candidates("o_orderkey", lo, hi))
    win_wall = time.perf_counter() - t0
    # probe 3: bloom point lookups (8 known keys, one per wave parity)
    keys = [1 + c * 10_000_000 for c in range(min(copies, 8))]
    t0 = time.perf_counter()
    bloom_files = len(t.lookup_candidates(keys))
    range_only = len(
        {
            p
            for k in keys
            for p in t.scan_candidates("o_orderkey", k, k)
        }
    )
    bloom_wall = time.perf_counter() - t0

    # plan-time metadata bytes: newest checkpoint + entries after it
    log_dir = f"{root}/orders/_txn_log"
    sizes = {
        f: os.path.getsize(os.path.join(log_dir, f))
        for f in os.listdir(log_dir)
    }
    total_bytes = sum(sizes.values())
    vs = t.versions()
    newest_ck = max(
        (v for v in vs if os.path.exists(t._ckpt_path(v))), default=None
    )
    if newest_ck is None:
        read_bytes = total_bytes
    else:
        read_bytes = sizes[os.path.basename(t._ckpt_path(newest_ck))] + sum(
            sizes.get(os.path.basename(t._log_path(v)), 0)
            for v in vs
            if v > newest_ck
        )
    print("| rows | files | partition probe | 5% key window | "
          "bloom 8-key lookup (range-only) | plan metadata read | "
          "build wall |")
    print("|---|---|---|---|---|---|---|")
    print(
        f"| {n0 * copies:,} | {n_files} "
        f"| {part_files}/{n_files} ({part_wall * 1000:.0f} ms) "
        f"| {win_files}/{n_files} ({win_wall * 1000:.0f} ms) "
        f"| {bloom_files}/{n_files} ({range_only} range-only, "
        f"{bloom_wall * 1000:.0f} ms) "
        f"| {read_bytes / 1024:.0f} KiB of {total_bytes / 1024:.0f} KiB "
        f"| {build_wall:.1f} s |"
    )


def probe_column_mapping(spark, sf_dir: str, copies: int):
    """Column mapping (s31) at sf1-equivalent file counts: the claim
    to verify is that RENAME COLUMN costs O(1) metadata regardless of
    table size, and that the logical->physical translation adds no
    measurable cost to plan-time pruning or reads. Build `copies`
    commit waves of the sf0.1 orders table (unpartitioned, keyed),
    time a 5% key-window prune and a sample read BEFORE the rename,
    rename a non-key column, and re-time the same probes through the
    new logical name."""
    import tempfile

    from relational_query_engine_sql_spark.operators.txnlog import (
        TxnLogTable,
    )

    print("\n### Column mapping at 10x files (s31, rename cost + "
          "post-rename pruning)\n")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    n0 = orders.count()
    root = tempfile.mkdtemp(prefix="rqe-probe-cmap-")
    t = TxnLogTable(spark, f"{root}/orders", orders.schema, ["o_orderkey"])
    for c in range(copies):
        wave = orders.select(
            (F.col("o_orderkey") + c * 10_000_000).alias("o_orderkey"),
            "o_orderpriority",
            "o_totalprice",
        ).repartition(4)
        (t.init if c == 0 else t.append)(wave)
    n_files = len(t._live())
    lo, hi = 1, int(n0 * 4 * 0.05)

    t0 = time.perf_counter()
    pre_files = len(t.scan_candidates("o_totalprice", 1000.0, 2000.0))
    pre_prune_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    pre_read = t.read_where("o_orderkey", lo, hi).count()
    pre_read_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    v = t.rename_column("o_totalprice", "total_price")
    rename_wall = time.perf_counter() - t0
    rename_bytes = os.path.getsize(t._log_path(v))

    t0 = time.perf_counter()
    post_files = len(t.scan_candidates("total_price", 1000.0, 2000.0))
    post_prune_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    post_read = t.read_where("o_orderkey", lo, hi).count()
    post_read_wall = time.perf_counter() - t0
    assert post_read == pre_read and post_files == pre_files

    print("| rows | files | rename wall | rename commit bytes | "
          "stats prune pre->post | 5% window read pre->post |")
    print("|---|---|---|---|---|---|")
    print(
        f"| {n0 * copies:,} | {n_files} "
        f"| {rename_wall * 1000:.0f} ms | {rename_bytes} B "
        f"| {pre_files}/{n_files} {pre_prune_wall * 1000:.0f} ms -> "
        f"{post_files}/{n_files} {post_prune_wall * 1000:.0f} ms "
        f"| {pre_read:,} rows {pre_read_wall:.2f} s -> "
        f"{post_read:,} rows {post_read_wall:.2f} s |"
    )


def probe_compact_small(spark, sf_dir: str, drips: int):
    """compact_small (s32) vs full compact at a streaming-sink-shaped
    layout: one well-sized base file plus `drips` micro-batch files.
    The claim: selective compaction costs O(small files) — the base
    file survives BY IDENTITY and its bytes are never read — while
    full compact() rewrites the table. Measured as wall time and
    files-rewritten for both paths on the same layout."""
    import tempfile

    from relational_query_engine_sql_spark.operators.txnlog import (
        TxnLogTable,
    )

    print("\n### Selective vs full compaction at a drip layout (s32)\n")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    n0 = orders.count()

    root = tempfile.mkdtemp(prefix="rqe-probe-cs-")
    t1 = TxnLogTable(spark, f"{root}/t", orders.schema, ["o_orderkey"])
    t1.init(orders.repartition(1))  # one big base file
    drip = orders.limit(drips * 3).collect()
    for i in range(drips):
        rows = [
            (
                int(r["o_orderkey"]) + 10_000_000 + i * 10,
                r["o_orderpriority"],
                float(r["o_totalprice"]),
            )
            for r in drip[i * 3 : i * 3 + 3]
        ]
        t1.append(
            spark.createDataFrame(rows, orders.schema).coalesce(1)
        )
    pre_compact = t1.current_version()
    before = set(t1._split_live()[0])
    big = [p for p in before if t1._live()[p]["rows"] == n0]
    t0 = time.perf_counter()
    t1.compact_small(max_rows=1000)
    small_wall = time.perf_counter() - t0
    after = set(t1._split_live()[0])
    small_rewrote = len(before - after)
    big_survived = big[0] in after

    # RESTORE (metadata-only) rewinds to the same drip layout, so the
    # full compact measures over the identical file set
    t1.restore(pre_compact)
    t0 = time.perf_counter()
    t1.compact(target_files=4)
    full_wall = time.perf_counter() - t0

    print("| base rows | drip files | compact_small wall "
          "(files rewritten, base survived) | full compact wall |")
    print("|---|---|---|---|")
    print(
        f"| {n0:,} | {drips} "
        f"| {small_wall:.1f} s ({small_rewrote} files, "
        f"{'yes' if big_survived else 'NO'}) "
        f"| {full_wall:.1f} s |"
    )


def main():
    quick = "--quick" in sys.argv
    spark = get_spark(app_name="scale-probe-sf1")
    emb_sizes = [20_000] if quick else [20_000, 200_000]
    probe_sign_lsh(spark, emb_sizes)
    probe_ivf(spark, emb_sizes)
    probe_minhash_docs(
        spark, "/root/testdata/sf0.1", copies=2 if quick else 10
    )
    probe_partition_layout(
        spark, "/root/testdata/sf0.1", copies=3 if quick else 10
    )
    probe_column_mapping(
        spark, "/root/testdata/sf0.1", copies=3 if quick else 10
    )
    probe_compact_small(
        spark, "/root/testdata/sf0.1", drips=20 if quick else 60
    )
    spark.stop()


if __name__ == "__main__":
    main()
