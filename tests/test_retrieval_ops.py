"""Hybrid-retrieval and product-quantization properties: fusion math,
rank density, PQ recall against the exact baseline, and the
plan-shape pins (broadcast codebook/LUT, no cross join in the fused
plan). Value-level cross-engine equality is covered by the oracle
registry (tools/driver_sim.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from relational_query_engine_sql_spark import plans
from relational_query_engine_sql_spark.datapipe.similarity import (
    pq_adc_topk,
)
from relational_query_engine_sql_spark.sources import load_table


def test_rrf_scores_match_rank_formula(spark, sf_small):
    """Every fused score must equal 1/(60+rnk_lex) + 1/(60+rnk_sem)
    with absent lists contributing zero."""
    rows = plans.get("search_hybrid_rrf").fn(spark, sf_small).collect()
    assert rows, "hybrid fusion returned no rows"
    for r in rows:
        expect = 0.0
        if r["rnk_lex"] is not None:
            expect += 1.0 / (60 + r["rnk_lex"])
        if r["rnk_sem"] is not None:
            expect += 1.0 / (60 + r["rnk_sem"])
        assert abs(r["rrf"] - expect) < 1e-9
    ranks = sorted(r["rnk"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # fusion actually fused: both retrievers place docs in the top-k
    # (the synthetic embeddings are uncorrelated with the text, so a
    # doc in BOTH branch top-20s is not guaranteed — RRF interleaving
    # of the two branch heads is)
    assert any(r["rnk_lex"] is not None for r in rows)
    assert any(r["rnk_sem"] is not None for r in rows)


def test_pq_adc_recall_and_exact_rerank(spark, sf_small):
    """ADC over a 16-code seed codebook is lossy, but the coarse
    geometry must survive: each query's ADC top-10 keeps ≥1 of the
    exact squared-L2 top-10 and ≥5 of the exact top-50 (measured
    headroom: 4/5/1 and 8/8/6 across the three queries), ADC
    distances are non-decreasing in rank, and the standard second
    stage — exact re-ranking of the ADC survivors on the float
    vectors — reproduces the true L2 order restricted to the
    candidate set."""
    import numpy as np

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    rows = pq_adc_topk(emb, q, m=8, k_codes=16, k=10, dim=64).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    vec_rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in vec_rows])
    V = np.array([r["embedding"] for r in vec_rows], dtype=np.float64)
    by_id = {int(i): V[j] for j, i in enumerate(ids)}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        dists = [r["adc"] for r in rs]
        assert dists == sorted(dists)
        d = ((V - by_id[qid]) ** 2).sum(axis=1)
        order = [int(i) for i in ids[np.argsort(d, kind="stable")] if i != qid]
        cand = {r["vec_id"] for r in rs}
        assert len(cand & set(order[:10])) >= 1, qid
        assert len(cand & set(order[:50])) >= 5, qid
        # exact second stage in Spark: re-score the survivors on the
        # float vectors with l2sq and check it reproduces numpy's
        # exact order restricted to the candidate set
        from relational_query_engine_sql_spark.datapipe.similarity import (
            as_double,
            l2sq,
        )

        qv = F.array(*[F.lit(float(x)) for x in by_id[qid]])
        rerank_rows = (
            emb.filter(F.col("vec_id").isin([int(v) for v in cand]))
            .select(
                "vec_id",
                l2sq(as_double(F.col("embedding")), qv).alias("d2"),
            )
            .orderBy("d2", "vec_id")
            .collect()
        )
        rerank = [r["vec_id"] for r in rerank_rows]
        true_sub = [v for v in order if v in cand]
        assert rerank == true_sub


def test_pq_plan_broadcasts_codebook_and_lut(spark, sf_small):
    """The codes⋈LUT and subvector⋈codebook joins must be broadcast
    hash joins — nothing in the PQ pipeline may shuffle the corpus
    except the two keyed aggregates (encode argmin, ADC sum)."""
    df = plans.get("ann_pq_adc_topk").fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hybrid_plan_has_no_cartesian(spark, sf_small):
    df = plans.get("search_hybrid_rrf").fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_er_planted_variants_resolve_to_source(spark, sf_small):
    """Every planted typo'd name must land in the same entity as its
    source name, and no entity may be a singleton variant (a variant
    always has its source in-corpus)."""
    from relational_query_engine_sql_spark.plans.queries_er import (
        _ER_OFFSET,
        _dirty_catalog,
        er_resolve_entities,
    )

    cat = _dirty_catalog(spark, sf_small)
    names = {r["rec_id"]: r["name"] for r in cat.collect()}
    out = er_resolve_entities(spark, sf_small).collect()
    # group count conservation: entity record counts sum to the catalog
    assert sum(r["n_records"] for r in out) == len(names)
    # rebuild name->entity via a second grouping pass in the operator's
    # own terms: entity label of a variant's name group must equal the
    # label of its source's name group
    name_min: dict[str, int] = {}
    for rid, nm in names.items():
        name_min[nm] = min(name_min.get(nm, rid), rid)
    labels = {
        r["entity"]
        for r in out
    }
    # every variant name's min-id is >= OFFSET only when the typo'd
    # string never occurs organically; those entities must NOT appear
    # as labels (they merged into a smaller organic id)
    variant_only_ids = {
        mn for nm, mn in name_min.items() if mn >= _ER_OFFSET
    }
    assert variant_only_ids, "derivation produced no variant names"
    assert not (variant_only_ids & labels), (
        "planted variants failed to merge with their source entities"
    )


def test_eval_dedup_recall_bounds(spark, sf_small):
    """Precision/recall must be valid ratios and the LSH candidate
    stage must find at least as many pairs as it misses on this
    corpus (banding with 2 bands of 2 hashes is permissive)."""
    row = plans.get("eval_dedup_recall").fn(spark, sf_small).collect()[0]
    assert row["n_found"] <= row["n_cand"]
    assert row["n_found"] <= row["n_true"]
    if row["n_true"]:
        assert 0.0 <= row["recall"] <= 1.0
    if row["n_cand"]:
        assert 0.0 <= row["precision"] <= 1.0


def test_interval_overlap_join_is_hash_join(spark, sf_small):
    """The banded overlap join must plan as an equi-join on the band
    id (SMJ or shuffled-hash), never a nested-loop/cartesian — and
    every emitted pair must satisfy the overlap predicate with a
    non-negative overlap."""
    df = plans.get("j17_interval_overlap").fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    rows = df.collect()
    assert all(r["ov_us"] >= 0 for r in rows)
    # ordered-pair convention: no pair appears twice
    seen = {(r["u1"], r["s1"], r["u2"], r["s2"]) for r in rows}
    assert len(seen) == len(rows)


def test_survivorship_latest_nonnull_wins(spark, sf_small):
    """Updated customers must take the v2 balance but KEEP the v1
    segment (the v2 partial update carries a null segment);
    untouched customers pass through verbatim."""
    base = {
        r["c_custkey"]: r
        for r in load_table(spark, sf_small, "customer").collect()
    }
    out = {
        r["c_custkey"]: r
        for r in plans.get("er_survivorship").fn(spark, sf_small).collect()
    }
    assert set(out) == set(base)
    for key, r in out.items():
        b = base[key]
        if key % 10 == 0:
            assert r["n_versions"] == 2
            assert abs(r["c_acctbal"] - (b["c_acctbal"] + 100.0)) < 1e-9
        else:
            assert r["n_versions"] == 1
            assert r["c_acctbal"] == b["c_acctbal"]
        assert r["c_mktsegment"] == b["c_mktsegment"]
        assert r["c_name"] == b["c_name"]


def test_driver_embedding_dim_matches_pq_constant(spark, sf_small):
    """ann_pq_adc_topk pins dim=64 (TESTDATA.md contract) to avoid a
    sizing job in the query; if a future data generation changes the
    embedding width this must fail HERE, loudly, not as silently
    truncated subvectors."""
    from relational_query_engine_sql_spark.plans.queries_retrieval import (
        _PQ_DIM,
    )

    first = load_table(spark, sf_small, "embeddings").first()
    assert len(first["embedding"]) == _PQ_DIM


def test_pq_codebook_survives_shifted_id_space(spark, sf_small):
    """pq_codebook seeds from the k SMALLEST ids, not `id < k`: a
    corpus whose ids start above k (a sharded export, a snapshot with
    reassigned ids) must still produce a full m*k codebook — the old
    filter-based seed returned an EMPTY codebook there and every PQ
    query downstream silently returned no rows."""
    import pytest

    from relational_query_engine_sql_spark.datapipe.similarity import (
        pq_codebook,
    )

    emb = load_table(spark, sf_small, "embeddings")
    shifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    cb = pq_codebook(shifted, m=8, k=16, dsub=8)
    assert cb.count() == 8 * 16
    codes = sorted(
        r["code"] for r in cb.filter(F.col("sub") == 0).collect()
    )
    assert codes == list(range(16))

    # and a corpus with fewer than k vectors fails LOUDLY, not empty
    # (ValueError, not assert: the check must survive ``python -O``)
    tiny = emb.filter(F.col("vec_id") < 5)
    with pytest.raises(ValueError, match="fewer than k"):
        pq_codebook(tiny, m=8, k=16, dsub=8)


def test_mmr_rerank_diversity_and_shape(spark, sf_small):
    """MMR invariants: rank 1 equals plain cosine rank 1 (no penalty
    yet); every selection comes from the candidate pool; the selected
    set's mean pairwise similarity is <= the plain top-k set's (the
    diversity property MMR exists for); ranks are 1..k per query."""
    from relational_query_engine_sql_spark.datapipe.similarity import (
        cosine_topk,
        mmr_rerank,
    )

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    k, pool = 4, 10
    top = cosine_topk(emb, queries, k=pool)
    sel = mmr_rerank(emb, queries, k=k, pool=pool)
    sel_rows = sel.collect()
    top_rows = top.collect()
    by_q_sel = {}
    for r in sel_rows:
        by_q_sel.setdefault(r["query_id"], {})[r["mmr_rank"]] = r["vec_id"]
    by_q_top = {}
    for r in top_rows:
        by_q_top.setdefault(r["query_id"], {})[r["rnk"]] = r["vec_id"]
    import itertools

    import numpy as np

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for r in emb.collect()
    }

    def cos(a, b):
        return float(
            vecs[a] @ vecs[b]
            / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
        )

    def mean_pairwise(ids):
        ps = [cos(a, b) for a, b in itertools.combinations(ids, 2)]
        return sum(ps) / len(ps)

    for q, ranks in by_q_sel.items():
        assert sorted(ranks) == list(range(1, k + 1))
        assert ranks[1] == by_q_top[q][1]  # first pick = top cosine
        pool_ids = set(by_q_top[q].values())
        assert set(ranks.values()) <= pool_ids
        mmr_ids = [ranks[i] for i in range(1, k + 1)]
        topk_ids = [by_q_top[q][i] for i in range(1, k + 1)]
        if set(mmr_ids) != set(topk_ids):
            assert (
                mean_pairwise(mmr_ids) <= mean_pairwise(topk_ids) + 1e-12
            ), f"MMR set is LESS diverse than top-k for query {q}"
