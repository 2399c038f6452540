"""The JVM expression path and the numpy mapInPandas path for
brute-force cosine top-k must produce identical rankings."""

from __future__ import annotations

from relational_query_engine_sql_spark import plans


def test_ivf_recall_tracks_coverage(spark, sf_oracle):
    """IVF trades recall for a fan-out-factor scan reduction; recall
    can never beat the probed coverage fraction unless the space is
    clustered. The driver's synthetic embeddings are isotropic
    (nearest neighbor shares its label at ~chance rate), so the honest
    pin is: some overlap with the exact top-5 (the probe works at all),
    and every IVF hit must itself be a true neighbor ranking —
    IVF == brute force restricted to the probed bucket, which the
    DuckDB oracle already enforces exactly."""
    exact = plans.get("ann_bruteforce_topk").fn(spark, sf_oracle).collect()
    ivf = plans.get("ann_ivf_topk").fn(spark, sf_oracle).collect()
    truth = {}
    for r in exact:
        if r["rnk"] <= 5:
            truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in ivf:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(got) == set(truth)  # every query answered
    recalls = [
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ]
    # ~1/n_buckets coverage on isotropic data; zero everywhere would
    # mean the probe selection broke
    assert sum(recalls) > 0, recalls


def test_lsh_near_dups_match_brute_force_on_planted_dups(spark):
    """The canonical LSH-bucketed near-dup path must find exactly the
    pairs the all-pairs baseline finds on data WITH real near-dups.

    Planted set: 40 isotropic base vectors (dim 32) plus 10
    perturbed copies (cos ≈ 0.99 to their source) — the LSH miss
    probability at that similarity is < 1e-8 per pair with the default
    16×8 bands, and the hyperplanes are seed-deterministic, so exact
    set equality is a stable assertion, not a flaky one."""
    import numpy as np

    from relational_query_engine_sql_spark.datapipe.similarity import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 32))
    dups = base[:10] + 0.05 * rng.standard_normal((10, 32))
    vecs = np.vstack([base, dups])
    rows = [
        (i, [float(x) for x in v]) for i, v in enumerate(vecs)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {
        (r["v1"], r["v2"], r["cos"])
        for r in embedding_near_dups(emb, threshold=0.9).collect()
    }
    lsh = {
        (r["v1"], r["v2"], r["cos"])
        for r in embedding_near_dups_lsh(emb, threshold=0.9).collect()
    }
    assert len(brute) >= 10  # the plants are actually near-dups
    assert lsh == brute


def test_lsh_near_dup_plan_has_no_cartesian(spark):
    """The registered dedup_embedding_cosine plan must be band-key
    equi-joins — no BroadcastNestedLoopJoin / CartesianProduct over the
    pair space."""
    df = plans.get("dedup_embedding_cosine").fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_numpy_topk_matches_jvm_topk(spark, sf_oracle):
    jvm = plans.get("ann_bruteforce_topk").fn(spark, sf_oracle).collect()
    npy = plans.get("ann_bruteforce_numpy").fn(spark, sf_oracle).collect()
    assert len(jvm) == len(npy) > 0
    j = {(r["query_id"], r["rnk"]): (r["vec_id"], r["cos"]) for r in jvm}
    n = {(r["query_id"], r["rnk"]): (r["vec_id"], r["cos"]) for r in npy}
    assert j.keys() == n.keys()
    for key in j:
        assert j[key][0] == n[key][0], (key, j[key], n[key])
        assert abs(j[key][1] - n[key][1]) <= 2e-9


def test_pca_whiten_matches_direct_numpy(spark, sf_oracle):
    """The distributed partial-Gram covariance must equal the direct
    numpy covariance of the collected matrix (same float64 math,
    different reduction tree), and the whitening pipeline's output
    must equal (X - mu) @ W computed directly."""
    import numpy as np

    import pyspark.sql.functions as F
    from relational_query_engine_sql_spark.datapipe.similarity import (
        as_double,
        covariance_from_partials,
        gram_partials,
        pca_whiten_model,
        project_whiten,
    )
    from relational_query_engine_sql_spark.sources import load_table

    emb = (
        load_table(spark, sf_oracle, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .repartition(7)  # force several partial rows
    )
    n, mu, cov = covariance_from_partials(gram_partials(emb).collect())

    rows = emb.collect()
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    ids = np.asarray([r["vec_id"] for r in rows])
    assert n == len(X)
    np.testing.assert_allclose(mu, X.mean(axis=0), rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        cov, np.cov(X, rowvar=False), rtol=1e-9, atol=1e-9
    )

    lam, V, W = pca_whiten_model(cov)
    got = {
        r["vec_id"]: np.asarray(r["y"])
        for r in project_whiten(emb, mu, W).collect()
    }
    want = (X - mu) @ W
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], want[i], atol=1e-9)
    # the defining property: whitening its own covariance yields I_k
    Y = np.asarray([got[v] for v in sorted(got)])
    np.testing.assert_allclose(
        np.cov(Y, rowvar=False), np.eye(W.shape[1]), atol=1e-8
    )

def test_pca_whiten_guards_and_id_col(spark):
    """Degenerate-input guards (empty partials, n < 2, constant
    embeddings) raise clear ValueErrors, and project_whiten emits the
    caller's id_col name (round-10 advice: the pandas column name must
    follow the parameter, not hardcode 'vec_id')."""
    import numpy as np
    import pytest

    from relational_query_engine_sql_spark.datapipe.similarity import (
        covariance_from_partials,
        pca_whiten_model,
        project_whiten,
    )

    with pytest.raises(ValueError, match="no partials"):
        covariance_from_partials([])
    with pytest.raises(ValueError, match="n >= 2"):
        covariance_from_partials([{"n": 1, "s": [1.0], "g": [1.0]}])
    with pytest.raises(ValueError, match="constant/degenerate"):
        pca_whiten_model(np.zeros((3, 3)))

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 2.0]), (3, [3.0, 1.0])],
        "doc_id long, v array<double>",
    )
    out = project_whiten(
        emb, np.array([0.0, 0.0]), np.eye(2), id_col="doc_id"
    )
    assert out.columns == ["doc_id", "y"]
    got = {r["doc_id"]: r["y"] for r in out.collect()}
    assert sorted(got) == [1, 2, 3]
    np.testing.assert_allclose(got[3], [3.0, 1.0], atol=1e-12)
