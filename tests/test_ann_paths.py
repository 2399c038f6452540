"""The JVM expression path and the numpy mapInPandas path for
brute-force cosine top-k must produce identical rankings."""

from __future__ import annotations

from relational_query_engine_sql_spark import plans


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
