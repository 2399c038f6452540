"""Hybrid retrieval and compressed-index ANN queries (beyond-reference,
SURVEY.md §7): the retrieval stack a RAG / training-data pipeline runs
on top of the corpus tables.

- ``search_hybrid_rrf`` — BM25 keyword top-k ⊕ dense cosine top-k,
  merged with reciprocal-rank fusion (datapipe/search.py documents the
  plan shape: both branches are bounded top-``pool`` lists, so fusion
  cost is corpus-size-independent).
- ``ann_pq_adc_topk`` — product-quantization ANN: subvector codebooks,
  corpus rows encoded to one byte per subspace, queries scored against
  codes via asymmetric distance (ADC). The memory-compression scale
  path: a 100 TB float corpus becomes ~1.5 TB of codes that fit the
  cluster's RAM, and the scan reads codes, not vectors.

Documents and embeddings share the id space in the driver corpus
(vec_id ≡ doc_id), which is what lets one query fuse both retrievers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table, spread
from .registry import query

_HYBRID_TERMS = ["spark", "join", "window"]
_HYBRID_QVEC = 0
_HYBRID_POOL = 20
_HYBRID_K = 10


def _hybrid_oracle() -> str:
    from ..datapipe.search import hybrid_rrf_oracle_sql

    return hybrid_rrf_oracle_sql(
        _HYBRID_TERMS, _HYBRID_QVEC, k=_HYBRID_K, pool=_HYBRID_POOL
    )


@query(
    "search_hybrid_rrf",
    survey="beyond:hybrid-retrieval",
    priority=60,
    oracle=_hybrid_oracle(),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid BM25 ⊕ dense retrieval fused with reciprocal-rank
    fusion — rank-space merging needs no score calibration between
    the lexical and semantic retrievers."""
    from ..datapipe.search import hybrid_rrf_topk

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return hybrid_rrf_topk(
        docs, emb, _HYBRID_TERMS, _HYBRID_QVEC, k=_HYBRID_K, pool=_HYBRID_POOL
    )


# --------------------------------------------------------------------------
# Product-quantization ANN (datapipe/similarity.py: pq_codebook /
# pq_encode / pq_adc_topk). The oracle mirrors every stage — seed
# codebook, rounded-argmin encode, LUT, ADC sum — with the same
# ⟨a,a⟩−2⟨a,b⟩+⟨b,b⟩ expression form (list_inner_product), the same
# 6 dp rounding before each argmin and 4 dp before the final rank, so
# the full compressed-index pipeline hash-compares across engines.
# --------------------------------------------------------------------------
_PQ_M = 8  # subspaces
_PQ_DIM = 64  # embedding dim in every driver-generated SF (TESTDATA.md)
_PQ_CODES = 16  # centroids per subspace (seed-sample codebook)
_PQ_NQ = 5  # query vectors: vec_id < 5, as in the other ANN queries
_PQ_K = 10

_PQ_DSUB = _PQ_DIM // _PQ_M
_IP = "list_inner_product"


def _pq_oracle() -> str:
    d2 = (
        f"ROUND({_IP}({{a}}, {{a}}) - 2 * {_IP}({{a}}, {{b}})"
        f" + {_IP}({{b}}, {{b}}), 6)"
    )
    enc_d2 = d2.format(a="s.sv", b="cb.cent")
    lut_d2 = d2.format(a="q.sv", b="cb.cent")
    return f"""
    WITH ms AS (
        SELECT UNNEST(generate_series(0, {_PQ_M - 1})) AS sub
    ),
    base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    subv AS (
        SELECT vec_id, ms.sub,
               list_slice(v, ms.sub * {_PQ_DSUB} + 1,
                          ms.sub * {_PQ_DSUB} + {_PQ_DSUB}) AS sv
        FROM base CROSS JOIN ms
    ),
    cb AS (
        SELECT sub, CAST(vec_id AS INT) AS code, sv AS cent
        FROM subv WHERE vec_id < {_PQ_CODES}
    ),
    enc AS (
        SELECT s.vec_id, s.sub, cb.code
        FROM subv s JOIN cb ON s.sub = cb.sub
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY s.vec_id, s.sub
            ORDER BY {enc_d2}, cb.code
        ) = 1
    ),
    lut AS (
        SELECT q.vec_id AS query_id, cb.sub, cb.code, {lut_d2} AS qd2
        FROM subv q JOIN cb ON q.sub = cb.sub
        WHERE q.vec_id < {_PQ_NQ}
    ),
    adc AS (
        SELECT lut.query_id, enc.vec_id, ROUND(SUM(qd2), 4) AS adc
        FROM enc JOIN lut ON enc.sub = lut.sub AND enc.code = lut.code
        WHERE enc.vec_id <> lut.query_id
        GROUP BY lut.query_id, enc.vec_id
    )
    SELECT query_id, vec_id, adc,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY adc, vec_id
           ) AS INT) AS rnk
    FROM adc
    QUALIFY rnk <= {_PQ_K}
    """


@query(
    "ann_pq_adc_topk",
    survey="beyond:ann-pq",
    priority=60,
    oracle=_pq_oracle(),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-index ANN: PQ encode + asymmetric-distance top-k."""
    from ..datapipe.similarity import pq_adc_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"), spark)
    q = emb.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return pq_adc_topk(
        emb, q, m=_PQ_M, k_codes=_PQ_CODES, k=_PQ_K, dim=_PQ_DIM
    )


# --------------------------------------------------------------------------
# Model-free RAG retrieval (datapipe/search.py:hashed_chunk_retrieval):
# chunk → signed hashed-TF embed → sparse cosine top-k, every stage
# exact arithmetic so the full composition hash-compares. A real
# deployment swaps the embedding stage for a neural encoder and keeps
# the plan shape.
# --------------------------------------------------------------------------
_RAG_TERMS = ["spark", "shuffle", "partition", "join", "window"]
_RAG_K = 15


def _rag_oracle() -> str:
    from ..datapipe.search import hashed_chunk_retrieval_oracle_sql

    return hashed_chunk_retrieval_oracle_sql(_RAG_TERMS, k=_RAG_K)


@query(
    "rag_chunk_retrieval",
    survey="beyond:rag-retrieval,beyond:chunking",
    priority=60,
    oracle=_rag_oracle(),
)
def rag_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.search import hashed_chunk_retrieval

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return hashed_chunk_retrieval(docs, _RAG_TERMS, k=_RAG_K)
