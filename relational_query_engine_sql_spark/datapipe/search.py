"""Inverted-index keyword retrieval (BM25) over the documents table.

A training-data pipeline needs keyword search for corpus triage
(find documents about X, audit what a dedup pass removed, seed
retrieval evaluation sets). The classic engine for that is an
inverted index + BM25 ranking; on Spark both are plain DataFrames:

- postings: explode tokens → groupBy (term, doc) count — one shuffle
  keyed by (term, doc), the distributed build of the inverted index.
  At 100 TB the posting table is the corpus token multiset, stored
  partitioned by term; skewed stopword terms are bounded here by
  filtering to the query's terms BEFORE the tf aggregation, so a
  scoring run only ever shuffles postings for the handful of terms in
  the query.
- document length + corpus stats: a second aggregate over the token
  stream; ``avgdl`` and ``N`` are scalars carried via a broadcast
  cross-join (no driver round-trip inside the plan).
- score: Robertson/Lucene BM25 —
  idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
  tf_norm = tf·(k1+1)/(tf + k1·(1-b + b·dl/avgdl)) —
  all JVM expressions, whole-stage codegen.

Ranking determinism: the top-k window orders by the ROUNDED score
(6 dp) with doc_id as tiebreak, so equal-scoring duplicates rank
stably and an independent engine (the DuckDB oracle) reproduces the
exact row set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def tokens_long(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term) token stream — lowercased whitespace tokens, the
    same tokenizer the quality metrics use."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    Output: (doc_id, score, rnk) for the k best-scoring documents
    that match at least one query term.
    """
    # Dedupe at entry (input-order stable): the per-term unpivot below
    # emits one (doc, term, tf) row per LIST OCCURRENCE, so a repeated
    # query term would double its df and sum its score contribution
    # twice, where a groupBy(doc, term) formulation (and the SQL
    # IN-list oracle) is duplicate-insensitive. Registered call sites
    # already pass distinct terms; this pins the library contract.
    query_terms = list(dict.fromkeys(query_terms))
    toks = tokens_long(docs, id_col, text_col)
    # ONE aggregate computes document length AND the per-query-term
    # counts together (the measured plan of the dl/tf/df/stats chain
    # held FOUR independent tokenize subtrees — scan+explode per
    # branch; guide §1.2: don't re-derive what one pass can carry).
    # The result is one row per document — metadata-plane at any
    # corpus size — so the lineage cut that lets stats and the term
    # unpivot share it is cheap everywhere.
    per_doc = (
        toks.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.count(F.when(F.col("term") == t, F.lit(1))).alias(
                    f"_tf_{i}"
                )
                for i, t in enumerate(query_terms)
            ],
        )
        .localCheckpoint(eager=True)
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # Unpivot the per-term counts back to the (doc, term, tf) posting
    # shape the scorer uses; tf > 0 keeps exactly the pairs the old
    # filter-then-count produced.
    tf = (
        per_doc.select(
            "doc",
            "dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.col(f"_tf_{i}").alias("tf"),
                        )
                        for i, t in enumerate(query_terms)
                    ]
                )
            ).alias("kv"),
        )
        .select("doc", "dl", "kv.term", "kv.tf")
        .filter(F.col("tf") > 0)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (K1 + 1))
                / (
                    F.col("tf")
                    + K1
                    * (1 - B + B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
        .groupBy("doc")
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )
    # Distributed partial top-k (TakeOrderedAndProject) first; the
    # global rank window then runs over only the k survivors, so no
    # full-result single-partition exchange exists in the plan.
    topk = scored.orderBy(F.col("score").desc(), F.col("doc")).limit(k)
    w = W.orderBy(F.col("score").desc(), F.col("doc"))
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        F.col("doc").alias(id_col), "score", "rnk"
    )


def bm25_oracle_sql(query_terms: list[str], k: int = 10) -> str:
    """DuckDB twin of :func:`bm25_topk` on the ``documents`` view."""
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return rf"""
    WITH toks AS (
        SELECT doc_id AS doc,
               UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents
    ),
    dl AS (SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc, term, COUNT(*) AS tf
        FROM toks WHERE term IN ({inlist})
        GROUP BY doc, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc,
               ROUND(SUM(
                   LN(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * (tf.tf * ({K1} + 1))
                   / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))
               ), 6) AS score
        FROM tf
        JOIN dfreq USING (term)
        JOIN dl ON dl.doc = tf.doc
        CROSS JOIN stats s
        GROUP BY tf.doc
    ),
    ranked AS (
        SELECT doc AS doc_id, score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS INT
               ) AS rnk
        FROM scored
    )
    SELECT doc_id, score, rnk FROM ranked WHERE rnk <= {k}
    """


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document under TF-IDF.

    The corpus-triage twin of BM25: instead of scoring documents for a
    query, score terms for a document (keyword extraction / topic
    fingerprinting for mixture audits). Plan shape at 100 TB:

    - tf: one shuffle keyed (doc, term) with map-side combine — the
      same distributed postings build BM25 uses;
    - df: aggregate of tf keyed by term (postings are already unique
      per (doc, term), so COUNT(*) is document frequency);
    - n_docs: scalar via broadcast cross-join, no driver round-trip;
    - ranking: window partitioned by doc over the per-doc term list —
      the shuffle is keyed by doc and each partition holds only that
      doc's distinct terms.

    Ranking determinism: scores are rounded to 6 dp BEFORE the window
    orders on them (term asc tiebreak), so a sub-rounding ulp
    difference between engines' ln() cannot reorder the top-k.
    """
    toks = tokens_long(docs, id_col, text_col).filter(F.col("term") != "")
    # tf feeds BOTH the df aggregate and the scorer; column pruning
    # gives the two branches different scan schemas, so ReusedExchange
    # never fires and the corpus tokenized TWICE (measured: 4 explode
    # subtrees in the plan). Materializing the postings once is the
    # inverted-index build every search system persists anyway.
    # Trade-offs of the eager localCheckpoint (not free): plan-build
    # becomes an action, the postings (O(distinct doc-term pairs), far
    # smaller than the token stream but corpus-scale) land in executor
    # storage, and they are NOT recomputable on executor loss — a
    # deployment that cannot afford either swaps this for a persisted
    # index table (write + read back) at the same cut point.
    tf = (
        toks.groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("doc").alias(id_col), "term", "score", "rnk")
    )


def tfidf_oracle_sql(k: int = 3) -> str:
    """DuckDB twin of :func:`tfidf_topk_terms` on the ``documents``
    view (same tokenizer, same rounded-before-rank determinism)."""
    return rf"""
    WITH toks AS (
        SELECT doc_id AS doc,
               UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc, tf.term,
               ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / dfreq.df),
                     6) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc AS doc_id, term, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc ORDER BY score DESC, term
               ) AS INT) AS rnk
        FROM scored
    )
    SELECT doc_id, term, score, rnk FROM ranked WHERE rnk <= {k}
    """


def phrase_match(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact consecutive-phrase search via positional postings.

    The positional index is (doc, pos, term) from one posexplode; an
    n-term phrase is an (n-1)-way self-join on doc with pos offsets —
    the classic IR positional-intersection, expressed as hash
    equi-joins on (doc, pos+i). Each join leg is pre-filtered to ONE
    term, so at 100 TB only the phrase terms' postings ever shuffle
    (same skew bound as the BM25 scorer). Output: (doc_id, n_hits)
    for documents containing the phrase at least once.
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("pos", "term"),
    )
    legs = [
        toks.filter(F.col("term") == w).select(
            "doc", (F.col("pos") - i).alias("anchor")
        )
        for i, w in enumerate(phrase)
    ]
    hits = legs[0]
    for leg in legs[1:]:
        hits = hits.join(leg, ["doc", "anchor"])
    return hits.groupBy(F.col("doc").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_hits")
    )


RRF_K = 60  # the standard reciprocal-rank-fusion constant (Cormack 2009)


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    k: int = 10,
    kc: int = RRF_K,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists.

    RRF(d) = Σ_lists 1/(kc + rank_list(d)) — the standard way a RAG
    pipeline merges keyword (BM25) and dense (embedding) retrieval
    without score calibration: ranks are comparable across scorers
    even when raw scores are not.

    Inputs are (id, rnk) frames of bounded size (each a top-``pool``
    from its retriever), so the fusion join is over at most
    2·pool rows no matter the corpus size — at 100 TB the heavy
    lifting stays in the two retriever branches (each independently
    scale-shaped) and this merge is effectively free. Determinism:
    each RRF term is an exact IEEE division of integer-valued inputs
    added in a fixed order (lex + sem), rounded to 9 dp before the
    final rank, doc id as tiebreak.

    Output: (doc_id, rrf, rnk_lex, rnk_sem, rnk) — the source ranks
    are kept (nullable: a doc found by only one retriever has one
    NULL rank) so downstream evaluation can attribute the fusion.
    """
    a = lex.select(F.col(id_col), F.col("rnk").alias("rnk_lex"))
    b = sem.select(F.col(id_col), F.col("rnk").alias("rnk_sem"))
    term = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(kc) + F.col(c).cast("double")), F.lit(0.0)
    )
    fused = a.join(b, id_col, "full_outer").select(
        id_col,
        F.round(term("rnk_lex") + term("rnk_sem"), 9).alias("rrf"),
        "rnk_lex",
        "rnk_sem",
    )
    w = W.orderBy(F.col("rrf").desc(), F.col(id_col))
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    pool: int = 20,
    kc: int = RRF_K,
) -> DataFrame:
    """Hybrid retrieval: BM25 keyword top-``pool`` ∪ dense cosine
    top-``pool``, fused with reciprocal-rank fusion.

    The full RAG retrieval stack as one declarative plan: the lexical
    branch is the inverted-index BM25 scorer (postings equi-joins,
    query-term pre-filter), the dense branch is brute-force cosine
    against the query vector (broadcast query, one candidate pass —
    swap in ``ivf_topk`` for the bucketed scale path; ranking
    contract is identical). Both branches end in bounded top-``pool``
    lists, so fusion cost is independent of corpus size.
    """
    from .similarity import cosine_topk

    lex = bm25_topk(docs, query_terms, k=pool)
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    sem = cosine_topk(emb, q, k=pool).select(
        F.col("vec_id").alias("doc_id"), "rnk"
    )
    return rrf_fuse(
        lex.select("doc_id", "rnk"), sem, k=k, kc=kc
    )


def hybrid_rrf_oracle_sql(
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    pool: int = 20,
    kc: int = RRF_K,
) -> str:
    """DuckDB twin of :func:`hybrid_rrf_topk` (documents ⊕ embeddings
    share the id space in the driver corpus: vec_id ≡ doc_id)."""
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return rf"""
    WITH toks AS (
        SELECT doc_id AS doc,
               UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents
    ),
    dl AS (SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc, term, COUNT(*) AS tf
        FROM toks WHERE term IN ({inlist})
        GROUP BY doc, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    lex_scored AS (
        SELECT tf.doc,
               ROUND(SUM(
                   LN(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * (tf.tf * ({K1} + 1))
                   / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))
               ), 6) AS score
        FROM tf
        JOIN dfreq USING (term)
        JOIN dl ON dl.doc = tf.doc
        CROSS JOIN stats s
        GROUP BY tf.doc
    ),
    lex AS (
        SELECT doc AS doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS INT
               ) AS rnk
        FROM lex_scored
        QUALIFY rnk <= {pool}
    ),
    qv AS (
        SELECT CAST(embedding AS DOUBLE[]) AS q
        FROM embeddings WHERE vec_id = {query_vec_id}
    ),
    sem AS (
        SELECT e.vec_id AS doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), qv.q), 9) DESC,
                   e.vec_id
               ) AS INT) AS rnk
        FROM embeddings e CROSS JOIN qv
        WHERE e.vec_id <> {query_vec_id}
        QUALIFY rnk <= {pool}
    ),
    fused AS (
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / ({kc} + lex.rnk), 0)
                     + COALESCE(1.0 / ({kc} + sem.rnk), 0), 9) AS rrf,
               lex.rnk AS rnk_lex, sem.rnk AS rnk_sem
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id, rrf, rnk_lex, rnk_sem,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rnk
    FROM fused
    QUALIFY rnk <= {k}
    """


HASH_DIM = 32  # hashed-TF embedding buckets


def _hash_bucket_sign(term: Column) -> tuple[Column, Column]:
    """Engine-neutral signed hashing: bucket and sign from md5 hex
    digits (the same trick feat_hash_bucketize uses — F.conv here,
    strpos arithmetic in the DuckDB twin)."""
    h = F.md5(term)
    bucket = F.conv(F.substring(h, 31, 2), 16, 10).cast("int") % HASH_DIM
    sign = F.when(
        F.conv(F.substring(h, 1, 1), 16, 10).cast("int") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return bucket, sign


def hashed_tf_sparse(toks: DataFrame, key_cols: list[str]) -> DataFrame:
    """Signed hashed-TF sparse vectors: (keys..., bucket, w), zero
    weights dropped. Integer weights — exact in every engine."""
    bucket, sign = _hash_bucket_sign(F.col("term"))
    return (
        toks.select(*key_cols, bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(*key_cols, "bucket")
        .agg(F.sum("sign").alias("w"))
        .filter(F.col("w") != 0)
    )


def hashed_chunk_retrieval(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 15,
    size: int = 30,
    overlap: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-free RAG retrieval, end to end: sliding-window chunking →
    signed hashed-TF chunk embeddings → sparse cosine top-k.

    The full index-and-retrieve composition a RAG pipeline runs, with
    the neural encoder swapped for feature hashing so every stage is
    exact integer/IEEE arithmetic and the whole pipeline hash-compares
    across engines (a production system changes ONE stage — the
    embedding — and keeps this plan shape). Scale shape: chunking is
    narrow (no shuffle), the vector build is one keyed aggregate with
    map-side combine, the query vector is broadcast (≤ HASH_DIM
    rows), scoring is a broadcast equi-join on the bucket id + one
    keyed sum, and the global top-k is a TakeOrderedAndProject — no
    stage materializes more than (chunks × avg distinct buckets)
    rows. Output: (doc_id, chunk_id, cos, rnk).
    """
    from .chunking import chunk_documents

    chunks = chunk_documents(
        docs, id_col=id_col, text_col=text_col, size=size, overlap=overlap
    )
    toks = chunks.select(
        id_col,
        "chunk_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("chunk_text"))), r"\s+")
        ).alias("term"),
    )
    # cvec feeds the norm aggregate AND the dot-product join; the two
    # branches prune different columns, so without a lineage cut the
    # whole chunk→tokenize→hash subtree runs twice (measured: 12
    # explode subtrees in the plan). One materialization of the sparse
    # index — (chunk, bucket, w), bounded by chunks × HASH_DIM — is
    # the index build a retrieval system persists anyway.
    cvec = hashed_tf_sparse(toks, [id_col, "chunk_id"]).localCheckpoint(
        eager=True
    )
    spark = docs.sparkSession
    qtoks = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t.lower()) for t in query_terms])
        ).alias("term")
    )
    qvec = hashed_tf_sparse(qtoks, []).select(
        "bucket", F.col("w").alias("qw")
    )
    qnorm = qvec.agg(
        F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qn")
    )
    cnorm = cvec.groupBy(id_col, "chunk_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("cn")
    )
    dotp = (
        cvec.join(F.broadcast(qvec), "bucket")
        .groupBy(id_col, "chunk_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dp"))
    )
    scored = (
        dotp.join(cnorm, [id_col, "chunk_id"])
        .crossJoin(F.broadcast(qnorm))
        .select(
            id_col,
            "chunk_id",
            F.round(F.col("dp") / (F.col("cn") * F.col("qn")), 9).alias(
                "cos"
            ),
        )
    )
    topk = scored.orderBy(
        F.col("cos").desc(), F.col(id_col), F.col("chunk_id")
    ).limit(k)
    w = W.orderBy(F.col("cos").desc(), F.col(id_col), F.col("chunk_id"))
    return topk.withColumn(
        "rnk", F.row_number().over(w)
    ).select(id_col, "chunk_id", "cos", "rnk")


def hashed_chunk_retrieval_oracle_sql(
    query_terms: list[str], k: int = 15, size: int = 30, overlap: int = 5
) -> str:
    """DuckDB twin of :func:`hashed_chunk_retrieval` on ``documents``."""
    step = size - overlap
    inlist = ", ".join(
        "'" + t.lower().replace("'", "''") + "'" for t in query_terms
    )
    hx = "0123456789abcdef"
    bucket = (
        f"((strpos('{hx}', substr(md5(term), 31, 1)) - 1) * 16"
        f" + (strpos('{hx}', substr(md5(term), 32, 1)) - 1))"
        f" % {HASH_DIM}"
    )
    sign = (
        f"CASE WHEN (strpos('{hx}', substr(md5(term), 1, 1)) - 1) % 2 = 0"
        " THEN 1 ELSE -1 END"
    )
    return rf"""
    WITH words AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        FROM documents
    ),
    starts AS (
        SELECT doc_id, w,
               UNNEST(generate_series(0, LEN(w) - 1, {step})) AS s
        FROM words
    ),
    kept AS (
        SELECT doc_id, w, s,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY s
               ) - 1 AS INT) AS chunk_id
        FROM starts
        WHERE s = 0 OR LEN(w) - s > {overlap}
    ),
    toks AS (
        SELECT doc_id, chunk_id,
               UNNEST(w[s + 1:s + {size}]) AS term
        FROM kept
    ),
    cvec AS (
        SELECT doc_id, chunk_id,
               CAST({bucket} AS INT) AS bucket,
               SUM({sign}) AS w
        FROM toks GROUP BY doc_id, chunk_id, 3
        HAVING SUM({sign}) <> 0
    ),
    qtoks AS (SELECT UNNEST([{inlist}]) AS term),
    qvec AS (
        SELECT CAST({bucket} AS INT) AS bucket, SUM({sign}) AS qw
        FROM qtoks GROUP BY 1
        HAVING SUM({sign}) <> 0
    ),
    qnorm AS (SELECT SQRT(SUM(qw * qw)) AS qn FROM qvec),
    cnorm AS (
        SELECT doc_id, chunk_id, SQRT(SUM(w * w)) AS cn
        FROM cvec GROUP BY doc_id, chunk_id
    ),
    dotp AS (
        SELECT c.doc_id, c.chunk_id, SUM(c.w * q.qw) AS dp
        FROM cvec c JOIN qvec q USING (bucket)
        GROUP BY c.doc_id, c.chunk_id
    ),
    scored AS (
        SELECT d.doc_id, d.chunk_id,
               ROUND(dp / (cn * qn), 9) AS cos
        FROM dotp d
        JOIN cnorm n ON d.doc_id = n.doc_id AND d.chunk_id = n.chunk_id
        CROSS JOIN qnorm
    )
    SELECT doc_id, chunk_id, cos,
           CAST(ROW_NUMBER() OVER (
               ORDER BY cos DESC, doc_id, chunk_id
           ) AS INT) AS rnk
    FROM scored
    QUALIFY rnk <= {k}
    """
