"""Text-analysis + deduplication queries on the documents table
(beyond-reference, SURVEY.md §7) plus the reference's ledger string
round-trip (E9, src/routes/trading.js:105 / transaction.js:37-38).

The oracle SQL mirrors the Spark plan exactly; md5 is the shared hash
primitive (identical hex in both engines). DuckDB regexes need the 'g'
flag where Spark's regexp_replace is global by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidates,
    minhash_signature,
    shingles,
    simhash,
)
from ..datapipe.textstats import (
    STOPWORDS,
    fingerprint,
    language_id,
    quality_metrics,
)
from ..sources import load_table, spread
from .registry import query

JACCARD_THRESHOLD = 0.4


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


# --------------------------------------------------------------------------
# E9 — ledger string build + regexp_extract round-trip.
# --------------------------------------------------------------------------
@query(
    "e9_ledger_regex",
    survey="E9",
    oracle="""
    SELECT o_orderkey,
           detail,
           regexp_extract(detail, 'priority ([0-9])', 1) AS priority_num
    FROM (
        SELECT o_orderkey,
               'Order ' || CAST(o_orderkey AS VARCHAR)
                        || ' at priority ' || o_orderpriority AS detail
        FROM orders
    ) t
    """,
)
def e9_ledger_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    detail = F.concat(
        F.lit("Order "),
        F.col("o_orderkey").cast("string"),
        F.lit(" at priority "),
        F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        detail.alias("detail"),
    ).select(
        "o_orderkey",
        "detail",
        F.regexp_extract("detail", r"priority ([0-9])", 1).alias("priority_num"),
    )


# --------------------------------------------------------------------------
# Text quality metrics panel.
# --------------------------------------------------------------------------
@query(
    "text_quality_metrics",
    survey="beyond:text-quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    )
    SELECT doc_id,
           LENGTH(text) AS n_chars_m,
           LEN(w)       AS n_tokens,
           ROUND(LENGTH(text) * 1.0 / LEN(w), 6) AS chars_per_token,
           ROUND(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                 / LENGTH(text), 6) AS alpha_ratio,
           ROUND(LEN(list_filter(w, x -> list_contains({_sw_list('en')}, x)))
                 * 1.0 / LEN(w), 6) AS stopword_ratio
    FROM t
    """,
)
def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_metrics(docs)


# --------------------------------------------------------------------------
# Token counting: whitespace words + BPE-ish pre-tokens.
# --------------------------------------------------------------------------
@query(
    "text_token_counts",
    survey="beyond:token-count",
    oracle=r"""
    SELECT doc_id,
           LEN(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
           LEN(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS n_bpe_tokens,
           FLOOR(LENGTH(text)
                 / LEN(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]'))
                 * 1000000) / 1000000 AS bytes_per_token
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import token_stats

    docs = load_table(spark, sf_dir, "documents")
    return token_stats(docs)


# --------------------------------------------------------------------------
# Language-ID heuristic (stopword vote).
# --------------------------------------------------------------------------
def _lang_case_sql() -> str:
    langs = list(STOPWORDS)
    score = {
        lang: f"LEN(list_filter(w, x -> list_contains({_sw_list(lang)}, x)))"
        for lang in langs
    }
    whens = []
    for lang in langs:
        conds = [f"{score[lang]} > 0"] + [
            f"{score[lang]} >= {score[o]}" for o in langs if o != lang
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


@query(
    "text_lang_id",
    survey="beyond:lang-id",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    )
    SELECT doc_id, {_lang_case_sql()} AS lang_pred
    FROM t
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return language_id(docs)


# --------------------------------------------------------------------------
# Document fingerprint (md5 of normalized text).
# --------------------------------------------------------------------------
@query(
    "text_fingerprint",
    survey="beyond:fingerprint",
    oracle="""
    SELECT doc_id,
           SUBSTR(md5(LOWER(regexp_replace(trim(text), '\\s+', ' ', 'g'))),
                  1, 16) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs)


# --------------------------------------------------------------------------
# Exact dedup by content hash.
# --------------------------------------------------------------------------
@query(
    "dedup_exact",
    survey="beyond:dedup-exact",
    oracle="""
    SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM (
        SELECT doc_id,
               md5(LOWER(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS h
        FROM documents
    ) t
    GROUP BY h
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


# --------------------------------------------------------------------------
# Composite corpus-cleaning pipeline: quality gate → language gate →
# exact dedup, as one declarative plan.
# --------------------------------------------------------------------------
def _corpus_clean_oracle() -> str:
    return f"""
    WITH t AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    gated AS (
        SELECT doc_id, text, LEN(w) AS n_tokens, w
        FROM t
        WHERE LEN(w) >= 20
          AND LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
              / LENGTH(text) >= 0.8
    ),
    voted AS (
        SELECT doc_id, text, n_tokens
        FROM gated
        WHERE ({_lang_case_sql()}) = 'en'
    ),
    hashed AS (
        SELECT doc_id, n_tokens,
               md5(LOWER(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS h
        FROM voted
    )
    SELECT doc_id, n_tokens
    FROM hashed
    WHERE doc_id IN (SELECT MIN(doc_id) FROM hashed GROUP BY h)
    """


@query(
    "corpus_clean_pipeline",
    survey="beyond:corpus-pipeline",
    oracle=_corpus_clean_oracle(),
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.pipeline import clean_corpus

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return clean_corpus(docs)


# Shared oracle CTE: distinct 3-gram word shingles per doc.
_SHINGLE_CTE = """
    WITH words AS (
        SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    idx AS (
        SELECT id, w, UNNEST(generate_series(1, LEN(w) - 2)) AS i
        FROM words
    ),
    sh AS (
        SELECT DISTINCT id, array_to_string(w[i:i+2], ' ') AS sh
        FROM idx
    ),
    counts AS (
        SELECT id, COUNT(*) AS n FROM sh GROUP BY id
    )
"""

_JACCARD_TAIL = f"""
    , common AS (
        SELECT a.id AS d1, b.id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT d1, d2,
           ROUND(c * 1.0 / (n1.n + n2.n - c), 6) AS jaccard
    FROM common
    JOIN counts n1 ON common.d1 = n1.id
    JOIN counts n2 ON common.d2 = n2.id
    WHERE c * 1.0 / (n1.n + n2.n - c) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup pairs.
# --------------------------------------------------------------------------
@query(
    "dedup_ngram_jaccard",
    survey="beyond:dedup-jaccard",
    oracle=_SHINGLE_CTE + _JACCARD_TAIL,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    sh = shingles(docs)
    pairs = jaccard_pairs(sh, JACCARD_THRESHOLD)
    return pairs.select(
        "d1", "d2", F.round("jaccard", 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup pairs (banded candidates, exact verification).
# --------------------------------------------------------------------------
@query(
    "dedup_minhash_lsh",
    survey="beyond:dedup-minhash-lsh",
    oracle=_SHINGLE_CTE
    + f"""
    , sig AS (
        SELECT id,
               MIN(md5('0|' || sh)) AS h0, MIN(md5('1|' || sh)) AS h1,
               MIN(md5('2|' || sh)) AS h2, MIN(md5('3|' || sh)) AS h3
        FROM sh GROUP BY id
    ),
    bands AS (
        SELECT id, 0 AS band, h0 || h1 AS key FROM sig
        UNION ALL
        SELECT id, 1 AS band, h2 || h3 AS key FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.id AS d1, b.id AS d2
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    common AS (
        SELECT a.id AS d1, b.id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT common.d1, common.d2,
           ROUND(c * 1.0 / (n1.n + n2.n - c), 6) AS jaccard
    FROM common
    JOIN cand ON common.d1 = cand.d1 AND common.d2 = cand.d2
    JOIN counts n1 ON common.d1 = n1.id
    JOIN counts n2 ON common.d2 = n2.id
    WHERE c * 1.0 / (n1.n + n2.n - c) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    # sh feeds signature + both verification sides, sig feeds banding +
    # counts — cut lineage once per frame (same rule as
    # datapipe.dedup.minhash_lsh_dedup and operators/graph.py:62)
    sh = shingles(docs).localCheckpoint(eager=True)
    sig = minhash_signature(sh).localCheckpoint(eager=True)
    # cand feeds three verification consumers (same cut rationale as
    # datapipe.dedup.minhash_lsh_dedup) — pin the tiny pair list
    cand = lsh_candidates(sig).localCheckpoint(eager=True)
    pairs = jaccard_pairs(
        sh, JACCARD_THRESHOLD, candidates=cand, counts=sig.select("id", "n")
    )
    return pairs.select(
        "d1", "d2", F.round("jaccard", 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# SimHash fingerprints.
# --------------------------------------------------------------------------
def _simhash_sql(bits: int = 16) -> str:
    cases = ", ".join(
        f"CASE WHEN SUM(CASE WHEN SUBSTR(md5(t), {p + 1}, 1) >= '8' "
        f"THEN 1 ELSE -1 END) >= 0 THEN '1' ELSE '0' END"
        for p in range(bits)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id AS id,
               UNNEST(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    )
    SELECT id, CONCAT({cases}) AS simhash
    FROM tok GROUP BY id
    """


@query("dedup_simhash", survey="beyond:dedup-simhash", oracle=_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return simhash(docs)


# --------------------------------------------------------------------------
# Hash-stable sampling — the reproducible way to sample at 100 TB
# (df.sample() draws from an RNG: not portable across engines, runs, or
# partitionings). Bucketing md5(id) gives a deterministic ~1/16 sample
# that is stable under re-partitioning, retries, and engine choice.
# --------------------------------------------------------------------------
@query(
    "sample_stable",
    survey="beyond:stable-sample",
    oracle="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    """,
)
def sample_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    ).select("doc_id", "n_chars")


@query(
    "sample_stratified",
    survey="beyond:stratified-sample",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                           IN ('0', '1', '2', '3') THEN 1 END) AS n_sampled
    FROM documents
    GROUP BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum ~25% hash sample accounting: the deterministic
    analog of sampleBy, with the sample decision a pure function of the
    row key."""
    docs = load_table(spark, sf_dir, "documents")
    in_sample = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1", "2", "3")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(in_sample, 1)).alias("n_sampled"),
    )


# --------------------------------------------------------------------------
# Round-2 pipeline widening: PII redaction, benchmark decontamination,
# repetition scoring. Register at priority 60 (next round's checked
# prefix; locally oracle-verified like everything else).
# --------------------------------------------------------------------------
def _pii_oracle() -> str:
    from ..datapipe.textstats import (
        PII_PATTERNS,
        REDACTION_TOKEN,
        regex_literal,
    )

    terms = list(PII_PATTERNS) + [regex_literal("customer")]

    def q(s: str) -> str:  # SQL single-quote escape for the literal
        return s.replace("'", "''")

    hits = " + ".join(
        f"LEN(regexp_extract_all(text, '{q(p)}'))" for p in terms
    )
    repl = "text"
    for p in terms:
        repl = f"regexp_replace({repl}, '{q(p)}', '{REDACTION_TOKEN}', 'g')"
    return (
        f"SELECT doc_id, CAST({hits} AS INT) AS n_hits, "
        f"md5({repl}) AS clean_md5 FROM documents"
    )


@query(
    "text_pii_redact",
    survey="beyond:pii-redaction",
    priority=60,
    oracle=_pii_oracle(),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.textstats import pii_redact

    docs = load_table(spark, sf_dir, "documents")
    return pii_redact(docs)


@query(
    "decontaminate_ngram_overlap",
    survey="beyond:decontamination",
    priority=60,
    oracle=_SHINGLE_CTE
    + """
    , bench AS (
        SELECT DISTINCT sh FROM sh WHERE id % 19 = 0
    ),
    train AS (
        SELECT id, sh FROM sh WHERE id % 19 <> 0
    )
    SELECT train.id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM train JOIN bench USING (sh)
    GROUP BY train.id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.dedup import contamination

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return contamination(docs, bench_mod=19)


@query(
    "text_repetition_score",
    survey="beyond:repetition-score",
    priority=60,
    oracle=r"""
    WITH words AS (
        SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    toks AS (SELECT id, UNNEST(w) AS tok FROM words),
    tc AS (SELECT id, tok, COUNT(*) AS c FROM toks GROUP BY id, tok),
    ts AS (
        SELECT id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_c
        FROM tc GROUP BY id
    ),
    bigr AS (
        SELECT id, array_to_string(w[i:i+1], ' ') AS g
        FROM (
            SELECT id, w, UNNEST(generate_series(1, LEN(w) - 1)) AS i
            FROM words
        ) t
    ),
    gs AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(COUNT(DISTINCT g) AS BIGINT) AS nd
        FROM bigr GROUP BY id
    )
    SELECT ts.id AS doc_id, n_tokens,
           ROUND(top_c * 1.0 / n_tokens, 6) AS top_token_ratio,
           ROUND(1 - nd * 1.0 / n_bigrams, 6) AS dup_bigram_ratio
    FROM ts JOIN gs ON ts.id = gs.id
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.textstats import repetition_metrics

    docs = load_table(spark, sf_dir, "documents")
    return repetition_metrics(docs)


# --------------------------------------------------------------------------
# Duplicate-cluster assignment: near-dup PAIRS → transitive CLUSTERS.
# The canonical doc per cluster is the minimum doc_id (deterministic);
# singleton docs are their own cluster. The Spark side is iterative
# min-label propagation (operators/graph.py) — pure DataFrame rounds,
# no driver-side graph; the oracle replays the same closure with a
# recursive CTE over the identical Jaccard edge set.
# --------------------------------------------------------------------------
@query(
    "dedup_cluster_components",
    survey="beyond:dedup-clusters",
    priority=60,
    oracle=_SHINGLE_CTE.replace("WITH words", "WITH RECURSIVE words", 1)
    + f"""
    , common AS (
        SELECT a.id AS d1, b.id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    pairs AS (
        SELECT d1, d2
        FROM common
        JOIN counts n1 ON common.d1 = n1.id
        JOIN counts n2 ON common.d2 = n2.id
        WHERE c * 1.0 / (n1.n + n2.n - c) >= {JACCARD_THRESHOLD}
    ),
    sym AS (
        SELECT d1 AS a, d2 AS b FROM pairs
        UNION ALL
        SELECT d2, d1 FROM pairs
    ),
    reach(node, root) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node
    ),
    cc AS (SELECT node, MIN(root) AS label FROM reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(cc.label, d.doc_id) AS cluster_id,
           (COALESCE(cc.label, d.doc_id) = d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    sh = shingles(docs)
    pairs = jaccard_pairs(sh, JACCARD_THRESHOLD)
    cc = connected_components(pairs, "d1", "d2")
    return docs.join(
        cc, docs["doc_id"] == cc["node"], "left"
    ).select(
        "doc_id",
        F.coalesce("label", "doc_id").alias("cluster_id"),
        (F.coalesce("label", "doc_id") == F.col("doc_id")).alias(
            "is_canonical"
        ),
    )


# --------------------------------------------------------------------------
# Sliding-window token chunking (datapipe/chunking.py) — the
# document→training-window explode every pretraining/RAG pipeline
# runs. Pure narrow transformations; the oracle mirrors the window
# arithmetic with generate_series + array slicing.
# --------------------------------------------------------------------------
@query(
    "text_chunk_windows",
    survey="beyond:chunking",
    priority=60,
    oracle=r"""
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    starts AS (
        SELECT doc_id, w,
               UNNEST(generate_series(0, LEN(w) - 1, 40)) AS s
        FROM words
    ),
    kept AS (
        SELECT doc_id, w, s,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY s
               ) - 1 AS INT) AS chunk_id
        FROM starts
        WHERE s = 0 OR LEN(w) - s > 10
    )
    SELECT doc_id, chunk_id,
           CAST(LEAST(50, LEN(w) - s) AS INT) AS n_tokens,
           array_to_string(w[s + 1:s + 50], ' ') AS chunk_text
    FROM kept
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, size=50, overlap=10)


# --------------------------------------------------------------------------
# BM25 keyword retrieval (datapipe/search.py): inverted-index
# postings, corpus stats, Robertson idf — corpus triage search over
# the documents table. Deterministic ranking: rounded score then
# doc_id; the oracle reproduces the exact top-k row set.
# --------------------------------------------------------------------------
_BM25_TERMS = ["spark", "join", "window"]


def _bm25_oracle() -> str:
    from ..datapipe.search import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_TERMS, k=15)


@query(
    "search_bm25_topk",
    survey="beyond:bm25-search",
    priority=60,
    oracle=_bm25_oracle(),
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.search import bm25_topk

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return bm25_topk(docs, _BM25_TERMS, k=15)


def _tfidf_oracle() -> str:
    from ..datapipe.search import tfidf_oracle_sql

    return tfidf_oracle_sql(k=3)


@query(
    "search_tfidf_terms",
    survey="beyond:tfidf-keywords",
    priority=60,
    oracle=_tfidf_oracle(),
)
def search_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 TF-IDF terms per document — the
    per-document fingerprint used for mixture audits and topic
    clustering (datapipe/search.py documents the 100 TB plan shape)."""
    from ..datapipe.search import tfidf_topk_terms

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return tfidf_topk_terms(docs, k=3)


# --------------------------------------------------------------------------
# Temperature-weighted mixture sampling: rebalance a multi-domain
# corpus toward smaller domains (the standard LLM training-mixture
# move). The quota is sublinear in domain size — min(n_d,
# 10·⌊√n_d⌋) — so dominant domains are capped while small ones keep
# every row. Everything is integer-or-exactly-rounded arithmetic
# (√ of an integer is correctly rounded per IEEE, ⌊·⌋ after it is
# deterministic), so both engines compute identical quotas; member
# selection ranks md5(doc_id) inside each domain — the same
# deterministic-hash idiom as sample_stable — so the chosen rows are a
# pure function of the data. Plan shape: tiny per-domain quota frame
# broadcast back onto a window ranked within source — one shuffle
# keyed by domain.
# --------------------------------------------------------------------------
@query(
    "sample_temperature_mix",
    survey="beyond:mixture-sample",
    priority=60,
    oracle="""
    WITH quota AS (
        SELECT source,
               LEAST(COUNT(*),
                     CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)
                     * 10) AS q
        FROM documents GROUP BY source
    ),
    ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rnk
        FROM documents
    )
    SELECT r.doc_id, r.source, CAST(r.rnk AS INT) AS rnk
    FROM ranked r JOIN quota USING (source)
    WHERE r.rnk <= quota.q
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    quota = docs.groupBy("source").agg(
        F.least(
            F.count(F.lit(1)),
            F.floor(F.sqrt(F.count(F.lit(1)).cast("double"))) * 10,
        ).alias("q")
    )
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).alias("rnk")
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rnk") <= F.col("q"))
        .select("doc_id", "source", "rnk")
    )


# --------------------------------------------------------------------------
# Boilerplate-line detection (C4-style): sentences that recur across
# many distinct documents are navigation chrome / license headers /
# cookie banners — removed line-wise, not document-wise. Shape: one
# explode (scan-stage Generate), one distinct on (doc, line), one
# count-distinct aggregate keyed by line — the line dictionary is the
# only shuffled state, and the ≥K filter keeps the result to the
# boilerplate tail. Dedup across repeated occurrences WITHIN a doc
# happens before counting, so a doc repeating its own footer 50 times
# still counts once.
# --------------------------------------------------------------------------
BOILERPLATE_MIN_DOCS = 3
BOILERPLATE_MIN_CHARS = 20

# The synthetic corpus has no organically recurring sentences, so the
# unmodified query is 0-vs-0 at every SF — a hash row that cannot fail
# (round-2 verdict lesson). Both engines therefore run over a derived
# corpus that appends a fixed cookie-banner footer to every 5th doc:
# deterministic, same expression on both sides, and guaranteed to put
# at least one line over the >= MIN_DOCS bar while leaving the organic
# (non-)boilerplate detection in place.
_BP_FOOTER = (
    "This website uses cookies to ensure you get the best experience"
)


@query(
    "text_boilerplate_lines",
    survey="beyond:boilerplate-lines",
    priority=60,
    oracle=rf"""
    WITH corpus AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN text || '. {_BP_FOOTER}.'
                    ELSE text END AS text
        FROM documents
    ),
    lines AS (
        SELECT DISTINCT doc_id,
               lower(trim(UNNEST(string_split_regex(text, '\.\s+')))) AS line
        FROM corpus
    )
    SELECT line, COUNT(*) AS n_docs
    FROM lines
    WHERE LENGTH(line) >= {BOILERPLATE_MIN_CHARS}
    GROUP BY line
    HAVING COUNT(*) >= {BOILERPLATE_MIN_DOCS}
    """,
)
def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(f". {_BP_FOOTER}.")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    lines = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), r"\.\s+")).alias("raw"),
        )
        .select("doc_id", F.lower(F.trim(F.col("raw"))).alias("line"))
        .filter(F.length("line") >= BOILERPLATE_MIN_CHARS)
        .distinct()
    )
    return (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
    )


# --------------------------------------------------------------------------
# Word-distribution entropy: a perplexity proxy for corpus quality —
# low-entropy docs are repetitive/templated, high-entropy docs are
# keyboard-mash. Shape: one explode to (doc, word) counts, one groupBy
# back to the doc — both map-side combinable; the entropy itself is
# a JVM expression over (count, total). Rounded to 4 decimals on both
# sides so per-engine summation order can't flip the hash.
# --------------------------------------------------------------------------
@query(
    "text_word_entropy",
    survey="beyond:word-entropy",
    priority=60,
    oracle=r"""
    WITH words AS (
        SELECT doc_id, w, COUNT(*) AS c
        FROM (
            SELECT doc_id,
                   UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS w
            FROM documents
        ) t
        GROUP BY doc_id, w
    ),
    tot AS (
        SELECT doc_id, SUM(c) AS n FROM words GROUP BY doc_id
    )
    SELECT w.doc_id,
           ROUND(-SUM((c * 1.0 / n) * LOG2(c * 1.0 / n)), 4) AS entropy
    FROM words w JOIN tot USING (doc_id)
    GROUP BY w.doc_id
    """,
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = words.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        words.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log2(p)), 4).alias("entropy"))
    )


# --------------------------------------------------------------------------
# N-gram containment: sub-document duplication (|A∩B| / min(|A|,|B|)).
# A doc quoted or concatenated inside a larger one scores near 1.0
# here while its Jaccard stays low (union dilution) — the standard
# second axis for training-corpus dedup. Same shuffle shape as the
# Jaccard path.
# --------------------------------------------------------------------------
CONTAINMENT_THRESHOLD = 0.5


@query(
    "dedup_ngram_containment",
    survey="beyond:dedup-containment",
    priority=60,
    oracle=_SHINGLE_CTE
    + f"""
    , common AS (
        SELECT a.id AS d1, b.id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT d1, d2,
           ROUND(c * 1.0 / LEAST(n1.n, n2.n), 6) AS containment
    FROM common
    JOIN counts n1 ON common.d1 = n1.id
    JOIN counts n2 ON common.d2 = n2.id
    WHERE c * 1.0 / LEAST(n1.n, n2.n) >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.dedup import containment_pairs

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    sh = shingles(docs)
    return containment_pairs(sh, CONTAINMENT_THRESHOLD).select(
        "d1", "d2", F.round("containment", 6).alias("containment")
    )


# --------------------------------------------------------------------------
# Positional phrase search: exact consecutive-token match via the
# positional-postings intersection (datapipe/search.py:phrase_match).
# Each join leg carries a single term's postings, so the shuffle is
# bounded by the phrase terms' document frequency, never the corpus.
# --------------------------------------------------------------------------
PHRASE = ["table", "hash"]


@query(
    "search_phrase_match",
    survey="beyond:phrase-search",
    priority=60,
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\\s+') AS w
        FROM documents
    ),
    tok AS (
        SELECT doc_id, UNNEST(generate_series(1, LEN(w))) AS pos, w
        FROM words
    ),
    postings AS (
        SELECT doc_id, pos, w[pos] AS term FROM tok
    )
    SELECT p0.doc_id, COUNT(*) AS n_hits
    FROM postings p0
    JOIN postings p1
      ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
    WHERE p0.term = '{PHRASE[0]}' AND p1.term = '{PHRASE[1]}'
    GROUP BY p0.doc_id
    """,
)
def search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.search import phrase_match

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return phrase_match(docs, PHRASE)


# --------------------------------------------------------------------------
# Keyword-in-context (KWIC): every occurrence of a term with its ±2
# word window — the corpus-triage view behind "show me how this token
# is used" audits. Positional postings + array slicing, all JVM; the
# posting for ONE term is the only thing that fans out.
# --------------------------------------------------------------------------
_KWIC_TERM = "spark"
_KWIC_RADIUS = 2


@query(
    "text_keyword_in_context",
    survey="beyond:kwic",
    priority=60,
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\\s+') AS w
        FROM documents
    ),
    pos AS (
        SELECT doc_id, w, UNNEST(generate_series(1, LEN(w))) AS p
        FROM words
    )
    SELECT doc_id, p AS pos,
           array_to_string(
               w[GREATEST(1, p - {_KWIC_RADIUS}):
                 LEAST(LEN(w), p + {_KWIC_RADIUS})], ' ') AS context
    FROM pos
    WHERE w[p] = '{_KWIC_TERM}'
    """,
)
def text_keyword_in_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("w"),
    )
    pos = words.select(
        "doc_id",
        "w",
        F.posexplode("w").alias("p0", "term"),
    ).filter(F.col("term") == _KWIC_TERM)
    # posexplode is 0-based; the oracle's generate_series is 1-based
    p = F.col("p0") + 1
    lo = F.greatest(F.lit(1), p - _KWIC_RADIUS)
    hi = F.least(F.size("w"), p + _KWIC_RADIUS)
    return pos.select(
        "doc_id",
        p.cast("long").alias("pos"),
        F.array_join(
            F.slice(F.col("w"), lo, hi - lo + 1), " "
        ).alias("context"),
    )


# --------------------------------------------------------------------------
# Lexical diversity: distinct-token ratio per document — repetitive
# (templated/spammy) docs score low, natural prose high. One pass of
# JVM array algebra: array_distinct inside the row, no shuffle at all.
# --------------------------------------------------------------------------
@query(
    "text_lexical_diversity",
    survey="beyond:lexical-diversity",
    priority=60,
    oracle=r"""
    SELECT doc_id,
           LEN(string_split_regex(LOWER(TRIM(text)), '\s+')) AS n_tokens,
           ROUND(LEN(list_distinct(
                     string_split_regex(LOWER(TRIM(text)), '\s+'))) * 1.0
                 / LEN(string_split_regex(LOWER(TRIM(text)), '\s+')), 6)
               AS ttr
    FROM documents
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(w)) / F.size(w), 6
        ).alias("ttr"),
    )


# --------------------------------------------------------------------------
# Dedup subsystem report: one row per method with its duplicate
# volume — the management view a corpus pipeline checks after every
# ingest (exact-hash duplicate docs, Jaccard near-dup pairs, SimHash
# fingerprint collisions). Each branch reuses the registered method's
# exact formulation, so the report doubles as a cross-method
# consistency anchor under the hash gate.
# --------------------------------------------------------------------------
@query(
    "corpus_dedup_report",
    survey="beyond:dedup-report",
    priority=60,
    oracle=_SHINGLE_CTE
    + f"""
    , jac AS (
        SELECT a.id AS d1, b.id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    jac_pairs AS (
        SELECT COUNT(*) AS n
        FROM jac
        JOIN counts n1 ON jac.d1 = n1.id
        JOIN counts n2 ON jac.d2 = n2.id
        WHERE c * 1.0 / (n1.n + n2.n - c) >= {JACCARD_THRESHOLD}
    ),
    exact_dups AS (
        SELECT CAST(COUNT(*) - COUNT(DISTINCT
                   md5(LOWER(regexp_replace(trim(text), '\\s+', ' ', 'g'))))
               AS BIGINT) AS n
        FROM documents
    ),
    sim_coll AS (
        SELECT CAST(COUNT(*) - COUNT(DISTINCT simhash) AS BIGINT) AS n
        FROM ({_simhash_sql()})
    )
    SELECT 'exact_duplicate_docs' AS method,
           (SELECT n FROM exact_dups) AS n
    UNION ALL
    SELECT 'jaccard_near_dup_pairs', (SELECT n FROM jac_pairs)
    UNION ALL
    SELECT 'simhash_collision_docs', (SELECT n FROM sim_coll)
    """,
)
def corpus_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    sh = shingles(docs)
    n_jac = jaccard_pairs(sh, JACCARD_THRESHOLD).agg(
        F.count(F.lit(1)).alias("n")
    )
    n_exact = docs.agg(
        (
            F.count(F.lit(1))
            - F.countDistinct(
                F.md5(
                    F.lower(
                        F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
                    )
                )
            )
        )
        .cast("long")
        .alias("n")
    )
    sims = simhash(docs)
    n_sim = sims.agg(
        (F.count(F.lit(1)) - F.countDistinct("simhash")).cast("long").alias("n")
    )

    def tag(df: DataFrame, method: str) -> DataFrame:
        return df.select(F.lit(method).alias("method"), "n")

    return (
        tag(n_exact, "exact_duplicate_docs")
        .unionByName(tag(n_jac, "jaccard_near_dup_pairs"))
        .unionByName(tag(n_sim, "simhash_collision_docs"))
    )


# --------------------------------------------------------------------------
# Unigram-LM cross-entropy scoring: the CCNet-style quality filter —
# score every document by how surprising its words are under a
# reference language model (here: add-one-smoothed unigram counts from
# the English slice of the corpus). In-domain fluent text scores low,
# other-language and keyboard-mash text scores high; training
# pipelines threshold or bucket on this. Shape: the reference model is
# a broadcast (word → count) table — production caps it at top-K words
# so the broadcast stays bounded however big the reference corpus —
# and scoring is one explode + broadcast join + per-doc aggregate, all
# map-side parallel. Per-token bits are quantized to decimal before
# the per-doc sum (numeric.py discipline).
# --------------------------------------------------------------------------


@query(
    "text_lm_score",
    survey="beyond:lm-quality-score",
    priority=60,
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS w
        FROM documents
    ),
    ref AS (
        SELECT w, COUNT(*) AS cnt FROM toks WHERE lang = 'en' GROUP BY w
    ),
    tot AS (SELECT SUM(cnt) AS t, COUNT(*) AS v FROM ref),
    scored AS (
        SELECT tk.doc_id, tk.lang,
               CAST(-LOG2((COALESCE(r.cnt, 0) + 1) * 1.0 / (tot.t + tot.v))
                    AS DECIMAL(27,6)) AS bits
        FROM toks tk LEFT JOIN ref r USING (w) CROSS JOIN tot
    )
    SELECT doc_id, lang, COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(bits) AS DOUBLE) / COUNT(*), 4) AS lm_bits
    FROM scored GROUP BY doc_id, lang
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy (bits/token) under an add-one
    unigram LM trained on the corpus's English slice. OOV words cost
    -log2(1/(T+V)); the per-doc mean is the quality score."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "w"
        ),
    )
    ref = (
        toks.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = ref.agg(
        F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("v")
    )
    scored = (
        toks.join(F.broadcast(ref), "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            (
                -F.log2(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                    / (F.col("t") + F.col("v"))
                )
            )
            .cast("decimal(27,6)")
            .alias("bits"),
        )
    )
    return scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum("bits").cast("double") / F.count(F.lit(1)), 4
        ).alias("lm_bits"),
    )


# --------------------------------------------------------------------------
# Model-evaluation surface: confusion matrix of the lang-id heuristic
# against the labeled lang column — the eval loop every classifier in
# a data pipeline needs (precision per class falls straight out of
# the matrix). One map-side prediction pass + a (actual, pred)
# groupBy whose shuffle carries ≤ |langs|² cells.
# --------------------------------------------------------------------------


@query(
    "eval_langid_confusion",
    survey="beyond:eval-confusion",
    priority=60,
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    pred AS (
        SELECT doc_id, lang AS lang_actual, {_lang_case_sql()} AS lang_pred
        FROM t
    )
    SELECT lang_actual, lang_pred, COUNT(*) AS n
    FROM pred GROUP BY lang_actual, lang_pred
    """,
)
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of text_lang_id's stopword-vote heuristic vs
    the ground-truth lang label. The diagonal mass is the accuracy; a
    real pipeline swaps the heuristic for a model pandas_udf without
    changing this plan."""
    docs = load_table(spark, sf_dir, "documents")
    preds = language_id(docs)
    joined = preds.join(
        docs.select("doc_id", F.col("lang").alias("lang_actual")),
        "doc_id",
    )
    return joined.groupBy("lang_actual", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------------------------------
# Candidate-stage evaluation of the MinHash-LSH dedup: precision and
# recall of the banded candidate generator against exact n-gram
# Jaccard ground truth. "Measure, don't guess" applied to the dedup
# subsystem itself — the number a pipeline owner needs before trusting
# LSH at a threshold (verification is exact, so end-to-end precision
# is 1.0; what banding actually costs is CANDIDATE volume and missed
# true pairs, which is exactly what this row quantifies). All counts
# are integers; the two ratios are single divisions of integers,
# rounded 6 dp — deterministic across engines.
# --------------------------------------------------------------------------
@query(
    "eval_dedup_recall",
    survey="beyond:dedup-eval",
    priority=60,
    oracle=_SHINGLE_CTE
    + f"""
    , sig AS (
        SELECT id,
               MIN(md5('0|' || sh)) AS h0, MIN(md5('1|' || sh)) AS h1,
               MIN(md5('2|' || sh)) AS h2, MIN(md5('3|' || sh)) AS h3
        FROM sh GROUP BY id
    ),
    bands AS (
        SELECT id, 0 AS band, h0 || h1 AS key FROM sig
        UNION ALL
        SELECT id, 1 AS band, h2 || h3 AS key FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.id AS d1, b.id AS d2
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    common AS (
        SELECT a.id AS d1, b.id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    true_pairs AS (
        SELECT common.d1, common.d2
        FROM common
        JOIN counts n1 ON common.d1 = n1.id
        JOIN counts n2 ON common.d2 = n2.id
        WHERE c * 1.0 / (n1.n + n2.n - c) >= {JACCARD_THRESHOLD}
    ),
    agg AS (
        SELECT (SELECT COUNT(*) FROM true_pairs) AS n_true,
               (SELECT COUNT(*) FROM cand) AS n_cand,
               (SELECT COUNT(*)
                FROM true_pairs t
                JOIN cand ON t.d1 = cand.d1 AND t.d2 = cand.d2) AS n_found
    )
    SELECT n_true, n_cand, n_found,
           CASE WHEN n_cand = 0 THEN NULL
                ELSE ROUND(n_found * 1.0 / n_cand, 6) END AS precision,
           CASE WHEN n_true = 0 THEN NULL
                ELSE ROUND(n_found * 1.0 / n_true, 6) END AS recall
    FROM agg
    """,
)
def eval_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    # the eval compares TWO full pipelines over the same shingle and
    # signature frames — without the lineage cuts each pipeline
    # re-evaluates them independently
    sh = shingles(docs).localCheckpoint(eager=True)
    sig = minhash_signature(sh).localCheckpoint(eager=True)
    # cand is consumed 3x (found's semi-join + its own count + found's
    # count path) and true_pairs 2x — materialize both pair lists so
    # the banding and verification joins run once each. The two
    # materializations read only the checkpointed sh/sig frames and
    # are independent of each other, so overlap them (§2.6): each is a
    # task-tail-bound job that otherwise leaves the executors idle.
    from concurrent.futures import ThreadPoolExecutor

    def _cand():
        return lsh_candidates(sig).localCheckpoint(eager=True)

    def _truth():
        return (
            jaccard_pairs(
                sh,
                JACCARD_THRESHOLD,
                counts=sig.select("id", "n"),
                materialize=False,  # sh is checkpointed above
            )
            .select("d1", "d2")
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_cand, f_truth = pool.submit(_cand), pool.submit(_truth)
        cand, true_pairs = f_cand.result(), f_truth.result()
    found = true_pairs.join(cand, ["d1", "d2"], "left_semi")
    counts3 = (
        true_pairs.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_cand")))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        F.col(den) == 0, F.lit(None).cast("double")
    ).otherwise(F.round(F.col(num) / F.col(den), 6))
    return counts3.select(
        "n_true",
        "n_cand",
        "n_found",
        ratio("n_found", "n_cand").alias("precision"),
        ratio("n_found", "n_true").alias("recall"),
    )


# --------------------------------------------------------------------------
# End-to-end training manifest: the full corpus pipeline as ONE
# declarative plan — quality/language/dedup gates (clean_corpus) →
# sliding-window chunking of the survivors → deterministic hash split
# (md5 16-bit prefix: 80/10/10) → per-(split, lang) manifest of
# document / chunk / token counts. This is the artifact a training
# run actually consumes; every stage reuses the registered operator's
# exact formulation, so the manifest doubles as a whole-pipeline
# consistency anchor under the hash gate. All outputs are integer
# aggregates — bit-deterministic.
# --------------------------------------------------------------------------
@query(
    "pipeline_training_manifest",
    survey="beyond:corpus-pipeline,beyond:chunking,beyond:splits",
    priority=60,
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, lang,
               string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    gated AS (
        SELECT doc_id, text, lang, LEN(w) AS n_tokens, w
        FROM t
        WHERE LEN(w) >= 20
          AND LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
              / LENGTH(text) >= 0.8
    ),
    voted AS (
        SELECT doc_id, text, lang, n_tokens, w
        FROM gated
        WHERE ({_lang_case_sql()}) = 'en'
    ),
    hashed AS (
        SELECT doc_id, lang, n_tokens, w,
               md5(LOWER(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS h
        FROM voted
    ),
    surv AS (
        SELECT doc_id, lang, n_tokens, w
        FROM hashed
        WHERE doc_id IN (SELECT MIN(doc_id) FROM hashed GROUP BY h)
    ),
    chunks AS (
        SELECT doc_id, COUNT(*) AS n_chunks
        FROM (
            SELECT doc_id,
                   UNNEST(generate_series(0, n_tokens - 1, 40)) AS s,
                   n_tokens
            FROM surv
        ) st
        WHERE s = 0 OR n_tokens - s > 10
        GROUP BY doc_id
    ),
    split AS (
        SELECT surv.doc_id, surv.lang, surv.n_tokens, chunks.n_chunks,
               CASE WHEN u < 52429 THEN 'train'
                    WHEN u < 58982 THEN 'val'
                    ELSE 'test' END AS split
        FROM surv
        JOIN chunks USING (doc_id)
        JOIN (
            SELECT doc_id,
                   (strpos('0123456789abcdef',
                           substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                                  1, 1)) - 1) * 4096
                   + (strpos('0123456789abcdef',
                             substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                                    2, 1)) - 1) * 256
                   + (strpos('0123456789abcdef',
                             substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                                    3, 1)) - 1) * 16
                   + (strpos('0123456789abcdef',
                             substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                                    4, 1)) - 1) AS u
            FROM surv
        ) su USING (doc_id)
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM split
    GROUP BY split, lang
    """,
)
def pipeline_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.chunking import chunk_documents
    from ..datapipe.pipeline import clean_corpus

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    # surv feeds BOTH the chunk counter and the final rollup; without
    # a lineage cut the whole clean_corpus subtree (quality regexes,
    # language vote, md5 dedup groupBy) runs twice. Pin only the tiny
    # (doc_id, n_tokens) gate verdict — the survivor TEXT re-joins
    # from the parquet scan per branch (a cheap columnar read; a
    # measured text-carrying checkpoint cost more than the second
    # scan it saved).
    surv = clean_corpus(docs).localCheckpoint(eager=True).join(
        docs.select("doc_id", "text", "lang"), "doc_id"
    )
    n_chunks = (
        chunk_documents(surv, size=50, overlap=10)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")
    split = (
        F.when(u < 52429, "train").when(u < 58982, "val").otherwise("test")
    )
    return (
        surv.join(n_chunks, "doc_id")
        .select("doc_id", "lang", "n_tokens", "n_chunks", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Incremental ingest dedup: a NEW document batch screened against the
# EXISTING corpus — the shape a daily pipeline actually runs. The
# asymmetric LSH join (datapipe/dedup.py:lsh_candidates_between)
# generates candidates new×old ONLY, so ingest cost scales with the
# batch, never the corpus; verification is the same exact-Jaccard
# pass over the union shingle table restricted to candidates. The
# derived batch: every 20th document (offset +7) re-ingested with an
# extra trailing word — near-dup of its source, not byte-identical —
# under ids + 5,000,000.
# --------------------------------------------------------------------------
_ING_OFFSET = 5_000_000


@query(
    "dedup_incremental_ingest",
    survey="beyond:incremental-dedup",
    priority=60,
    oracle=rf"""
    WITH corpus AS (
        SELECT doc_id AS id, text, 0 AS is_new FROM documents
        UNION ALL
        SELECT doc_id + {_ING_OFFSET}, text || ' freshly ingested', 1
        FROM documents WHERE doc_id % 20 = 7
    ),
    words AS (
        SELECT id, is_new, string_split_regex(trim(text), '\s+') AS w
        FROM corpus
    ),
    idx AS (
        SELECT id, is_new, w, UNNEST(generate_series(1, LEN(w) - 2)) AS i
        FROM words
    ),
    sh AS (
        SELECT DISTINCT id, is_new, array_to_string(w[i:i+2], ' ') AS sh
        FROM idx
    ),
    counts AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    sig AS (
        SELECT id, is_new,
               MIN(md5('0|' || sh)) AS h0, MIN(md5('1|' || sh)) AS h1,
               MIN(md5('2|' || sh)) AS h2, MIN(md5('3|' || sh)) AS h3
        FROM sh GROUP BY id, is_new
    ),
    bands AS (
        SELECT id, is_new, 0 AS band, h0 || h1 AS key FROM sig
        UNION ALL
        SELECT id, is_new, 1, h2 || h3 FROM sig
    ),
    cand AS (
        SELECT DISTINCT o.id AS d1, n.id AS d2
        FROM bands o
        JOIN bands n ON o.band = n.band AND o.key = n.key
        WHERE o.is_new = 0 AND n.is_new = 1
    ),
    common AS (
        SELECT a.id AS d1, b.id AS d2, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        WHERE a.is_new = 0 AND b.is_new = 1
        GROUP BY a.id, b.id
    )
    SELECT common.d1 AS corpus_id, common.d2 AS new_id,
           ROUND(c * 1.0 / (n1.n + n2.n - c), 6) AS jaccard
    FROM common
    JOIN cand ON common.d1 = cand.d1 AND common.d2 = cand.d2
    JOIN counts n1 ON common.d1 = n1.id
    JOIN counts n2 ON common.d2 = n2.id
    WHERE c * 1.0 / (n1.n + n2.n - c) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.dedup import lsh_candidates_between

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    batch = docs.filter(F.col("doc_id") % 20 == 7).select(
        (F.col("doc_id") + _ING_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" freshly ingested")).alias("text"),
    )
    # Both corpus-side frames feed two DAG branches (sh_old → signature
    # + verification union; sig_old → banded candidates + counts), so
    # cut lineage once — round 3 measured the duplicated shingle
    # subtree as the bulk of this query's 11.8s. The batch side is
    # 1/20th the size; checkpointing it costs nothing and saves its
    # own double evaluation.
    # corpus-side and batch-side shingle materializations are
    # independent — overlap them (§2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_old = pool.submit(
            lambda: shingles(docs).localCheckpoint(eager=True)
        )
        f_new = pool.submit(
            lambda: shingles(batch).localCheckpoint(eager=True)
        )
        sh_old, sh_new = f_old.result(), f_new.result()
    sig_old = minhash_signature(sh_old).localCheckpoint(eager=True)
    sig_new = minhash_signature(sh_new)
    cand = lsh_candidates_between(sig_new, sig_old).localCheckpoint(
        eager=True
    )  # three verification consumers, tiny pair list
    sh_all = sh_old.unionByName(sh_new)
    counts = sig_old.select("id", "n").unionByName(
        sig_new.select("id", "n")
    )
    pairs = jaccard_pairs(
        sh_all, JACCARD_THRESHOLD, candidates=cand, counts=counts
    )
    return pairs.select(
        F.col("d1").alias("corpus_id"),
        F.col("d2").alias("new_id"),
        F.round("jaccard", 6).alias("jaccard"),
    )


# --------------------------------------------------------------------------
# Domain-level quality gating (beyond; the Common-Crawl pipeline
# idiom): corpus curation decides keep/drop at the SOURCE level —
# a domain whose documents are consistently short/low-quality is
# dropped wholesale, which removes spam far more cheaply than per-doc
# classification. One keyed aggregate over the corpus; at 100 TB the
# per-source row count is bounded by the domain space, not the corpus.
# --------------------------------------------------------------------------
@query(
    "corpus_domain_gate",
    survey="beyond:domain-gating",
    priority=60,
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(ROUND(AVG(CAST(n_chars AS DECIMAL(27,6))), 2) AS DOUBLE)
               AS avg_chars,
           ROUND(SUM(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS pct_short,
           CASE WHEN COUNT(*) < 3
                  OR SUM(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*) > 0.2
                THEN 'drop' ELSE 'keep' END AS gate
    FROM documents
    GROUP BY source
    """,
)
def corpus_domain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    short = F.sum(F.when(F.col("n_chars") < 150, 1).otherwise(0))
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("n_chars").cast("decimal(27,6)")), 2)
        .cast("double")
        .alias("avg_chars"),
        F.round(short / F.count(F.lit(1)), 6).alias("pct_short"),
    )
    gate = F.when(
        (F.col("n_docs") < 3) | (F.col("pct_short") > 0.2), "drop"
    ).otherwise("keep")
    return agg.select(
        "source", "n_docs", "avg_chars", "pct_short", gate.alias("gate")
    )


# --------------------------------------------------------------------------
# BPE merge-candidate counting (beyond; the tokenizer-training
# primitive): frequency of every adjacent CHARACTER pair across the
# corpus, weighted by word frequency — one BPE training round's "which
# pair merges next" table. Distributed the way a real tokenizer
# trainer shards it: aggregate the word VOCABULARY first (corpus-size
# shuffle collapses to vocab-size), then explode each distinct word's
# character pairs once and weight by its count. Top-30 with explicit
# pair tiebreak.
# --------------------------------------------------------------------------
@query(
    "text_bpe_pair_freq",
    survey="beyond:tokenizer-bpe",
    priority=60,
    oracle=r"""
    WITH words AS (
        SELECT w, COUNT(*) AS wc FROM (
            SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS w
            FROM documents
        ) GROUP BY w
    ),
    pairs AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair, wc
        FROM words, UNNEST(generate_series(1, LEN(w) - 1)) AS t(i)
        WHERE LEN(w) >= 2
    )
    SELECT pair, CAST(SUM(wc) AS BIGINT) AS freq
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair LIMIT 30
    """,
)
def text_bpe_pair_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.textstats import tokens

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    vocab = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("w") >= 2)
    )
    pairs = vocab.select(
        "wc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("freq"))
        .orderBy(F.col("freq").desc(), "pair")
        .limit(30)
    )


# --------------------------------------------------------------------------
# Corpus-hot span scrubbing (beyond; the exact-substring-dedup shape
# from "Deduplicating Training Data Makes Language Models Better",
# Lee et al. 2022, simplified to hot-n-gram coverage): a 3-gram
# appearing in >= 3 distinct documents marks its token positions as
# boilerplate; the per-doc scrub report counts tokens covered by any
# hot-gram occurrence. All set algebra on (doc, position) pairs —
# explode, one distinct, keyed counts; the full text never shuffles.
# --------------------------------------------------------------------------
@query(
    "text_hot_span_scrub",
    survey="beyond:hot-span-scrub",
    priority=60,
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(text), '\s+')) AS tok,
               UNNEST(generate_series(
                   1, LEN(string_split_regex(trim(text), '\s+')))) AS pos
        FROM documents
    ),
    words AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id, CAST(i AS INT) AS start,
               array_to_string(w[i:i+2], ' ') AS gram
        FROM words, UNNEST(generate_series(1, LEN(w) - 2)) AS t(i)
    ),
    hot AS (
        SELECT gram FROM grams
        GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 3
    ),
    covered AS (
        SELECT DISTINCT g.doc_id, CAST(p AS INT) AS pos
        FROM grams g JOIN hot USING (gram),
             UNNEST(generate_series(g.start, g.start + 2)) AS c(p)
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS INT) AS n_tokens,
           CAST(COALESCE(MAX(c.n), 0) AS INT) AS n_scrubbed
    FROM toks t
    LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n FROM covered GROUP BY doc_id
    ) c ON t.doc_id = c.doc_id
    GROUP BY t.doc_id
    """,
)
def text_hot_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.textstats import tokens

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    w = docs.select(F.col("doc_id"), tokens("text").alias("w"))
    n_tokens = w.select(
        "doc_id", F.size("w").cast("int").alias("n_tokens")
    )
    idxs = F.when(
        F.size("w") >= 3, F.sequence(F.lit(1), F.size("w") - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = w.select(
        "doc_id",
        F.explode(
            F.transform(
                idxs,
                lambda i: F.struct(
                    i.alias("start"),
                    F.array_join(F.slice("w", i, 3), " ").alias("gram"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.start", "g.gram")
    hot = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 3)
        .select("gram")
    )
    covered = (
        grams.join(hot, "gram", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + 2)
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_scrubbed"))
    )
    return n_tokens.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_scrubbed", F.lit(0)).alias("n_scrubbed"),
    )


# --------------------------------------------------------------------------
# Persisted LSH index cycle (beyond): the deployment shape
# lsh_candidates_between's docstring promises — the corpus's band keys
# live in a TABLE that persists across ingests (here the round-4
# transaction-log format, so the daily append is a file-add commit,
# never a rewrite), each incoming batch PROBES the stored index
# instead of recomputing corpus signatures, and after screening the
# batch's own keys are appended for the next cycle. In-query asserts
# pin the protocol (append-only commits, index growth == batch keys);
# the oracle checks the probe's candidate pairs.
# --------------------------------------------------------------------------
@query(
    "dedup_index_persisted",
    survey="beyond:incremental-dedup,beyond:txnlog",
    priority=60,
    oracle=rf"""
    WITH corpus AS (
        SELECT doc_id AS id, text, 0 AS is_new FROM documents
        UNION ALL
        SELECT doc_id + {_ING_OFFSET}, text || ' freshly ingested', 1
        FROM documents WHERE doc_id % 20 = 7
    ),
    words AS (
        SELECT id, is_new, string_split_regex(trim(text), '\s+') AS w
        FROM corpus
    ),
    idx AS (
        SELECT id, is_new, w, UNNEST(generate_series(1, LEN(w) - 2)) AS i
        FROM words
    ),
    sh AS (
        SELECT DISTINCT id, is_new, array_to_string(w[i:i+2], ' ') AS sh
        FROM idx
    ),
    sig AS (
        SELECT id, is_new,
               MIN(md5('0|' || sh)) AS h0, MIN(md5('1|' || sh)) AS h1,
               MIN(md5('2|' || sh)) AS h2, MIN(md5('3|' || sh)) AS h3
        FROM sh GROUP BY id, is_new
    ),
    bands AS (
        SELECT id, is_new, 0 AS band, h0 || h1 AS key FROM sig
        UNION ALL
        SELECT id, is_new, 1, h2 || h3 FROM sig
    )
    SELECT DISTINCT o.id AS corpus_id, n.id AS new_id
    FROM bands o
    JOIN bands n ON o.band = n.band AND o.key = n.key
    WHERE o.is_new = 0 AND n.is_new = 1
    """,
)
def dedup_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    from pyspark.sql import types as T

    from ..datapipe.dedup import lsh_band_keys
    from ..operators.txnlog import TxnLogTable

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    batch = docs.filter(F.col("doc_id") % 20 == 7).select(
        (F.col("doc_id") + _ING_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" freshly ingested")).alias("text"),
    )
    index_schema = T.StructType(
        [
            T.StructField("band", T.IntegerType()),
            T.StructField("key", T.StringType()),
            T.StructField("id", T.LongType()),
        ]
    )
    root = _tf.mkdtemp(prefix="rqe-lsh-index-")
    index = TxnLogTable(
        spark, f"{root}/lsh_index", index_schema, keys=["band", "key", "id"]
    )
    # cycle day 0: corpus band keys land once (one-time build cost)
    index.init(lsh_band_keys(minhash_signature(shingles(docs))))
    n_before = index.read().count()

    # cycle day 1: probe the STORED index — corpus signatures are read,
    # not recomputed — then append the batch's keys for day 2
    batch_keys = lsh_band_keys(
        minhash_signature(shingles(batch)), id_out="d2"
    ).localCheckpoint(eager=True)  # probed AND appended: cut once
    cand = (
        index.read()
        .withColumnRenamed("id", "d1")
        .join(batch_keys, ["band", "key"])
        .select(
            F.col("d1").alias("corpus_id"), F.col("d2").alias("new_id")
        )
        .distinct()
    )
    index.append(batch_keys.select("band", "key", F.col("d2").alias("id")))
    assert index.current_version() == 1, "append must be one commit"
    n_after = index.read().count()
    n_batch = batch_keys.count()
    assert n_after == n_before + n_batch, (
        f"index grew {n_after - n_before}, expected {n_batch}"
    )
    return cand


# --------------------------------------------------------------------------
# Unicode NFC normalization (beyond; the canonical first pass of a
# web-corpus pipeline): composed vs decomposed grapheme forms ('é' as
# U+00E9 vs 'e'+U+0301) break exact dedup/shingling/tokenization at
# the byte level. Spark has no built-in NFC expression, so this is
# the repo's one legitimate scalar Python-UDF text path — Arrow-
# batched pandas UDF over C-backed unicodedata.normalize — and it
# stays hash-oracle-able because DuckDB's nfc_normalize implements
# the same Unicode standard. The synthetic corpus is ASCII, so the
# query plants decomposed sequences first (every 'a' gains a
# combining acute) in BOTH engines; NFC must then recompose them
# (len_nfc < len_decomposed wherever an 'a' existed).
# --------------------------------------------------------------------------
@query(
    "text_nfc_normalize",
    survey="beyond:unicode-nfc",
    priority=60,
    oracle="""
    WITH decomposed AS (
        SELECT doc_id, replace(text, 'a', 'a' || chr(769)) AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(LENGTH(t) AS INT) AS len_decomposed,
           CAST(LENGTH(nfc_normalize(t)) AS INT) AS len_nfc,
           md5(nfc_normalize(t)) AS nfc_md5
    FROM decomposed
    """,
)
def text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datapipe.textstats import nfc_normalize

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    t = F.regexp_replace(F.col("text"), "a", "a\u0301")
    nfc = nfc_normalize(t)
    return docs.select(
        "doc_id",
        F.length(t).cast("int").alias("len_decomposed"),
        F.length(nfc).cast("int").alias("len_nfc"),
        F.md5(F.encode(nfc, "UTF-8")).alias("nfc_md5"),
    )


# --------------------------------------------------------------------------
# Exact-substring dedup (beyond; the ExactSubstr method of
# "Deduplicating Training Data Makes Language Models Better", Lee et
# al. 2022, at 3-token granularity): a 3-gram occurring >= 2 times
# across the corpus marks its positions duplicated; overlapping /
# adjacent duplicated grams consolidate into MAXIMAL SPANS per
# document (gaps-and-islands over token positions), and the per-doc
# report drives the keep/trim/drop routing a training pipeline
# applies. Differs from text_hot_span_scrub (coverage counting of
# >=3-doc-hot grams) by span consolidation and within-corpus repeat
# counting. All distributed set algebra: one gram-keyed aggregate
# (map-side combinable), one semi-join, a per-document window
# (bounded by document length — no global ordering), keyed rollups.
# No suffix array needed: at fixed k the shingle-hash equi-join finds
# exactly the >=k-token duplicated substrings, and island merging
# reconstructs the maximal runs. At 100 TB the gram aggregate is the
# only corpus-scale shuffle and it reduces to (gram, count) partials.
# Decisions are integer-arithmetic (2*dup > n, 5*dup > n), so the
# emitted frame is hash-exact by construction — no doubles.
# --------------------------------------------------------------------------
@query(
    "text_exact_substring_dedup",
    survey="beyond:exact-substring-dedup",
    priority=60,
    oracle=r"""
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id, CAST(i AS INT) AS start,
               array_to_string(w[i:i+2], ' ') AS gram
        FROM words, UNNEST(generate_series(1, LEN(w) - 2)) AS t(i)
    ),
    dup AS (
        SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
    ),
    hits AS (
        SELECT doc_id, start FROM grams JOIN dup USING (gram)
    ),
    flagged AS (
        SELECT doc_id, start,
               CASE WHEN start - LAG(start) OVER (
                        PARTITION BY doc_id ORDER BY start) <= 3
                    THEN 0 ELSE 1 END AS brk
        FROM hits
    ),
    islands AS (
        SELECT doc_id, start,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY start
                              ROWS UNBOUNDED PRECEDING) AS isl
        FROM flagged
    ),
    spans AS (
        SELECT doc_id, isl,
               MAX(start) - MIN(start) + 3 AS span_len
        FROM islands GROUP BY doc_id, isl
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INT) AS n_dup_spans,
               CAST(SUM(span_len) AS INT) AS dup_tokens,
               CAST(MAX(span_len) AS INT) AS max_span_len
        FROM spans GROUP BY doc_id
    ),
    base AS (
        SELECT d.doc_id,
               CAST(LEN(string_split_regex(trim(d.text), '\s+')) AS INT)
                   AS n_tokens,
               CAST(COALESCE(p.n_dup_spans, 0) AS INT) AS n_dup_spans,
               CAST(COALESCE(p.dup_tokens, 0) AS INT) AS dup_tokens,
               CAST(COALESCE(p.max_span_len, 0) AS INT) AS max_span_len
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    )
    SELECT *,
           CASE WHEN 2 * dup_tokens > n_tokens THEN 'drop'
                WHEN 5 * dup_tokens > n_tokens THEN 'trim'
                ELSE 'keep' END AS decision
    FROM base
    """,
)
def text_exact_substring_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ..datapipe.textstats import tokens

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    w = docs.select(F.col("doc_id"), tokens("text").alias("w"))
    n_tokens = w.select(
        "doc_id", F.size("w").cast("int").alias("n_tokens")
    )
    idxs = F.when(
        F.size("w") >= 3, F.sequence(F.lit(1), F.size("w") - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = w.select(
        "doc_id",
        F.explode(
            F.transform(
                idxs,
                lambda i: F.struct(
                    i.alias("start"),
                    F.array_join(F.slice("w", i, 3), " ").alias("gram"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.start", "g.gram")
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("gram")
    )
    hits = grams.join(dup, "gram", "left_semi").select("doc_id", "start")
    win = Window.partitionBy("doc_id").orderBy("start")
    flagged = hits.withColumn(
        "brk",
        F.when(
            F.col("start") - F.lag("start").over(win) <= 3, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "isl",
        F.sum("brk").over(
            win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = islands.groupBy("doc_id", "isl").agg(
        (F.max("start") - F.min("start") + F.lit(3)).alias("span_len")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_dup_spans"),
        F.sum("span_len").cast("int").alias("dup_tokens"),
        F.max("span_len").cast("int").alias("max_span_len"),
    )
    out = n_tokens.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.coalesce("max_span_len", F.lit(0)).alias("max_span_len"),
    )
    return out.withColumn(
        "decision",
        F.when(2 * F.col("dup_tokens") > F.col("n_tokens"), "drop")
        .when(5 * F.col("dup_tokens") > F.col("n_tokens"), "trim")
        .otherwise("keep"),
    )
