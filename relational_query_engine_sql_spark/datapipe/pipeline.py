"""End-to-end corpus-cleaning pipeline: the composition a training-data
run actually executes (quality gate → language gate → exact dedup),
expressed as ONE declarative plan so Catalyst fuses the filters into
the scan and the only shuffles are the language-vote join and the
dedup hash groupBy.

Stage order matters at scale: the cheap row-local gates (token count,
alpha ratio) run first and prune before anything shuffles; dedup —
the only wide stage — sees only survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized
from .textstats import language_vote, token_count


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = 20,
    min_alpha: float = 0.8,
    lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surviving documents after the three gates.

    Output: (doc_id, n_tokens) for docs that (1) have >= min_tokens
    whitespace tokens and alpha-character ratio >= min_alpha,
    (2) vote ``lang`` under the stopword language-ID heuristic, and
    (3) are the keeper (min id) of their normalized-content hash group
    — dedup runs AFTER the filters so the wide stage only processes
    survivors.
    """
    t = F.col(text_col)
    alpha_ratio = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / F.length(t)
    gated = docs.select(
        F.col(id_col), t, token_count(text_col).alias("n_tokens")
    ).filter(
        (F.col("n_tokens") >= min_tokens) & (alpha_ratio >= min_alpha)
    )

    # language vote as a column on the already-gated rows — no join,
    # and the (relatively pricey) stopword scoring never runs on rows
    # the quality gate dropped
    voted = gated.filter(language_vote(text_col) == lang)

    hashed = voted.select(
        F.col(id_col), "n_tokens", F.md5(normalized(text_col)).alias("h")
    )
    # min-id-per-hash as a window over ONE shuffle keyed by h: the old
    # groupBy + left-semi join evaluated the whole gated subtree
    # (quality regexes, language vote, md5) twice — once per join
    # side. Same survivor set (a row survives iff its id is the
    # group minimum), one pass, no join.
    keep_w = Window.partitionBy("h")
    return (
        hashed.withColumn("_min_id", F.min(id_col).over(keep_w))
        .filter(F.col(id_col) == F.col("_min_id"))
        .select(id_col, "n_tokens")
    )
