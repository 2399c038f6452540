"""Tokenization functions for the text pipeline (beyond-reference,
SURVEY.md §7 — token counting: whitespace + a BPE-ish regex).

Whitespace tokens approximate "words"; the BPE-ish pre-tokenizer
splits the way byte-pair-encoding vocabularies do before merges —
letter runs, digit runs, and individual punctuation marks become
separate tokens (the GPT-2 pre-tokenizer shape, simplified to
character classes that Java regex and RE2/DuckDB interpret
identically, so counts are oracle-checkable).

All JVM-side: ``split`` / ``regexp_extract_all`` / higher-order array
functions — no Python in the hot path, whole-stage codegen applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Letter run | digit run | single non-alnum non-space char.
# Deliberately no lookarounds / \p classes: identical semantics in
# Java regex (Spark) and RE2 (DuckDB's regexp_extract_all).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def whitespace_tokens(text: Column) -> Column:
    """Split on whitespace runs (the token counter used by
    quality_metrics)."""
    return F.split(F.trim(text), "\\s+")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-style pre-tokens: array of letter runs, digit runs, and
    single punctuation marks."""
    # idx=0 → whole match (the pattern has no capture groups)
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token accounting: whitespace words, BPE-ish
    pre-tokens, and the bytes-per-token ratio LLM data work keys on
    (truncated to 6 decimals — see multimodal._trunc6 for why
    truncation, not rounding)."""
    t = F.col(text_col)
    n_ws = F.array_size(whitespace_tokens(t))
    n_bpe = F.array_size(bpe_ish_tokens(t))
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.floor(F.length(t) / n_bpe * 1e6) / 1e6).alias("bytes_per_token"),
    )
