from .tokenize import (
    BPE_ISH_PATTERN,
    bpe_ish_tokens,
    token_stats,
    whitespace_tokens,
)

__all__ = [
    "BPE_ISH_PATTERN",
    "bpe_ish_tokens",
    "token_stats",
    "whitespace_tokens",
]
