"""text_bpe_encode: the window-algebra segmentation must equal a
sequential reference BPE encoder — collect the trained merge table and
the vocabulary, encode every word in plain Python (exhaustive
left-to-right non-overlapping pass per merge, in rank order), and
compare the aggregated token table exactly."""

from __future__ import annotations

from collections import Counter, defaultdict


def _apply_merge(syms: list, pair: tuple) -> list:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_encode_matches_sequential_reference(spark, sf_small):
    from relational_query_engine_sql_spark.plans import all_queries
    from relational_query_engine_sql_spark.plans.queries_advanced import (
        _bpe_syms,
    )

    qs = all_queries()
    merges = [
        (r["l_sym"], r["r_sym"])
        for r in sorted(
            qs["text_bpe_merge_train"](spark, sf_small).collect(),
            key=lambda r: r["merge_round"],
        )
    ]
    assert len(merges) == 3

    vocab = {
        (r["w"], r["wc"])
        for r in _bpe_syms(spark, sf_small).select("w", "wc").collect()
    }
    token_count: Counter = Counter()
    token_words = defaultdict(set)
    for w, wc in vocab:
        syms = list(w)
        for pair in merges:
            syms = _apply_merge(syms, pair)
        assert "".join(syms) == w  # segmentation reconstructs the word
        for s in syms:
            token_count[s] += wc
            token_words[s].add(w)

    got = {
        r["token"]: (r["token_count"], r["n_words"])
        for r in qs["text_bpe_encode"](spark, sf_small).collect()
    }
    want = {
        t: (c, len(token_words[t])) for t, c in token_count.items()
    }
    assert got == want
