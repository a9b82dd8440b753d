"""Generalized suffix array + LCP spectrum vs a pure-Python replay."""

from collections import Counter

import pytest

from unarxive_spark.operators.suffixarray import (
    repeated_span_histogram,
    suffix_ranks,
)

SCHEMA = "doc_id long, text string"
DOCS = [
    (1, "the cat sat on the mat"),
    (2, "a dog sat on the mat today"),       # shares "sat on the mat"
    (3, "the cat sat on the mat"),           # exact dup of 1
    (4, "ping pong ping pong ping"),         # internal repetition
    (5, "unique tokens only here"),
    (6, "mat"),                              # 1-token doc
]


def _toks(docs):
    return {d: t.lower().split() for d, t in docs if t.split()}


def _sa_order(docs):
    toks = _toks(docs)
    sufs = [(d, i) for d, ts in sorted(toks.items()) for i in range(len(ts))]
    return sorted(sufs, key=lambda s: (toks[s[0]][s[1]:], s)), toks


def _lcp_hist(docs):
    order, toks = _sa_order(docs)
    hist = Counter()
    for (ad, ai), (bd, bi) in zip(order, order[1:]):
        ta, tb = toks[ad][ai:], toks[bd][bi:]
        l = 0
        while l < min(len(ta), len(tb)) and ta[l] == tb[l]:
            l += 1
        hist[l] += 1
    return dict(hist)


def test_suffix_ranks_order_is_lexicographic(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    final, per_round, lens = suffix_ranks(df, rounds=5)
    rows = sorted(
        ((r["r"], r["d"], r["i"]) for r in final.collect())
    )
    got_order = [(d, i) for _, d, i in rows]
    want_order, toks = _sa_order(DOCS)
    assert got_order == want_order
    # identical suffixes (docs 1 and 3) share a rank; distinct don't
    by_suffix = {}
    for r, d, i in rows:
        by_suffix.setdefault(tuple(toks[d][i:]), set()).add(r)
    for suf, ranks in by_suffix.items():
        assert len(ranks) == 1, suf
    assert len({rs.pop() for rs in by_suffix.values()}) == len(by_suffix)


def test_repeated_span_histogram_matches_replay(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {
        r["lcp"]: r["n_pairs"]
        for r in repeated_span_histogram(df, rounds=5).collect()
    }
    want = _lcp_hist(DOCS)
    assert got == want
    # the longest repeated token sequence is the 6-token exact dup
    assert max(got) == 6


def test_suffix_ranks_rejects_overlong_docs(spark):
    df = spark.createDataFrame([(1, "a b c d e")], SCHEMA)
    with pytest.raises(ValueError, match="doubling rounds"):
        suffix_ranks(df, rounds=2)  # limit 3 tokens


def test_repeated_span_histogram_no_repeats(spark):
    """All-distinct tokens: every adjacent LCP is 0."""
    df = spark.createDataFrame([(1, "q w e r t y")], SCHEMA)
    got = {
        r["lcp"]: r["n_pairs"]
        for r in repeated_span_histogram(df, rounds=3).collect()
    }
    assert got == {0: 5}
