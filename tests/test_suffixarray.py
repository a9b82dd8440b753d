"""Generalized suffix array + LCP spectrum vs a pure-Python replay."""

from collections import Counter

import pytest

from unarxive_spark.operators.suffixarray import (
    duplicated_span_stats,
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


def _dup_stats(docs, min_len):
    """Brute-force truth: a position (d, i) starts a dup span of the
    longest l ≥ min_len such that toks[d][i:i+l] occurs elsewhere
    (any doc, any position ≠ (d, i)); coverage = union of intervals."""
    toks = _toks(docs)
    spans = {}
    for d, ts in toks.items():
        for i in range(len(ts)):
            best = 0
            for d2, ts2 in toks.items():
                for j in range(len(ts2)):
                    if (d2, j) == (d, i):
                        continue
                    l = 0
                    while (
                        i + l < len(ts)
                        and j + l < len(ts2)
                        and ts[i + l] == ts2[j + l]
                    ):
                        l += 1
                    best = max(best, l)
            if best >= min_len:
                spans.setdefault(d, []).append((i, i + best))
    out = {}
    for d, ts in toks.items():
        ivs = sorted(spans.get(d, []))
        cov, end = 0, 0
        for a, b in ivs:
            cov += max(0, b - max(end, a))
            end = max(end, b)
        out[d] = (len(ts), cov, round(cov / len(ts), 6))
    return out


def test_duplicated_span_stats_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in duplicated_span_stats(df, min_len=3).collect()
    }
    assert got == _dup_stats(DOCS, 3)
    # the exact-dup docs 1 and 3 are fully covered
    assert got[1][2] == 1.0 and got[3][2] == 1.0
    # the unique doc has zero coverage
    assert got[5] == (4, 0, 0.0)


def test_duplicated_span_stats_overlapping_intervals(spark):
    """Overlapping dup spans must not double-count coverage."""
    docs = [
        (1, "a b c d e f"),
        (2, "a b c d x y"),
        (3, "c d e f x y"),
    ]  # doc 1: spans [0,4) and [2,6) overlap -> union 6, not 8
    df = spark.createDataFrame(docs, SCHEMA)
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in duplicated_span_stats(df, min_len=3).collect()
    }
    assert got == _dup_stats(docs, 3)
    assert got[1] == (6, 6, 1.0)


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


def test_early_stop_matches_full_depth_construction(spark):
    """The stable-partition early stop (r6 optimization) must be
    invisible: the LCP spectrum with auto rounds (early-stopped) equals
    the spectrum with the full explicit doubling depth, on a fixture
    with exact duplicate docs (identical-suffix shortcut) AND internal
    repetition (non-trivial lifting)."""
    df = spark.createDataFrame(DOCS, SCHEMA)
    auto = {
        (r.lcp): r.n_pairs
        for r in repeated_span_histogram(df).collect()
    }
    deep = {
        (r.lcp): r.n_pairs
        for r in repeated_span_histogram(df, rounds=8).collect()
    }
    assert auto == deep
    # and the early stop really engaged: ranks stabilize well before
    # the max-length bound on this fixture
    _, per_round, _ = suffix_ranks(df)
    assert len(per_round) - 1 < 8
