"""Weighted-Jaccard near-dups and the entropy screen vs brute-force
python replays, plus the semantic property each operator exists for:
repetition-awareness (WJ) and boilerplate detection (entropy)."""

import math
from collections import Counter

from unarxive_spark.operators.dedup import weighted_jaccard_pairs
from unarxive_spark.operators.quality import entropy_screen

DOC_SCHEMA = "doc_id long, text string"


def _shingles_multi(text, k=3):
    toks = [t for t in text.strip().lower().split() if t]
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _brute_wj(rows, t_e6):
    sh = {i: Counter(_shingles_multi(x)) for i, x in rows}
    tot = {i: sum(c.values()) for i, c in sh.items()}
    out = {}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            wmin = sum((sh[a] & sh[b]).values())
            wun = tot[a] + tot[b] - wmin
            if wmin and 1_000_000 * wmin >= t_e6 * wun:
                out[(a, b)] = (wmin, wun, round(wmin / wun, 6))
    return out


def test_weighted_jaccard_matches_brute_force(spark):
    rows = [
        (1, "the cat sat on the mat and the cat sat again"),
        (2, "the cat sat on the mat and then left quietly"),
        (3, "a completely different document about graphs"),
        (4, "the cat sat on the mat and the cat sat again"),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        (r.id_a, r.id_b): (r.w_shared, r.w_union, r.wjaccard)
        for r in weighted_jaccard_pairs(df, threshold_e6=200_000).collect()
    }
    assert got == _brute_wj(rows, 200_000)
    assert got[(1, 4)][2] == 1.0  # exact dup pair survives at WJ = 1


def test_weighted_jaccard_penalizes_repetition(spark):
    # B repeats A's text 3x: SET jaccard of shingles would be ~1.0,
    # weighted jaccard must be far lower (min-sum caps at A's mass)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, base), (2, " ".join([base] * 3))]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = weighted_jaccard_pairs(df, threshold_e6=100_000).collect()
    assert len(got) == 1
    r = got[0]
    assert r.wjaccard < 0.5  # not a near-dup under multiset semantics
    assert {
        (r.id_a, r.id_b): (r.w_shared, r.w_union, r.wjaccard)
    } == _brute_wj(rows, 100_000)


def _brute_entropy(rows, t_e6):
    out = {}
    for i, x in rows:
        tf = Counter(t for t in x.strip().lower().split() if t)
        n = sum(tf.values())
        num = sum(
            c * int(round(1e6 * math.log(n / c))) for c in tf.values()
        )
        out[i] = (
            n,
            len(tf),
            num,
            round(num / n / 1e6, 6),
            round(len(tf) / n, 6),
            num < t_e6 * n,
        )
    return out


def test_entropy_screen_matches_brute_force(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),          # H = 0 -> low
        (2, "one two three four five six"),            # H = ln 6
        (3, "aa aa bb bb cc cc"),                      # H = ln 3
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        r.doc_id: (
            r.n_tokens, r.n_types, r.entropy_num, r.entropy, r.ttr,
            r.is_low_entropy,
        )
        for r in entropy_screen(df, min_entropy_e6=1_200_000).collect()
    }
    assert got == _brute_entropy(rows, 1_200_000)
    assert got[1][5] is True and got[2][5] is False
    assert got[1][2] == 0  # constant doc: zero entropy, exactly
    assert got[2][3] == round(math.log(6), 6)
