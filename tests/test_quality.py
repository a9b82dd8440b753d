"""Repetition metrics vs a pure-Python oracle (edge docs included)."""

from collections import Counter

from unarxive_spark.operators.quality import repetition_metrics

DOCS = [
    (0, "the cat sat on the mat the cat sat again"),
    (1, "spam spam spam spam spam spam"),
    (2, "one"),
    (3, ""),
    (4, "   "),
    (5, "a b a b a b a b c"),
    (6, "unique words only here today friend"),
]


def _oracle(text):
    toks = [t for t in text.split() if t]
    n = len(toks)
    bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    top = max(Counter(bgs).values()) if bgs else 0
    return (
        n,
        (len(set(toks)) / n) if n else 0.0,
        top,
        (top / (n - 1)) if n >= 2 else 0.0,
    )


def test_repetition_metrics_match_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.ttr, r.top_bigram_count, r.top_bigram_frac)
        for r in repetition_metrics(df).collect()
    }
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        n, ttr, top, frac = _oracle(text)
        gn, gttr, gtop, gfrac = got[doc_id]
        assert gn == n, (doc_id, got[doc_id])
        assert abs(gttr - ttr) < 1e-12, (doc_id, got[doc_id])
        assert gtop == top, (doc_id, got[doc_id])
        assert abs(gfrac - frac) < 1e-12, (doc_id, got[doc_id])
    # sanity: spam doc is flagged, diverse doc is not
    assert got[1][3] > 0.9 and got[6][3] < 0.3


def test_pii_redaction(spark):
    from unarxive_spark.functions.texttools import pii_counts, redact_pii

    rows = [
        (0, "mail a.b+tag@sub.example.io and b@x.co plus +1-555-0100 done"),
        (1, "no pii here at all"),
        (2, "+44-20-7946-0958 only a phone"),
        (3, "edge a@b.c not-an-email @nope 12345"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    n_mail, n_phone = pii_counts("t")
    got = {
        r.i: (r.nm, r.np, r.red)
        for r in df.select(
            "i",
            n_mail.alias("nm"),
            n_phone.alias("np"),
            redact_pii("t").alias("red"),
        ).collect()
    }
    assert got[0] == (
        2, 1, "mail <EMAIL> and <EMAIL> plus <PHONE> done"
    )
    assert got[1] == (0, 0, "no pii here at all")
    assert got[2] == (0, 1, "<PHONE> only a phone")
    assert got[3][0] == 0  # a@b.c TLD too short; @nope no local part
