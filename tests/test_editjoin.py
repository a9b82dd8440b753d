"""SymSpell deletion-neighborhood join vs brute-force levenshtein."""

import pytest

from unarxive_spark.operators.editjoin import symspell_join


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1,
                d[j - 1] + 1,
                prev + (a[i - 1] != b[j - 1]),
            )
    return d[n]


WORDS = [
    "spark",
    "spork",      # substitute vs spark
    "sparks",     # insert vs spark
    "spar",       # delete vs spark
    "stark",      # substitute vs spark
    "shark",      # substitute vs spark/stark
    "catalyst",
    "catalysts",
    "tungsten",
    "tungstn",    # delete
    "shuffle",
    "shufle",     # delete
    "sofle",      # distance 2 from shufle
    "ab",         # short — dropped at d=2
]


def _brute(d):
    return sorted(
        (x, y, _lev(x, y))
        for i, a in enumerate(WORDS)
        for b in WORDS[i + 1 :]
        for x, y in [(min(a, b), max(a, b))]
        if x != y and _lev(x, y) <= d and len(x) > d and len(y) > d
    )


@pytest.mark.parametrize("d", [1, 2])
def test_symspell_matches_brute_force(spark, d):
    df = spark.createDataFrame([(w,) for w in WORDS], "word string")
    got = sorted(
        (r["a"], r["b"], r["dist"])
        for r in symspell_join(df, "word", max_distance=d).collect()
    )
    assert got == _brute(d)
    assert got, "fixture must produce pairs"


def test_symspell_no_cartesian(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "word string")
    plan = symspell_join(df, "word")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_symspell_rejects_bad_distance(spark):
    df = spark.createDataFrame([("x",)], "word string")
    with pytest.raises(ValueError, match="max_distance"):
        symspell_join(df, "word", max_distance=3)
