"""J4 match-cascade analog + normalization scalar functions."""

from pyspark.sql import functions as F

from unarxive_spark.functions.texttools import (
    canonicalize_markers,
    decode_text,
    transliterate,
)
from unarxive_spark.operators.resolve import match_cascade, normalize_key


def test_cascade_levels_and_argmax(spark):
    dim = spark.createDataFrame(
        [
            (1, "alpha beta gamma", 10, "alpha"),
            (2, "alpha beta gamma", 99, "alpha"),  # same key, higher metric
            (3, "delta epsilon zeta", 50, "delta"),
            (4, "eta theta iota", 7, "eta"),
        ],
        "doc_id long, dim_key string, rank_metric long, first_token string",
    )
    mentions = spark.createDataFrame(
        [
            (100, "alpha beta gamma"),        # full match → ambiguous → argmax
            (101, "zzz delta epsilon zeta"),  # drop-first → rank 2
            (102, "eta theta iota qqq"),      # drop-last → rank 3
            (103, "nothing matches here"),    # unresolved → absent
            (104, "Alpha,  Beta   GAMMA!"),   # normalization
        ],
        "mention_id long, mention string",
    )
    got = {
        r["mention_id"]: (r["doc_id"], r["match_rank"])
        for r in match_cascade(mentions, dim).collect()
    }
    assert got[100] == (2, 1)  # argmax rank_metric among equal keys
    assert got[101] == (3, 2)
    assert got[102] == (4, 3)
    assert 103 not in got
    assert got[104] == (2, 1)


def test_cascade_containment_filter(spark):
    # candidate whose first_token does NOT appear in the mention is vetoed
    dim = spark.createDataFrame(
        [(1, "alpha beta gamma", 10, "notpresent")],
        "doc_id long, dim_key string, rank_metric long, first_token string",
    )
    mentions = spark.createDataFrame(
        [(100, "alpha beta gamma")], "mention_id long, mention string"
    )
    assert match_cascade(mentions, dim).count() == 0
    # without the containment predicate it resolves
    assert (
        match_cascade(mentions, dim, containment_token=None).count() == 1
    )


def test_normalize_key(spark):
    df = spark.createDataFrame(
        [("  Héllo,   World!! (x) ",)], "s string"
    )
    out = df.select(normalize_key("s").alias("k")).collect()[0]["k"]
    assert out == "héllo world x"


def test_transliterate_and_decode(spark):
    df = spark.createDataFrame([("Héllo Wörld café",)], "s string")
    out = df.select(transliterate("s").alias("t")).collect()[0]["t"]
    assert out == "Hello World cafe"

    bdf = spark.createDataFrame(
        [("héllo".encode("utf-8"),), ("caf\xe9".encode("latin-1"),)],
        "b binary",
    )
    got = [r["t"] for r in bdf.select(decode_text("b").alias("t")).collect()]
    assert got[0] == "héllo"
    assert got[1] == "café"  # latin-1 fallback


def test_transliterate_multi_script(spark):
    # recorded expected table: NFD-strip + built-in Latin-extended/
    # Greek/Cyrillic map (the reference's unidecode behavior for the
    # scripts that appear in bibliographic join keys)
    cases = [
        ("Müller-Łukasiewicz", "Muller-Lukasiewicz"),
        ("Dvořák", "Dvorak"),
        ("Erdős", "Erdos"),
        ("Øst-Grønland", "Ost-Gronland"),
        ("Straße", "Strasse"),
        ("Æsir œuvre", "AEsir oeuvre"),
        ("Þórður Guðmundsson", "Thordur Gudmundsson"),
        ("Гоголь", "Gogol"),
        ("Пушкин", "Pushkin"),
        ("Фёдор Достоевский", "Fedor Dostoevskii"),
        ("Щедрин", "Shchedrin"),
        ("Ψηφιακή ανάλυση", "Psephiake analuse"),
        ("Αρχιμήδης", "Arkhimedes"),
        # Arabic / Hebrew / kana / Hangul (round-4 tail extension)
        ("محمد", "mhmd"),
        ("الخوارزمي", "alkhwarzmy"),
        ("אברהם", "'brhm"),
        ("ひらがな", "hiragana"),
        ("カタカナ", "katakana"),
        ("トーキョー", "tokiyo"),  # per-char readings, like unidecode
        ("김정은", "gimjeong-eun".replace("-", "")),
        ("한글", "hangeul"),
        (None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "s string")
    got = [
        r["t"] for r in df.select(transliterate("s").alias("t")).collect()
    ]
    assert got == [c[1] for c in cases]


def test_canonicalize_markers(spark):
    df = spark.createDataFrame(
        [("a [[conv:x1]] b conv://y2 c CONV:z3 d conv:w4",)], "s string"
    )
    out = df.select(canonicalize_markers("s").alias("c")).collect()[0]["c"]
    assert out == "a conv:x1 b conv:y2 c conv:z3 d conv:w4"
