"""L1 extraction: span offsets, byte-identity invariant, built-in parity."""

import pandas as pd
from pyspark.sql import functions as F

from unarxive_spark.functions.refs import (
    extract_ref_ids,
    extract_refs,
    renumber_citations,
    splice_markers,
)


def test_spans_offsets_roundtrip(spark):
    rows = [
        ("a", 0, "see conv:c000007 and conv:c000009 ok"),
        ("b", 0, "no refs here"),
        ("c", 0, "合計 conv:c000001 📊 conv:c000001"),
        ("d", 0, None),
        ("e", 0, ""),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = df.select("conv_id", "text", extract_refs("text").alias("refs"))
    got = {r["conv_id"]: r for r in out.collect()}

    spans = got["a"]["refs"]
    assert [s["ref_id"] for s in spans] == ["c000007", "c000009"]
    # offset fidelity: slicing the original text by (start, end) re-yields
    # the marker (reference precedent ml_tasks_prep_data.py:182)
    for s in spans:
        assert got["a"]["text"][s["start"] : s["end"]] == s["text"]
    assert got["b"]["refs"] == []
    # multi-byte text: offsets are char offsets, duplicates both reported
    sp = got["c"]["refs"]
    assert [s["ref_id"] for s in sp] == ["c000001", "c000001"]
    for s in sp:
        assert got["c"]["text"][s["start"] : s["end"]] == s["text"]
    assert got["d"]["refs"] == []
    assert got["e"]["refs"] == []


def test_text_byte_identity_through_extraction(spark, transcripts_small):
    """input_hint invariant: per-turn text byte-equality under stable
    (conv_id, turn_idx) ordering after the extraction stage."""
    before = transcripts_small.select("conv_id", "turn_idx", "text")
    after = transcripts_small.withColumn(
        "refs", extract_refs("text")
    ).select("conv_id", "turn_idx", "text")
    joined = before.alias("b").join(
        after.alias("a"), ["conv_id", "turn_idx"]
    )
    n_bad = joined.filter(
        F.col("b.text").cast("binary") != F.col("a.text").cast("binary")
    ).count()
    assert n_bad == 0
    # ordering stability: (conv_id, turn_idx) is a unique dense key
    n = transcripts_small.count()
    nd = transcripts_small.select("conv_id", "turn_idx").distinct().count()
    assert n == nd


def test_builtin_fast_path_matches_udf(spark, transcripts_small):
    """regexp_extract_all (JVM) and the pandas UDF must mine identical ids."""
    a = transcripts_small.select(
        "conv_id",
        "turn_idx",
        extract_ref_ids("text").alias("ids_builtin"),
        F.transform(extract_refs("text"), lambda s: s["ref_id"]).alias(
            "ids_udf"
        ),
    )
    assert a.filter(F.col("ids_builtin") != F.col("ids_udf")).count() == 0


def test_splice_and_renumber(spark):
    df = spark.createDataFrame(
        [("x conv:a1 y conv:b2 z conv:a1",)], "text string"
    )
    out = df.select(
        splice_markers(
            "text", F.create_map(F.lit("a1"), F.lit("[1]"))
        ).alias("spliced"),
        splice_markers("text", F.create_map().cast("map<string,string>")).alias(
            "identity"
        ),
        renumber_citations("text").alias("order"),
    ).collect()[0]
    assert out["spliced"] == "x [1] y conv:b2 z [1]"
    assert out["identity"] == "x conv:a1 y conv:b2 z conv:a1"
    assert out["order"] == ["a1", "b2"]


def test_h64_matches_duckdb():
    import duckdb

    from unarxive_spark.functions.hashing import h64_sql

    expr = h64_sql("'hello'")
    got = duckdb.sql(f"SELECT {expr}").fetchone()[0]
    assert got == 419982666956583591
