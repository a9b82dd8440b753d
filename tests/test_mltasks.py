"""ML sample prep + stratified split (ml_tasks_* analogs)."""

from pyspark.sql import functions as F

from unarxive_spark.operators.mltasks import (
    label_counts,
    prep_samples,
    split_distribution,
    stratified_split,
)


def test_prep_samples_renumbering(spark):
    rows = [
        ("a", 0, "user", "x" * 40 + " conv:b1 mid conv:c2 end conv:b1", ""),
        ("a", 1, "tool", "short", ""),
        ("b", 0, "assistant", "y" * 50 + " no refs", ""),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2025-01-01")))
    s = prep_samples(t, min_chars=40).collect()
    by_id = {r["_id"]: r for r in s}
    assert set(by_id) == {"a#0", "b#0"}  # short turn filtered
    # first-appearance renumbering: b1→[1], c2→[2], duplicate b1→[1]
    assert by_id["a#0"]["text"].endswith("[1] mid [2] end [1]")
    assert by_id["a#0"]["n_distinct_refs"] == 2
    assert by_id["b#0"]["text"].endswith(" no refs")  # untouched
    assert by_id["b#0"]["n_distinct_refs"] == 0


def test_stratified_split(spark, transcripts_small):
    samples = prep_samples(transcripts_small, min_chars=10).cache()
    split = stratified_split(samples, train=0.8, dev=0.1, seed=42).cache()
    # split is a partition of the samples
    assert split.count() == samples.count()
    dist = {
        (r["label"], r["split"]): r["share"]
        for r in split_distribution(split).collect()
    }
    for label in {k[0] for k in dist}:
        assert 0.7 < dist.get((label, "train"), 0) < 0.9, (label, dist)
    # deterministic across recomputation
    s2 = stratified_split(samples, train=0.8, dev=0.1, seed=42)
    assert split.select("_id", "split").exceptAll(
        s2.select("_id", "split")
    ).count() == 0
    # different seed → different assignment
    s3 = stratified_split(samples, seed=7)
    assert (
        split.select("_id", "split")
        .exceptAll(s3.select("_id", "split"))
        .count()
        > 0
    )


def test_label_counts_threshold(spark, transcripts_small):
    samples = prep_samples(transcripts_small, min_chars=10)
    lc = {r["label"]: r["n_convs"] for r in label_counts(samples).collect()}
    assert set(lc) == {"user", "assistant", "tool"}
    assert all(v >= 3 for v in lc.values())
