"""Streaming exact dedup (state across restarts) + stateless streaming
decontamination == batch operator."""

import shutil
import tempfile

from pyspark.sql import functions as F

from unarxive_spark.streaming.dedup import (
    start_streaming_dedup,
    streaming_decontaminate,
)

SCHEMA = "doc_id long, text string, ts timestamp"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, f"2025-01-01 00:{i:02d}:00") for i, t in rows],
        "doc_id long, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_streaming_dedup_across_restarts(spark):
    """Duplicates arriving in a LATER run (new query, same checkpoint)
    are still dropped — the seen-hash state is durable."""
    base = tempfile.mkdtemp(prefix="sdedup_")
    in_dir, out_dir, ck = f"{base}/in", f"{base}/out", f"{base}/ck"
    try:
        first = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
        second = _docs(
            spark,
            [
                (3, "alpha beta"),   # dup of doc 1 from run 1
                (4, "epsilon zeta"),
                (5, "epsilon zeta"),  # dup within run 2
            ],
        )
        first.write.mode("append").parquet(in_dir)
        q = start_streaming_dedup(spark, in_dir, out_dir, ck)
        q.awaitTermination(180)

        second.write.mode("append").parquet(in_dir)
        q = start_streaming_dedup(spark, in_dir, out_dir, ck)
        q.awaitTermination(180)

        out = spark.read.schema(SCHEMA).parquet(out_dir)
        got = {r["doc_id"]: r["text"] for r in out.collect()}
        assert set(got.values()) == {
            "alpha beta",
            "gamma delta",
            "epsilon zeta",
        }
        assert 1 in got and 2 in got  # first-seen rows survive
        assert 3 not in got           # cross-run duplicate dropped
        assert len(got) == 3          # within-run duplicate dropped too
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_decontaminate_matches_batch(spark):
    """The stateless streaming filter == the batch decontaminate
    operator on identical inputs (run here on a batch DF — the
    expression is trigger-agnostic by construction)."""
    from unarxive_spark.operators.corpus import decontaminate

    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over dogs"),
            (2, "completely different words entirely here now"),
            (3, "quick brown fox jumps elsewhere today"),
        ],
    )
    bench = _docs(
        spark, [(100, "something quick brown fox jumps something")]
    )
    want = sorted(
        r["doc_id"] for r in decontaminate(train, bench, n=4).collect()
    )
    got = sorted(
        r["doc_id"]
        for r in streaming_decontaminate(train, bench, n=4).collect()
    )
    assert got == want == [2]
    # empty benchmark → pass-through
    empty = _docs(spark, []).filter("1=0")
    assert streaming_decontaminate(train, empty, n=4).count() == 3
