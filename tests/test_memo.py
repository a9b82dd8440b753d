"""Batch memo read-through join: miss write-back + idempotent rerun
(J3, match_references_openalex.py:471-508 analog)."""

import shutil

from pyspark.sql import functions as F

from unarxive_spark.operators.memo import memo_resolve

MEMO_SCHEMA = "key string, resolved_id string, score double"


def _resolver_factory(calls):
    def resolver(misses):
        calls.append(misses.count())
        return misses.select(
            "key",
            F.concat(F.lit("R:"), F.col("key")).alias("resolved_id"),
            F.length("key").cast("double").alias("score"),
        )

    return resolver


def test_memo_readthrough_and_idempotent_rerun(spark, tmp_path):
    memo_path = str(tmp_path / "memo")
    shutil.rmtree(memo_path, ignore_errors=True)
    reqs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("a",)], "key string"
    )

    calls: list[int] = []
    out1 = memo_resolve(
        reqs, memo_path, _resolver_factory(calls), MEMO_SCHEMA
    ).collect()
    assert calls == [3]  # resolver ran once, over the 3 distinct keys
    assert {(r["key"], r["resolved_id"]) for r in out1} == {
        ("a", "R:a"),
        ("b", "R:b"),
        ("c", "R:c"),
    }
    assert len(out1) == 4  # request multiplicity preserved

    # rerun: ZERO external-resolution work (reference done-log semantics)
    out2 = memo_resolve(
        reqs, memo_path, _resolver_factory(calls), MEMO_SCHEMA
    ).collect()
    assert calls == [3]  # resolver never invoked again
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out1))

    # incremental batch: only the NEW key resolves
    reqs2 = spark.createDataFrame([("a",), ("d",)], "key string")
    out3 = memo_resolve(
        reqs2, memo_path, _resolver_factory(calls), MEMO_SCHEMA
    ).collect()
    assert calls == [3, 1]
    assert {(r["key"], r["resolved_id"]) for r in out3} == {
        ("a", "R:a"),
        ("d", "R:d"),
    }
    # memo table now holds exactly the 4 resolved keys
    memo = spark.read.parquet(memo_path)
    assert memo.count() == 4


def test_memo_unresolved_keys_stay_null(spark, tmp_path):
    """A resolver may legitimately fail some keys (reference: unmatched
    references stay unmatched) — they come back NULL, and are retried on
    the next run because they were never written back."""
    memo_path = str(tmp_path / "memo2")

    calls: list[int] = []

    def partial_resolver(misses):
        calls.append(misses.count())
        return misses.filter(F.col("key") != "bad").select(
            "key",
            F.concat(F.lit("R:"), F.col("key")).alias("resolved_id"),
            F.lit(1.0).alias("score"),
        )

    reqs = spark.createDataFrame([("ok",), ("bad",)], "key string")
    out = {
        r["key"]: r["resolved_id"]
        for r in memo_resolve(
            reqs, memo_path, partial_resolver, MEMO_SCHEMA
        ).collect()
    }
    assert out == {"ok": "R:ok", "bad": None}
    # 'bad' is retried (still a miss), 'ok' is not
    memo_resolve(reqs, memo_path, partial_resolver, MEMO_SCHEMA).collect()
    assert calls == [2, 1]


def test_memo_duplicate_rows_do_not_fan_out(spark, tmp_path):
    # a crash between append and commit (or two concurrent callers) can
    # land the same key twice in the memo; the read-through join must
    # stay 1:1 with the requests (dedup on read)
    memo_path = str(tmp_path / "memo_dup")
    dup = spark.createDataFrame(
        [("a", "R:a", 1.0), ("a", "R:a", 1.0), ("b", "R:b", 1.0)],
        MEMO_SCHEMA,
    )
    dup.write.mode("overwrite").parquet(memo_path)
    reqs = spark.createDataFrame([("a",), ("b",), ("a",)], "key string")
    calls: list[int] = []
    out = memo_resolve(
        reqs, memo_path, _resolver_factory(calls), MEMO_SCHEMA
    ).collect()
    assert calls == []  # no misses — resolver never invoked
    assert len(out) == 3  # request multiplicity, no join fan-out
    assert {(r["key"], r["resolved_id"]) for r in out} == {
        ("a", "R:a"),
        ("b", "R:b"),
    }
