"""Streaming FM sketch == batch sketch, exactly, across restarts.

bit_or state is order/batching/replay-invariant, so after consuming the
same rows in two availableNow passes (with a restart in between) the
final streaming estimate must equal the one-shot batch sketch
bit-for-bit.
"""

import datetime as dt

import pandas as pd

from unarxive_spark.operators.sketch import distinct_sketch
from unarxive_spark.streaming.sketchstate import start_sketch_stream

EPOCH = dt.datetime(2024, 1, 1)


def _events(rng_lo, rng_hi):
    return pd.DataFrame(
        {
            "event_id": range(rng_lo, rng_hi),
            "ts": [
                EPOCH + dt.timedelta(seconds=i) for i in range(rng_lo, rng_hi)
            ],
            "user_id": [i % 97 for i in range(rng_lo, rng_hi)],
            "event_type": [
                ("view", "click", "purchase")[i % 3]
                for i in range(rng_lo, rng_hi)
            ],
            "value": [float(i) for i in range(rng_lo, rng_hi)],
            "props": ["{}" for _ in range(rng_lo, rng_hi)],
        }
    )


def test_streaming_sketch_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    spark.createDataFrame(_events(0, 400)).write.mode("append").parquet(
        in_dir
    )
    q = start_sketch_stream(spark, in_dir, out_dir, ck_dir)
    q.awaitTermination()

    # new files + a fresh query (restart): state resumes from checkpoint
    spark.createDataFrame(_events(400, 700)).write.mode("append").parquet(
        in_dir
    )
    q = start_sketch_stream(spark, in_dir, out_dir, ck_dir)
    q.awaitTermination()

    log = spark.read.parquet(out_dir)
    # the update log has one row per (group, pass); keep the biggest
    # estimate per group (monotone state -> latest == max)
    from pyspark.sql import functions as F

    got = {
        r.event_type: r.est
        for r in log.groupBy("event_type")
        .agg(F.max("est_distinct").alias("est"))
        .collect()
    }

    all_events = spark.createDataFrame(_events(0, 700))
    want = {
        r.event_type: r.est_distinct
        for r in distinct_sketch(
            all_events, "user_id", ["event_type"]
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_update_fn_keeps_custom_group_col_name():
    """A non-default group column must keep its name in the output —
    the schema and the emitted frame are built from group_col, not a
    hard-coded 'event_type' (ADVICE r3)."""
    from unarxive_spark.streaming.sketchstate import (
        _make_update,
        output_schema,
    )

    class _FakeState:
        exists = False

        def update(self, v):
            self.stored = v

    assert output_schema("lang") == "lang string, est_distinct double"
    upd = _make_update(4, group_col="lang")
    batch = pd.DataFrame({"reg": [0, 1], "bit": [1, 2]})
    (out,) = list(upd(("en",), iter([batch]), _FakeState()))
    assert list(out.columns) == ["lang", "est_distinct"]
    assert out["lang"].tolist() == ["en"]
