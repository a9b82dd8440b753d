"""Snapshot-diff CDC classification vs a dict replay."""

import pytest

from unarxive_spark.operators.diffs import snapshot_diff

SCHEMA = "k long, status string, price double"


def test_snapshot_diff_classifies_all_changes(spark):
    old = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (2, "F", 20.0),   # deleted
            (3, "O", 30.0),   # updated (price)
            (4, "O", 40.0),   # unchanged → dropped
            (5, None, 50.0),  # NULL → value: update
            (6, None, 60.0),  # NULL == NULL: unchanged
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (1, "O", 10.0),   # unchanged → dropped
            (3, "O", 31.0),
            (4, "O", 40.0),
            (5, "P", 50.0),
            (6, None, 60.0),
            (7, "N", 70.0),   # inserted
        ],
        SCHEMA,
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {2: "delete", 3: "update", 5: "update", 7: "insert"}


def test_snapshot_diff_subset_columns(spark):
    """Restricting compare_cols ignores drift in other columns."""
    old = spark.createDataFrame([(1, "O", 10.0)], SCHEMA)
    new = spark.createDataFrame([(1, "O", 99.0)], SCHEMA)
    assert snapshot_diff(old, new, ["k"], ["status"]).count() == 0
    got = snapshot_diff(old, new, ["k"], ["price"]).collect()
    assert [(r["k"], r["change_type"]) for r in got] == [(1, "update")]


def test_snapshot_diff_requires_keys(spark):
    df = spark.createDataFrame([(1, "O", 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="key_cols"):
        snapshot_diff(df, df, [])


def test_snapshot_diff_plan_is_single_join(spark):
    """One full-outer sort-merge/hash join, no window, no cartesian."""
    old = spark.createDataFrame([(1, "O", 1.0)], SCHEMA)
    new = spark.createDataFrame([(1, "O", 2.0)], SCHEMA)
    plan = snapshot_diff(old, new, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
