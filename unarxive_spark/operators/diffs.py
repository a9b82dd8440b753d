"""Snapshot diff — change-data-capture between two versions of a keyed
table.

Given an old and a new snapshot sharing a key, emit one row per changed
key classified as ``insert`` (key only in new), ``delete`` (key only in
old) or ``update`` (key in both, any compared column differs).
Unchanged keys are dropped — the output is the incremental delta a
downstream consumer (index refresh, checkpoint restore, materialized
aggregate) replays instead of re-reading the full table.

Reference capability analog: the reference's resume logic re-derives
"what changed since the last run" by re-scanning and anti-joining
(``/root/reference/src/prepare.py:26-31``); this operator makes the
delta explicit and symmetric (it also sees deletes, which an anti-join
resume never can).

100-TB shape: ONE full outer join on the key — both sides shuffle once
on the same key (co-partitioned; with bucketed tables it is
shuffle-free), comparison is row-local, no window, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """→ ``(*key_cols, change_type string)``.

    ``compare_cols`` defaults to every shared non-key column; a NULL
    and a non-NULL compare as different, two NULLs as equal (null-safe
    equality on every compared column)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"_o_{c}").eqNullSafe(
            F.col(f"_n_{c}")
        )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )
