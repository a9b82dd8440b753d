"""Distributed range join: points into half-open time intervals.

Task-brief engine addition (the brief's named custom-operator example:
"range join"): join point events into the time intervals that contain
them (incident windows, validity ranges, session bounds).  The
reference has no interval joins; a naive Spark translation
(``p.ts >= i.start AND p.ts < i.end`` with no equality) plans as
BroadcastNestedLoopJoin — quadratic, dead at scale.

Spark-first plan (candidate-generation-by-key-equality, same discipline
as the dedup/ANN paths in this repo):

1. Time is discretized into fixed ``bucket_s``-second buckets.  Each
   point lands in exactly one bucket; each interval explodes into the
   (few) buckets it overlaps via ``sequence()``.
2. The join becomes an EQUI-join on ``(keys..., __bucket)`` — shuffled
   hash/sort-merge, AQE-eligible, no nested loop.  The exact predicate
   ``start <= ts < end`` then filters false candidates inside the same
   stage.
3. Because a point has exactly one bucket, every (point, interval) pair
   meets at most once — no dedup pass needed.
4. Blowup guard: an interval spanning more than ``max_buckets`` buckets
   raises inside the plan (``assert_true``) instead of silently
   exploding — pick ``bucket_s`` near the median interval length (the
   module contract everywhere in this repo: no silent truncation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join"]


def _us(col):
    return F.unix_micros(col.cast("timestamp"))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bucket_s: int = 3600,
    max_buckets: int = 1024,
) -> DataFrame:
    """Inner-join each point row to every interval row (same keys) with
    ``start_ts <= point_ts < end_ts``.  Returns all interval columns
    plus all point columns (point columns colliding with interval names
    are prefixed ``pt_``).
    """
    on = list(on)
    w_us = int(bucket_s) * 1_000_000

    p_bucket = F.floor(_us(F.col(point_ts)) / F.lit(w_us))
    pts = points.select(
        *[
            F.col(c).alias(f"pt_{c}" if c in intervals.columns else c)
            for c in points.columns
            if c not in on
        ],
        *on,
        p_bucket.alias("__bucket"),
    )

    b_lo = F.floor(_us(F.col(start_ts)) / F.lit(w_us))
    # End is exclusive: a zero-length or boundary-aligned interval must
    # not claim the next bucket.
    b_hi = F.floor(
        (_us(F.col(end_ts)) - F.lit(1)) / F.lit(w_us)
    )
    span_ok = F.assert_true(
        (b_hi - b_lo) < F.lit(int(max_buckets)),
        F.concat(
            F.lit(
                f"point_in_interval_join: interval spans >= {max_buckets} "
                f"buckets of {bucket_s}s — raise bucket_s"
            )
        ),
    )
    # NULL-bounded intervals can never satisfy start <= ts < end, so
    # exclude them up front (inner-join semantics) — otherwise the NULL
    # propagates into assert_true's condition, which treats NULL as a
    # failure and kills the whole job (unlike asof_join, which filters
    # NULL-ts right rows the same way).
    ivs = intervals.filter(
        F.col(start_ts).isNotNull() & F.col(end_ts).isNotNull()
    ).withColumn(
        "__bucket",
        F.explode(
            F.when(span_ok.isNull(), F.sequence(b_lo, F.greatest(b_lo, b_hi)))
        ),
    )

    joined = ivs.join(pts, on=[*on, "__bucket"], how="inner").filter(
        (F.col(start_ts) <= F.col(point_ts if point_ts not in intervals.columns else f"pt_{point_ts}"))
        & (F.col(point_ts if point_ts not in intervals.columns else f"pt_{point_ts}") < F.col(end_ts))
    )
    return joined.drop("__bucket")
