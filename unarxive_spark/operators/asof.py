"""Distributed as-of join (nearest-earlier / nearest-later match).

Task-brief engine addition (the brief's named custom-operator example:
"as-of join"): attach to each fact row the dimension row that was
current at its timestamp — e.g. the metadata snapshot in force when a
paper version appeared, or the last page view before a purchase.  The
reference has no temporal joins (its lookups are exact-key sqlite
hits, ``match_references_openalex.py``); at 100 TB the pattern is
unavoidable and Spark has no built-in for it (a naive translation is a
non-equi join → BroadcastNestedLoopJoin → dead at scale).

Spark-first plan (no inequality join, no broadcast of the big side):

1. Both sides are projected onto a common frame ``(keys..., __o, __tie,
   __l, __r)`` where ``__o`` is the event time as an epoch-micros long
   (negated for ``direction="forward"`` so one backward code path serves
   both), ``__tie`` orders right rows before left rows at equal
   timestamps for inclusive semantics (after, for strict), ``__l`` is a
   struct of all left columns (NULL on right rows) and ``__r`` a struct
   of the requested right payload columns (NULL on left rows).
2. One union + ONE shuffle on the join keys; within each key partition a
   running ``last(__r, ignorenulls=True)`` window (rows unbounded
   preceding → current) gives every left row its nearest matching right
   row.  This is exactly the merge phase of a sort-merge as-of join:
   O(n log n) per key, one exchange total, left-join semantics.
3. Optional ``tolerance_s`` nulls out matches farther than the given
   horizon — evaluated from the matched right timestamp carried inside
   ``__r``, so no extra join.

Skew escape hatch: a window partitioned only by key sorts one key's
whole history in a single task.  With ``chunk_s`` set, the match runs in
two stages — (a) the same window within ``(key, time-chunk)``
partitions, (b) a tiny per-(key, chunk) boundary table (the last right
row of each chunk) cascaded with a second window over chunk summaries
(rows-per-key = number of chunks, not number of events), then
``coalesce(within-chunk match, carry-in from earlier chunks)``.  A
mega-key's events then sort in ``history/chunk_s`` independent tasks.
Both paths are property-tested equal (tests/test_asof.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _us(col):
    """Epoch micros; NTZ parquet timestamps cast exactly under the
    session's UTC zone (session.py pins spark.sql.session.timeZone)."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_s: float | None = None,
    chunk_s: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp, per key.

    Returns all left columns plus ``asof_ts`` (the matched right
    timestamp) and ``asof_<c>`` for each requested right column ``c``;
    unmatched left rows keep them NULL (left-join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    on = list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != rts]
    right_cols = list(right_cols)

    sign = F.lit(1) if direction == "backward" else F.lit(-1)
    # Inclusive match: right rows visible at equal ts -> sort before
    # left (__tie 0 < 1).  Strict: right rows at equal ts must not
    # match -> sort after left (__tie 2 > 1).
    right_tie, left_tie = (2, 1) if strict else (0, 1)

    payload = F.struct(
        F.col(rts).alias("asof_ts"),
        *[F.col(c).alias(f"asof_{c}") for c in right_cols],
    )
    # a NULL-timestamp right row cannot participate in temporal matching
    # (its NULL sort key would order it before everything and the
    # running-last would serve it as a bogus nearest match); NULL-ts
    # left rows need no special case — they sort first, see no right
    # rows, and keep NULL match columns (left-join semantics).
    right = right.filter(F.col(rts).isNotNull())
    r_frame = right.select(
        *on,
        (sign * _us(F.col(rts))).alias("__o"),
        F.lit(right_tie).alias("__tie"),
        payload.alias("__r"),
    )
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_frame = left.select(
        *on,
        (sign * _us(F.col(left_ts))).alias("__o"),
        F.lit(left_tie).alias("__tie"),
        F.lit(None).cast(r_frame.schema["__r"].dataType).alias("__r"),
        l_struct.alias("__l"),
    )
    u = l_frame.unionByName(
        r_frame.withColumn(
            "__l", F.lit(None).cast(l_frame.schema["__l"].dataType)
        )
    )

    # "__r" as the final sort key makes the pick among duplicate right
    # timestamps deterministic (struct ordering is field-wise; left rows
    # carry NULL which sorts first).
    if chunk_s is None:
        w = (
            Window.partitionBy(*on)
            .orderBy("__o", "__tie", "__r")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    else:
        chunk = F.floor(F.col("__o") / F.lit(int(chunk_s) * 1_000_000))
        uc = u.withColumn("__chunk", chunk)
        w_in = (
            Window.partitionBy(*on, "__chunk")
            .orderBy("__o", "__tie", "__r")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        in_chunk = uc.withColumn(
            "__m_in", F.last("__r", ignorenulls=True).over(w_in)
        )
        # Boundary table: last right row of each (key, chunk) — one row
        # per key x chunk, tiny relative to the event tables.  max() on
        # the (__o, __tie, __r) struct is the argmax over sort order.
        bounds = (
            uc.filter(F.col("__r").isNotNull())
            .groupBy(*on, "__chunk")
            .agg(F.max(F.struct("__o", "__tie", "__r")).alias("__last"))
            .select(*on, "__chunk", F.col("__last.__r").alias("__rb"))
        )
        # Carry-in for chunk c = last right row of any EARLIER chunk.
        # Every chunk id present on either side needs a carry row, so
        # cascade over the union's distinct chunk ids, not just bounds'.
        w_carry = (
            Window.partitionBy(*on)
            .orderBy("__chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            uc.select(*on, "__chunk")
            .distinct()
            .join(bounds, on=[*on, "__chunk"], how="left")
            .withColumn(
                "__carry", F.last("__rb", ignorenulls=True).over(w_carry)
            )
            .select(*on, "__chunk", "__carry")
        )
        matched = in_chunk.join(
            carry, on=[*on, "__chunk"], how="left"
        ).withColumn("__m", F.coalesce("__m_in", "__carry"))

    out = matched.filter(F.col("__l").isNotNull())
    if tolerance_s is not None:
        horizon = int(tolerance_s * 1_000_000)
        gap = F.col("__o") - (sign * _us(F.col("__m.asof_ts")))
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(horizon), F.col("__m"))
        )

    matched_fields = ["asof_ts"] + [f"asof_{c}" for c in right_cols]
    return out.select(
        F.col("__l.*"),
        *[F.col(f"__m.{f}").alias(f) for f in matched_fields],
    )
