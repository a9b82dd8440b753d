"""Interval analytics: sweep-line concurrency and run-length (SCD2)
state history.

Reference analog: the reference's per-period activity rollups
(/root/reference/src/utility_scripts/calc_stats.py) count rows per
bucket; these operators answer the harder interval questions a usage
dashboard needs — "how many sessions were OPEN at once" (sweep-line
over session intervals) and "what was each user's state over time"
(gaps-and-islands version history, the SCD2 build every warehouse
pipeline ships).

Scale design
------------
* The sweep-line needs a GLOBAL running sum over breakpoints ordered
  by time.  A single `Window.orderBy(ts)` would funnel every
  breakpoint through one task; instead we range-shard by calendar
  hour: a per-hour window computes the within-hour prefix sum, a
  metadata-sized per-hour totals table (rows = distinct hours, not
  data-sized) yields exclusive hour offsets, and a broadcast join adds
  them — the same de-skewed global-prefix-sum shape as
  ``corpus.pack_sequences``.  Hour sharding (unlike hash sharding)
  preserves the temporal order the prefix sum requires.
* State history windows partition by the entity key — already
  parallel, no de-skew needed.

Determinism: all timestamps are compared as exact integer epoch
microseconds; breakpoint ties are fully ordered by
``(ts, delta, user_id, session_id)`` so every per-row running value is
identical across engines (ends sort before starts at equal time:
intervals are half-open ``[start, end)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def session_intervals(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization returning one INTERVAL row per session.

    Same 30-min inactivity rule as the q25 sessionizer, but collapsed
    to ``(user_id, session_id, start_us, end_us)`` with ``end_us`` one
    second past the last event so single-event sessions still have
    positive length (half-open semantics).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col).alias("user_id"), us.alias("_us")
    )
    w = Window.partitionBy("user_id").orderBy("_us")
    gap = F.col("_us") - F.lag("_us").over(w)
    sess = ev.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_s * _US), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("_us").alias("start_us"),
        (F.max("_us") + F.lit(_US)).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


def interval_concurrency(
    intervals: DataFrame,
    start_col: str = "start_us",
    end_col: str = "end_us",
    id_cols: tuple[str, str] = ("user_id", "session_id"),
) -> DataFrame:
    """Sweep-line concurrency: for every breakpoint, how many
    intervals are open just after it.

    Breakpoints are +1 at ``start_us`` and -1 at ``end_us`` (half-open:
    an interval ending exactly when another starts does NOT overlap
    it; the -1 sorts first via ``delta`` ascending).  The global
    running sum is computed with the de-skewed hour-shard prefix sum
    described in the module docstring.

    Returns one row per breakpoint:
    ``(us, delta, user_id, session_id, concurrency)``.
    """
    ia, ib = id_cols
    starts = intervals.select(
        F.col(start_col).alias("us"),
        F.lit(1).cast("long").alias("delta"),
        F.col(ia),
        F.col(ib),
    )
    ends = intervals.select(
        F.col(end_col).alias("us"),
        F.lit(-1).cast("long").alias("delta"),
        F.col(ia),
        F.col(ib),
    )
    bp = starts.unionByName(ends).withColumn(
        "_hr", F.expr(f"us DIV {3600 * _US}")
    )
    w_in = Window.partitionBy("_hr").orderBy(
        "us", "delta", ia, ib
    ).rowsBetween(Window.unboundedPreceding, 0)
    bp = bp.withColumn("_local", F.sum("delta").over(w_in))
    # Exclusive per-hour offsets: rows = distinct hours (metadata-sized,
    # the accepted shard-offset pattern), so the single-partition window
    # below never sees data-sized input.
    totals = bp.groupBy("_hr").agg(F.sum("delta").alias("_tot"))
    w_off = Window.orderBy("_hr").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.select(
        "_hr", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        bp.join(F.broadcast(offs), "_hr")
        .select(
            "us",
            "delta",
            ia,
            ib,
            (F.col("_local") + F.col("_off")).alias("concurrency"),
        )
    )


def daily_max_concurrency(breakpoints: DataFrame) -> DataFrame:
    """Per-calendar-day peak concurrency and the first breakpoint
    achieving it.

    ``day`` is the UTC day of the breakpoint; the peak is the max
    running concurrency over in-day breakpoints (the sweep value is
    global, so a day's carry-in is included the moment its first
    breakpoint lands).  Deterministic: ``at_us`` is the minimum
    breakpoint time attaining the max.
    """
    bp = breakpoints.withColumn(
        "day",
        F.date_format(
            F.timestamp_micros(F.col("us")), "yyyy-MM-dd"
        ),
    )
    # max(struct(concurrency, -us)) = (peak, earliest attaining us) in
    # one map-side-combinable aggregate — no second join pass.
    mx = F.max(
        F.struct(
            F.col("concurrency").alias("c"), (-F.col("us")).alias("nus")
        )
    ).alias("_mx")
    return (
        bp.groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_breakpoints"), mx)
        .select(
            "day",
            "n_breakpoints",
            F.col("_mx.c").alias("max_concurrent"),
            (-F.col("_mx.nus")).alias("at_us"),
        )
    )


def state_history(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands run-length history (the SCD2 build): collapse
    each key's time-ordered state stream into version rows
    ``(key, version, state, valid_from_us, valid_to_us, n_events,
    is_current)``.

    ``valid_to_us`` is the next version's ``valid_from_us`` (half-open,
    NULL on the current version).  One per-key window pass + one
    groupBy — no self-join, no per-key collect.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(key_col).alias("k"),
        F.col(state_col).alias("state"),
        us.alias("_us"),
        F.col(order_col).alias("_ord"),
    )
    w = Window.partitionBy("k").orderBy("_us", "_ord")
    changed = F.when(
        F.lag("state").over(w).isNull()
        | (F.col("state") != F.lag("state").over(w)),
        1,
    ).otherwise(0)
    ver = ev.withColumn(
        "version",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    hist = ver.groupBy("k", "version", "state").agg(
        F.min("_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_next = Window.partitionBy("k").orderBy("version")
    return hist.select(
        F.col("k").alias(key_col),
        F.col("version").cast("long").alias("version"),
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(w_next).alias("valid_to_us"),
        "n_events",
        F.when(F.lead("valid_from_us").over(w_next).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_current"),
    )
