"""Exact-integer time-series drift and smoothing operators.

Per-key ordered event streams (the transcripts' turn sequences, the
events table) need change detection and smoothing for monitoring-style
analytics.  Both operators here are pure window dataflow — NO recursion
and NO Python in the hot path — using two classic identities:

- CUSUM (Page 1954): the one-sided recursion
  ``S_t = max(0, S_{t-1} + x_t - k)`` equals
  ``cum_t - min(0, min_{j<=t} cum_j)`` where ``cum`` is the running sum
  of ``x - k`` — two stacked window aggregates, shuffle-free beyond the
  single partition-by-key exchange.
- Windowed EWMA with dyadic alpha = 1/2: weights inside a length-m
  window are ``w(i) = 1 if i == 0 else 2^(i-1)`` (i = position, oldest
  first) over denominator ``2^(m-1)`` — every weight is a power of two,
  so numerator/denominator are exact int64 and the quotient is an exact
  double (division by a power of two only shifts the exponent).

Values are scaled to integers (``round(value * 1e6)``) so every
intermediate is exact and the DuckDB oracle reproduces results
bit-for-bit.  100-TB shape: one hash exchange on the key column, then
per-partition sorted windows; no shuffle per step, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cusum_drift", "ewma_smooth"]


def _x_e6(value_col: str) -> F.Column:
    return F.round(F.col(value_col) * 1e6).cast("long")


def cusum_drift(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    k_e6: int = 60_000_000,
    h_e6: int = 200_000_000,
) -> DataFrame:
    """One-sided CUSUM drift detection per key.

    Returns one summary row per key: ``n_events, max_cusum_e6,
    n_drift_events`` (rows where S_t > h) and ``first_drift_rn``
    (1-based position of the first drift row, NULL if none) — the
    exact-integer drift audit a monitoring pipeline publishes.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(_x_e6(value_col) - F.lit(int(k_e6))).over(frame)
    scored = events.select(
        F.col(key_col),
        F.row_number().over(w).alias("rn"),
        cum.alias("cum"),
        F.min(cum).over(frame).alias("minp"),
    ).select(
        key_col,
        "rn",
        (F.col("cum") - F.least(F.lit(0).cast("long"), F.col("minp"))).alias(
            "s"
        ),
    )
    drift = F.col("s") > F.lit(int(h_e6))
    return scored.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("s").alias("max_cusum_e6"),
        F.sum(drift.cast("long")).alias("n_drift_events"),
        F.min(F.when(drift, F.col("rn"))).cast("long").alias(
            "first_drift_rn"
        ),
    )


def ewma_smooth(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    id_col: str = "event_id",
    window: int = 16,
    anomaly_t_e6: int = 150_000_000,
) -> DataFrame:
    """Windowed alpha=1/2 EWMA + deviation-anomaly flag per event.

    Output per row: ``key, event_id, rn, x_e6, ewma_num, ewma_den,
    ewma_e6, is_anomaly`` where ewma_e6 is the half-up INTEGER rounding
    ``(2*num + den) div (2*den)`` — dyadic quotients tie at any decimal
    cut, so a rounded-double output column would diverge across engines
    (Spark HALF_UP vs DuckDB float rounding); the integer form is exact.
    is_anomaly flags ``|x - ewma_prev| > t`` via the exact integer
    cross-multiplication ``|x_e6*prev_den - prev_num| > t_e6*prev_den``
    (first row per key: false).  Requires non-negative values (the
    integer half-up identity assumes num >= 0).
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    # the non-negative precondition is load-bearing (the half-up
    # identity truncates toward zero for negative numerators): enforce
    # it in-plan instead of trusting the docstring (r5 ADVICE)
    x_ok = F.assert_true(
        _x_e6(value_col) >= 0,
        F.lit("ewma_smooth: values must be non-negative"),
    )
    x_checked = F.when(x_ok.isNull(), _x_e6(value_col))
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    frame = w.rowsBetween(-(window - 1), Window.currentRow)
    base = events.select(
        F.col(key_col),
        F.col(id_col).alias("event_id"),
        F.row_number().over(w).alias("rn"),
        x_checked.alias("x_e6"),
        F.collect_list(x_checked).over(frame).alias("arr"),
    )

    def _weighted(acc, x):
        # weight sequence 1, 1, 2, 4, ... (w(0)=1, w(i)=2^(i-1)) carried
        # in the accumulator — no shiftleft-by-column needed, and the
        # index travels in the struct (CLAUDE.md HOF closure trap).
        nw = F.when(acc["i"] == 0, acc["w"]).otherwise(acc["w"] * 2)
        return F.struct(
            (acc["s"] + x * acc["w"]).alias("s"),
            (acc["i"] + 1).alias("i"),
            nw.alias("w"),
        )

    num = F.aggregate(
        F.col("arr"),
        F.struct(
            F.lit(0).cast("long").alias("s"),
            F.lit(0).cast("long").alias("i"),
            F.lit(1).cast("long").alias("w"),
        ),
        _weighted,
    )["s"]
    den = F.expr(
        "cast(shiftleft(1, cast(size(arr) - 1 as int)) as bigint)"
    )
    scored = base.select(
        key_col,
        "event_id",
        F.col("rn").cast("long").alias("rn"),
        "x_e6",
        num.alias("ewma_num"),
        den.alias("ewma_den"),
    )
    pn = F.lag("ewma_num").over(w2 := Window.partitionBy(key_col).orderBy("rn"))
    pd_ = F.lag("ewma_den").over(w2)
    return scored.select(
        key_col,
        "event_id",
        "rn",
        "x_e6",
        "ewma_num",
        "ewma_den",
        F.expr(
            "(2 * ewma_num + ewma_den) div (2 * ewma_den)"
        ).alias("ewma_e6"),
        F.coalesce(
            F.abs(F.col("x_e6") * pd_ - pn)
            > F.lit(int(anomaly_t_e6)) * pd_,
            F.lit(False),
        ).alias("is_anomaly"),
    )
