"""Streaming CUSUM drift monitor: per-key state across micro-batches.

The batch operator (``operators/timeseries.py::cusum_drift``) rewrote
Page's recursion ``S_t = max(0, S_{t-1} + x_t - k)`` as
``C_t - min(0, min_{j<=t} C_j)`` over the running sum ``C`` of
``x - k``.  That identity also makes the state STREAMABLE: carrying
``(C, minC)`` across micro-batches reproduces every per-row ``S_t``
exactly, because ``C`` and the running minimum are both prefix
quantities — so after any sequence of availableNow passes (including
restarts from checkpoint) the emitted summary equals the one-shot
batch summary over everything seen so far, bit-for-bit, as long as
files arrive in event-time order (the test feeds ordered passes; rows
WITHIN a batch are re-sorted here, so intra-batch file order is
irrelevant).

State per key: ``(C, minC, n, max_s, n_drifts, first_drift_rn)`` —
six int64s.  The per-batch update is vectorized numpy (cumsum +
minimum.accumulate), never per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "c long, minc long, n long, max_s long, n_drifts long, first_rn long"
)
OUTPUT_SCHEMA = (
    "user_id long, n_events long, max_cusum_e6 long, "
    "n_drift_events long, first_drift_rn long"
)


def _make_update(k_e6: int, h_e6: int):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            c0, minc0, n0, max_s0, nd0, first0 = state.get
        else:
            c0, minc0, n0, max_s0, nd0, first0 = 0, 0, 0, 0, 0, -1
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            x = (
                (pdf["value"].to_numpy(dtype=np.float64) * 1e6)
                .round()
                .astype(np.int64)
            )
            c = c0 + np.cumsum(x - k_e6)
            minc = np.minimum.accumulate(
                np.minimum(c, minc0)
            )  # running min including all history (minc0 <= 0 always)
            s = c - minc
            drift = s > h_e6
            if drift.any() and first0 < 0:
                first0 = n0 + int(np.argmax(drift)) + 1
            nd0 += int(drift.sum())
            max_s0 = max(max_s0, int(s.max()))
            n0 += len(x)
            c0, minc0 = int(c[-1]), int(minc[-1])
        state.update((c0, minc0, n0, max_s0, nd0, first0))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n0],
                "max_cusum_e6": [max_s0],
                "n_drift_events": [nd0],
                "first_drift_rn": [first0 if first0 >= 0 else None],
            }
        )

    return _update


def streaming_cusum_drift(
    stream: DataFrame,
    k_e6: int = 60_000_000,
    h_e6: int = 200_000_000,
) -> DataFrame:
    prepared = stream.select("user_id", "ts", "event_id", "value")
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_update(int(k_e6), int(h_e6)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_drift_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ),
    k_e6: int = 60_000_000,
    h_e6: int = 200_000_000,
) -> StreamingQuery:
    """availableNow pass over new event files; per-key drift summaries
    append to ``out_dir``; (C, minC) prefix state persists."""
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = streaming_cusum_drift(stream, k_e6=k_e6, h_e6=h_e6)

    def sink(df: DataFrame, _batch_id: int) -> None:
        df.write.mode("append").parquet(out_dir)

    return (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


EWMA_STATE_SCHEMA = (
    "tail array<long>, rn long, last_num long, last_den long, "
    "last_anom boolean"
)
EWMA_OUTPUT_SCHEMA = (
    "user_id long, rn long, x_e6 long, ewma_num long, ewma_den long, "
    "is_anomaly boolean"
)


def _make_ewma_update(window: int, t_e6: int):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tail, rn, num, den, anom = state.get
            tail = list(tail)
        else:
            tail, rn, num, den, anom = [], 0, 0, 0, False
        pdf = pd.concat(list(pdfs), ignore_index=True)
        x_last = None
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            xs = (
                (pdf["value"].to_numpy(dtype=np.float64) * 1e6)
                .round()
                .astype(np.int64)
            )
            hist = tail + [int(v) for v in xs]
            base = len(tail)
            for i in range(len(xs)):
                lo = max(0, base + i - window + 1)
                win = hist[lo : base + i + 1]
                m = len(win)
                # w(0)=1, w(j)=2^(j-1): oldest two share weight 1
                nnum = sum(
                    v * (1 if j == 0 else 1 << (j - 1))
                    for j, v in enumerate(win)
                )
                nden = 1 << (m - 1)
                if rn + i == 0 or den == 0:
                    anom = False
                else:
                    anom = abs(int(xs[i]) * den - num) > t_e6 * den
                num, den = nnum, nden
            rn += len(xs)
            tail = hist[-(window - 1) :]
            x_last = int(xs[-1])
        state.update((tail, rn, num, den, bool(anom)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "rn": [rn],
                "x_e6": [x_last],
                "ewma_num": [num],
                "ewma_den": [den],
                "is_anomaly": [bool(anom)],
            }
        )

    return _update


def streaming_ewma(
    stream: DataFrame,
    window: int = 16,
    anomaly_t_e6: int = 150_000_000,
) -> DataFrame:
    """Streaming windowed alpha=1/2 EWMA: the state carries the last
    ``window - 1`` raw values (plus the running position and the last
    num/den), so every per-row num/den — and therefore the emitted
    last-row summary — is IDENTICAL to the batch
    ``operators/timeseries.py::ewma_smooth`` over everything seen so
    far, across availableNow restarts, when files arrive in event-time
    order.  Per-batch work is O(window · rows) exact int64 ops."""
    prepared = stream.select("user_id", "ts", "event_id", "value")
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_ewma_update(int(window), int(anomaly_t_e6)),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_ewma_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ),
    window: int = 16,
    anomaly_t_e6: int = 150_000_000,
) -> StreamingQuery:
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = streaming_ewma(stream, window=window, anomaly_t_e6=anomaly_t_e6)

    def sink(df: DataFrame, _batch_id: int) -> None:
        df.write.mode("append").parquet(out_dir)

    return (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
