"""Streaming distinct-count: FM/PCSA sketch state across micro-batches.

The batch sketch (``operators/sketch.py``) made the state mergeable —
``n_regs`` rank bitmaps combined by bit_or.  That is exactly the shape
``applyInPandasWithState`` wants: per group the state is one
``array<long>`` of bitmaps, each micro-batch ORs its rows' rank bits
in, and the emitted estimate is ALWAYS equal to the batch sketch over
everything seen so far (bit_or is associative + commutative +
idempotent, so arrival order, batching, and replays cannot change the
state — the exactly-once story needs no dedup).

The per-row hashing stays columnar and JVM-side
(``reg_bit_columns``); the Python state function only ORs int64s over
Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from unarxive_spark.operators.sketch import _PHI, reg_bit_columns

STATE_SCHEMA = "bms array<long>"


def output_schema(group_col: str = "event_type") -> str:
    """Output schema keyed by the caller's grouping column — hard-coding
    ``event_type`` would silently rename a non-default group column."""
    return f"{group_col} string, est_distinct double"


# kept for callers that read the default-shaped output
OUTPUT_SCHEMA = output_schema()


def _make_update(n_regs: int, group_col: str = "event_type"):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (bms,) = state.get if state.exists else ([0] * n_regs,)
        bms = list(bms)
        for pdf in pdfs:
            for reg, grp in pdf.groupby("reg")["bit"]:
                bms[int(reg)] |= int(
                    np.bitwise_or.reduce(grp.to_numpy(dtype=np.int64))
                )
        state.update((bms,))
        r_sum = sum(
            (~b & (b + 1)).bit_length() - 1 for b in bms
        )
        est = 2.0 ** (r_sum / n_regs) * n_regs / _PHI
        yield pd.DataFrame(
            {group_col: [key[0]], "est_distinct": [est]}
        )

    return _update


def streaming_distinct_sketch(
    stream: DataFrame,
    key_col: str = "user_id",
    group_col: str = "event_type",
    n_regs: int = 64,
) -> DataFrame:
    reg, bit = reg_bit_columns(key_col, n_regs)
    prepared = stream.select(
        group_col, reg.alias("reg"), bit.alias("bit")
    )
    return prepared.groupBy(group_col).applyInPandasWithState(
        _make_update(n_regs, group_col),
        outputStructType=output_schema(group_col),
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_sketch_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ),
    n_regs: int = 64,
) -> StreamingQuery:
    """availableNow pass over new event files; per-group estimates
    append to ``out_dir``; bitmaps persist in the streaming state."""
    stream = spark.readStream.schema(schema).parquet(in_dir)
    ests = streaming_distinct_sketch(stream, n_regs=n_regs)

    def sink(df: DataFrame, _batch_id: int) -> None:
        df.write.mode("append").parquet(out_dir)

    return (
        ests.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
