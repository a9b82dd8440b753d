"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-conversation totals (turns seen, refs mined) maintained in
the state store across micro-batches AND across restarts of the query
(the state lives in the streaming checkpoint — the engine-level version
of the reference's resumable counters,
/root/reference/src/match_references_openalex.py:616-632 success-quota
accumulation).

Each update emits the group's new running totals (update output mode);
the test drives two ``availableNow`` passes with new files in between
and checks the totals accumulate exactly as the batch aggregation says.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from unarxive_spark.functions.refs import extract_ref_ids
from unarxive_spark.streaming.incremental import read_transcript_stream

OUTPUT_SCHEMA = "conv_id string, total_turns long, total_refs long"
STATE_SCHEMA = "total_turns long, total_refs long"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    total_turns, total_refs = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        total_turns += len(pdf)
        total_refs += int(pdf["n_refs"].sum())
    state.update((total_turns, total_refs))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "total_turns": [total_turns],
            "total_refs": [total_refs],
        }
    )


def running_ref_totals(stream: DataFrame) -> DataFrame:
    """transcript stream → per-conversation running totals (stateful)."""
    per_turn = stream.select(
        "conv_id",
        (
            F.size(extract_ref_ids("text")) + F.size(extract_ref_ids("tool"))
        ).alias("n_refs"),
    )
    return per_turn.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_running_totals(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """availableNow pass: consume new transcript files, update state,
    append each group's new totals to ``out_dir``. State (and file
    progress) persist in ``checkpoint_dir`` — a rerun continues, never
    recounts."""
    totals = running_ref_totals(read_transcript_stream(spark, in_dir))

    def sink(df: DataFrame, _batch_id: int) -> None:
        df.write.mode("append").parquet(out_dir)

    return (
        totals.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def latest_totals(spark: SparkSession, out_dir: str) -> DataFrame:
    """Collapse the update log to the latest totals per conversation
    (totals are monotone, so max = latest)."""
    log = spark.read.schema(OUTPUT_SCHEMA).parquet(out_dir)
    return log.groupBy("conv_id").agg(
        F.max("total_turns").alias("total_turns"),
        F.max("total_refs").alias("total_refs"),
    )
