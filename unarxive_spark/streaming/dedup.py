"""Streaming dedup + decontamination (§2.9 engine-added).

The batch dedup family (``operators/dedup.py``) assumes the corpus is
at rest; a continuously-ingesting training-data pipeline needs the
same guarantees over micro-batches:

- :func:`streaming_exact_dedup` — first-seen-wins exact dedup on the
  portable content hash, ACROSS micro-batches and restarts: Structured
  Streaming's ``dropDuplicates`` keeps the seen-key set in checkpointed
  state, so a duplicate arriving days later is still dropped (the
  reference's resumable-batch analog: the done.log anti-join,
  ``/root/reference/src/prepare.py:26-31``, generalized from files to
  rows).  Global dedup state grows with distinct keys by definition;
  the watermarked variant (``within_watermark``) bounds state for
  pipelines where duplicates only arrive near-in-time.
- :func:`streaming_decontaminate` — the q93 benchmark n-gram scrub as
  a STATELESS streaming filter: the (small, static) benchmark shingle
  hashes are collected once and the per-row check is a row-local
  ``arrays_overlap`` — no state, no shuffle, identical semantics in
  micro-batch and batch (tested against the batch operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from unarxive_spark.functions.hashing import h64
from unarxive_spark.functions.texttools import shingles

DOC_SCHEMA = "doc_id long, text string, ts timestamp"


def read_doc_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOC_SCHEMA).format("parquet").load(in_dir)
    )


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    within_watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """First-seen-wins exact dedup on ``h64(text)`` across micro-batches.

    ``within_watermark`` switches to ``dropDuplicatesWithinWatermark``
    (bounded state — duplicates are only guaranteed dropped while their
    key is younger than the watermark)."""
    keyed = docs.withColumn("_content_h", h64(F.col(text_col)))
    if within_watermark is not None:
        return keyed.withWatermark(
            ts_col, within_watermark
        ).dropDuplicatesWithinWatermark(["_content_h"]).drop("_content_h")
    return keyed.dropDuplicates(["_content_h"]).drop("_content_h")


def start_streaming_dedup(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Dedup newly-arrived document files into ``out_dir`` exactly once;
    the seen-hash state lives in the streaming checkpoint, so reruns
    continue where they left off (duplicates of rows from EARLIER runs
    are still dropped)."""
    deduped = streaming_exact_dedup(read_doc_stream(spark, in_dir))
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Drop (streaming) documents sharing any word n-gram with the
    static benchmark set — stateless, so it composes with any trigger.

    The benchmark shingle hashes are collected ONCE (the benchmark is
    metadata-sized by construction — a held-out eval set); the per-row
    check is ``arrays_overlap`` against the literal array, adding no
    shuffle and no state to the streaming plan."""
    bench_hashes = sorted(
        r["_h"]
        for r in bench.select(
            F.explode(
                F.transform(
                    shingles(F.col(text_col), n), lambda s: h64(s)
                )
            ).alias("_h")
        )
        .distinct()
        .collect()
    )
    if not bench_hashes:
        return docs
    lit_arr = F.array(*[F.lit(int(h)) for h in bench_hashes])
    doc_hashes = F.transform(
        shingles(F.col(text_col), n), lambda s: h64(s)
    )
    return docs.filter(~F.arrays_overlap(doc_hashes, lit_arr))
