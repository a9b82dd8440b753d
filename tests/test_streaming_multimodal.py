"""Structured Streaming incremental edge mining + multimodal plumbing."""

import hashlib
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from unarxive_spark.datagen import synth_transcripts
from unarxive_spark.multimodal.media import (
    decode_image,
    extract_media_features,
    media_stats_by_kind,
    synth_media,
)
from unarxive_spark.operators.edges import build_edges
from unarxive_spark.streaming.incremental import (
    compact_edges,
    start_incremental_edge_mining,
)


def test_incremental_edge_mining_exactly_once(spark):
    base = tempfile.mkdtemp(prefix="stream_")
    in_dir, out_dir, ck = f"{base}/in", f"{base}/out", f"{base}/ck"
    try:
        t = synth_transcripts(spark, n_convs=80, seed=5).cache()
        first = t.filter("conv_id < 'c000040'")
        second = t.filter("conv_id >= 'c000040'")

        first.write.mode("append").parquet(in_dir)
        q = start_incremental_edge_mining(spark, in_dir, out_dir, ck)
        q.awaitTermination(120)
        n1 = spark.read.parquet(out_dir).count()
        assert n1 > 0

        # new files land; rerun processes ONLY the delta (done.log analog)
        second.write.mode("append").parquet(in_dir)
        q = start_incremental_edge_mining(spark, in_dir, out_dir, ck)
        q.awaitTermination(120)
        pairs = spark.read.parquet(out_dir)
        n2 = pairs.count()
        assert n2 > n1

        # third run with nothing new: no duplicates appended
        q = start_incremental_edge_mining(spark, in_dir, out_dir, ck)
        q.awaitTermination(120)
        assert spark.read.parquet(out_dir).count() == n2

        # compacted weights equal the batch edge build (unresolved refs
        # included in stream; restrict comparison to resolved space)
        batch = build_edges(t, resolve=False)
        stream = compact_edges(spark, out_dir)
        diff = batch.exceptAll(stream).count() + stream.exceptAll(batch).count()
        assert diff == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", fake=False)
    f = decode_image(b"abc", fake=True)
    assert len(f) == 8 and f == decode_image(b"abc", fake=True)


def test_media_feature_extraction(spark, transcripts_small):
    media = synth_media(spark, transcripts_small)
    feats = extract_media_features(media, fake=True).cache()
    assert feats.count() == media.count()
    row = feats.filter("conv_id = 'c000000'").collect()[0]
    payload = b"payload|c000000"
    assert row["n_bytes"] == len(payload)
    assert row["sha1"] == hashlib.sha1(payload).hexdigest()
    want = [int(b) / 255.0 for b in hashlib.sha256(payload).digest()[:8]]
    assert [round(x, 6) for x in row["features"]] == [
        round(x, 6) for x in want
    ]
    stats = media_stats_by_kind(feats).collect()[0]
    assert stats["kind"] == "image"
    assert stats["n_distinct_payloads"] == stats["n_media"]


def test_session_window_stream(spark):
    """Session-window streaming agg: refs within the gap merge into one
    session; a gap beyond 30 minutes splits — matches the hand-computed
    sessionization on a deterministic fixture."""
    import datetime as dt

    from unarxive_spark.streaming.incremental import (
        TRANSCRIPT_SCHEMA,
        session_ref_rates_stream,
    )

    base = tempfile.mkdtemp(prefix="sess_stream_")
    in_dir = f"{base}/in"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def row(conv, idx, minutes, ref):
        return (
            conv, idx, "user", f"see conv:{ref}", "",
            t0 + dt.timedelta(minutes=minutes),
        )

    rows = [
        # cA: refs at 0, 10, 25 min -> ONE session (gaps <= 30m), 3 refs
        row("cA", 0, 0, "c000001"),
        row("cA", 1, 10, "c000002"),
        row("cA", 2, 25, "c000003"),
        # cA: ref at 90 min -> SECOND session
        row("cA", 3, 90, "c000004"),
        # cB: single ref
        row("cB", 0, 5, "c000001"),
    ]
    try:
        spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(in_dir)
        stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(in_dir)
        q = (
            session_ref_rates_stream(stream)
            .writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["src_conv_id"], r["n_refs"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
        assert got == {("cA", 3), ("cA", 1), ("cB", 1)}
    finally:
        shutil.rmtree(base, ignore_errors=True)
