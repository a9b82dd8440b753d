"""applyInPandasWithState: state survives across availableNow restarts."""

import shutil
import tempfile

from pyspark.sql import functions as F

from unarxive_spark.datagen import synth_transcripts
from unarxive_spark.functions.refs import extract_ref_ids
from unarxive_spark.streaming.stateful import (
    latest_totals,
    start_running_totals,
)


def test_running_totals_accumulate_across_restarts(spark):
    base = tempfile.mkdtemp(prefix="state_")
    in_dir, out_dir, ck = f"{base}/in", f"{base}/out", f"{base}/ck"
    try:
        t = synth_transcripts(spark, n_convs=40, seed=11).cache()
        first = t.filter("turn_idx % 2 = 0")
        second = t.filter("turn_idx % 2 = 1")

        first.write.mode("append").parquet(in_dir)
        q = start_running_totals(spark, in_dir, out_dir, ck)
        q.awaitTermination(180)

        got1 = {
            r["conv_id"]: (r["total_turns"], r["total_refs"])
            for r in latest_totals(spark, out_dir).collect()
        }

        # second tranche lands; a NEW query run must CONTINUE the state
        second.write.mode("append").parquet(in_dir)
        q = start_running_totals(spark, in_dir, out_dir, ck)
        q.awaitTermination(180)

        got2 = {
            r["conv_id"]: (r["total_turns"], r["total_refs"])
            for r in latest_totals(spark, out_dir).collect()
        }

        want = {
            r["conv_id"]: (r["t"], r["r"])
            for r in t.select(
                "conv_id",
                (
                    F.size(extract_ref_ids("text"))
                    + F.size(extract_ref_ids("tool"))
                ).alias("n"),
            )
            .groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("t"), F.sum("n").alias("r"))
            .collect()
        }
        assert got2 == want
        # and the totals strictly grew from pass 1 (state carried over,
        # not recomputed from scratch on only-new files)
        assert all(got1[k][0] < got2[k][0] for k in got1)
    finally:
        shutil.rmtree(base, ignore_errors=True)
