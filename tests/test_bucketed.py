"""Bucketed edge persistence: joins on the bucket key skip the big-side
exchange (SURVEY.md §4.3 — stable co-partitioning across jobs)."""

import contextlib
import io

from pyspark.sql import functions as F

from unarxive_spark.sources.tables import read_table, write_edges_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    return buf.getvalue()


def test_bucketed_join_skips_exchange(spark, edges_small):
    write_edges_bucketed(edges_small, table="edges_b_test", n_buckets=4)
    e = read_table(spark, "edges_b_test")
    assert e.count() == edges_small.count()

    # self-join on the bucket key: neither side needs an exchange
    joined = e.alias("a").join(
        e.alias("b"), F.col("a.src_conv_id") == F.col("b.src_conv_id")
    )
    plan = _plan(joined)
    # SortMergeJoin without Exchange on either scan (bucketed layout reused)
    assert "Exchange hashpartitioning" not in plan, plan
    spark.sql("DROP TABLE IF EXISTS edges_b_test")
