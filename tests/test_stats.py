"""L4 reporting layer (calc_stats analogs A1-A10)."""

from pyspark.sql import functions as F

from unarxive_spark.operators.stats import (
    build_vertices,
    category_month_cube,
    group_rollup,
    link_rate_by_group,
    role_histogram,
    year_rollup,
)


def test_vertices_counts(spark, transcripts_small):
    v = build_vertices(transcripts_small).cache()
    # every conversation present exactly once
    assert v.count() == transcripts_small.select("conv_id").distinct().count()
    # n_turns sums to total turns
    assert (
        v.agg(F.sum("n_turns")).collect()[0][0] == transcripts_small.count()
    )
    # linked <= refs, categories/groups well-formed
    assert v.filter(F.col("n_refs_linked") > F.col("n_refs")).count() == 0
    cats = {r["category"] for r in v.select("category").distinct().collect()}
    assert cats <= {f"cat{i:02d}" for i in range(12)}
    grps = {r["group"] for r in v.select("group").distinct().collect()}
    assert grps <= {f"grp{i}" for i in range(4)}


def test_cube_and_rollups_consistent(spark, transcripts_small):
    v = build_vertices(transcripts_small).cache()
    cube = category_month_cube(v)
    # cube totals == vertex totals
    tot = cube.agg(
        F.sum("n_convs").alias("c"), F.sum("n_refs").alias("r")
    ).collect()[0]
    assert tot["c"] == v.count()
    assert tot["r"] == v.agg(F.sum("n_refs")).collect()[0][0]

    gr = group_rollup(v)
    grand = gr.filter("group = 'ALL' AND category = 'ALL'").collect()[0]
    assert grand["n_convs"] == v.count()
    # group subtotal == sum of its category rows
    per_group = {
        r["group"]: r["n_convs"]
        for r in gr.filter("group != 'ALL' AND category = 'ALL'").collect()
    }
    per_cat = (
        gr.filter("category != 'ALL'")
        .groupBy("group")
        .agg(F.sum("n_convs").alias("n"))
        .collect()
    )
    for r in per_cat:
        assert per_group[r["group"]] == r["n"]

    yr = year_rollup(v)
    assert (
        yr.filter("year = 'ALL'").collect()[0]["n_convs"] == v.count()
    )


def test_link_rate_zero_guard(spark):
    rows = [("a", 0, "user", "no refs", "", "2025-01-01 00:00:00")]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    v = build_vertices(t)
    lr = link_rate_by_group(v).collect()
    assert all(r["link_rate"] == 0.0 for r in lr)


def test_role_histogram(transcripts_small):
    h = {r["role"]: r["n_turns"] for r in role_histogram(transcripts_small).collect()}
    assert set(h) == {"user", "assistant", "tool"}
    assert sum(h.values()) == transcripts_small.count()
