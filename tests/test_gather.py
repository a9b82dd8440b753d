"""applyInPandas CSR-style gather vs the built-in join+agg path."""

from pyspark.sql import functions as F

from unarxive_spark.operators.gather import gather_contributions_grouped


def test_grouped_gather_matches_join_agg(spark, edges_small):
    ranks = (
        edges_small.select(F.col("src_conv_id").alias("conv_id"))
        .unionByName(
            edges_small.select(F.col("dst_conv_id").alias("conv_id"))
        )
        .distinct()
        .select("conv_id", F.lit(0.01).alias("rank"))
    )
    got = gather_contributions_grouped(edges_small, ranks, n_groups=8)

    want = (
        edges_small.join(
            ranks.withColumnRenamed("conv_id", "src_conv_id"),
            "src_conv_id",
        )
        .select(
            "dst_conv_id", (F.col("weight") * F.col("rank")).alias("c")
        )
        .groupBy("dst_conv_id")
        .agg(
            F.sum("c").alias("contrib_sum"),
            F.max("c").alias("contrib_max"),
            F.count(F.lit(1)).alias("n_in"),
        )
    )
    g = {r["dst_conv_id"]: r for r in got.collect()}
    w = {r["dst_conv_id"]: r for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert abs(g[k]["contrib_sum"] - w[k]["contrib_sum"]) < 1e-12
        assert abs(g[k]["contrib_max"] - w[k]["contrib_max"]) < 1e-12
        assert g[k]["n_in"] == w[k]["n_in"]
