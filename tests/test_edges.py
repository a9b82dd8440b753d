"""L2 edge build: weights, self-loops, resolution, determinism."""

from pyspark.sql import functions as F

from unarxive_spark.datagen import synth_transcripts
from unarxive_spark.operators.edges import (
    build_edges,
    edge_resolution_metrics,
)
from unarxive_spark.operators.degrees import degrees, top_cited


def _mk(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2025-01-01")))


def test_edge_weights_and_self_loops(spark):
    t = _mk(
        spark,
        [
            ("a", 0, "user", "conv:b conv:b conv:a", ""),
            ("a", 1, "tool", "conv:c", "lookup(conv:b)"),
            ("b", 0, "user", "conv:zzz nothing", ""),
            ("c", 0, "user", "", ""),
        ],
    )
    e = {
        (r["src_conv_id"], r["dst_conv_id"]): r["weight"]
        for r in build_edges(t).collect()
    }
    # a→b: 2 from text turn 0 + 1 from tool turn 1 = 3; self-loop a→a dropped;
    # b→zzz unresolved dropped
    assert e == {("a", "b"): 3.0, ("a", "c"): 1.0}

    m = edge_resolution_metrics(t).collect()[0]
    assert m["n_refs"] == 5 and m["n_refs_linked"] == 4
    assert abs(m["link_rate"] - 0.8) < 1e-12


def test_synth_determinism_across_parallelism(spark):
    a = synth_transcripts(spark, n_convs=50, seed=7, partitions=2)
    b = synth_transcripts(spark, n_convs=50, seed=7, partitions=13)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = synth_transcripts(spark, n_convs=50, seed=8, partitions=2)
    assert c.exceptAll(a).count() > 0


def test_synth_has_hubs_and_unresolved(transcripts_small, edges_small):
    m = edge_resolution_metrics(transcripts_small).collect()[0]
    # unresolved_pct=25 → link rate ≈ 0.75 (generous band)
    assert 0.6 < m["link_rate"] < 0.9
    top = top_cited(edges_small, k=5).collect()
    d = degrees(edges_small)
    med = d.approxQuantile("in_weight", [0.5], 0.01)[0]
    # hub fixture: top cited conversation dominates the median
    assert top[0]["in_weight"] > 10 * max(med, 1.0)
    # hubs are the low-numbered convs by construction
    assert top[0]["conv_id"] in {f"c{i:06d}" for i in range(5)}


def test_degrees_consistency(edges_small):
    d = degrees(edges_small)
    tot = d.agg(
        F.sum("in_degree").alias("i"), F.sum("out_degree").alias("o")
    ).collect()[0]
    assert tot["i"] == tot["o"] == edges_small.count()
    w = d.agg(F.sum("in_weight").alias("iw"), F.sum("out_weight").alias("ow")).collect()[0]
    ew = edges_small.agg(F.sum("weight")).collect()[0][0]
    assert abs(w["iw"] - ew) < 1e-9 and abs(w["ow"] - ew) < 1e-9
