"""Warm-start PageRank: incremental re-run over an updated edge table
converges to the correct fixpoint in fewer supersteps."""

from pyspark.sql import functions as F

from unarxive_spark.datagen import synth_transcripts
from unarxive_spark.operators.edges import build_edges
from unarxive_spark.operators.pagerank import pagerank

from tests.oracles import pagerank_oracle


def test_warm_start_converges_faster_and_correctly(spark):
    t_all = synth_transcripts(spark, n_convs=150, seed=21).cache()
    t_old = t_all.filter("turn_idx < 5")

    e_old = build_edges(t_old).cache()
    base = pagerank(e_old, tol=1e-8, max_iter=100)
    assert base.converged

    # new turns arrive → updated edge table
    e_new = build_edges(t_all).cache()
    cold = pagerank(e_new, tol=1e-8, max_iter=100)
    warm = pagerank(
        e_new, tol=1e-8, max_iter=100, initial_ranks=base.ranks
    )
    assert cold.converged and warm.converged
    assert warm.iterations < cold.iterations  # warm start pays off

    # identical fixpoint — and both match the oracle
    rows = [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in e_new.collect()
    ]
    want = pagerank_oracle(rows, tol=1e-8, max_iter=200)
    for res in (cold, warm):
        got = {r["conv_id"]: r["rank"] for r in res.ranks.collect()}
        assert set(got) == set(want)
        assert max(abs(got[v] - want[v]) for v in want) < 1e-6
        assert abs(sum(got.values()) - 1.0) < 1e-9
